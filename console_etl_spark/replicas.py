"""Load-balanced replica selection (C2): the reference's endpoint
balancing re-expressed for storage replicas.

The reference resolves a service to its READY pod endpoints and picks
one uniformly at random before connecting (`portforward.go:36-65`
resolution, `:67` pick, erroring when no endpoint is ready). The Spark
analog of "N stateless pods serving the same catalog" is N storage
roots carrying mirrors of the same published snapshots (cross-region
replicas, cache tiers, HDFS + object-store copies): the balancer
resolves a catalog to its replicas, filters to the ready ones (a
replica is ready when its manifest resolves — the readiness-probe
analog of P1), picks one, and FAILS OVER to the next on read error,
marking the failed replica unready for a cooldown.

Selection is seeded-deterministic rotation rather than `rand.IntN`:
uniform over ready replicas like the reference, but reproducible — the
same request sequence always hits the same replicas, which is the
property you want when debugging a 1000-executor job's storage access
pattern.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .store import SnapshotStore


@dataclass
class _ReplicaState:
    store: SnapshotStore
    failed_at: float | None = None


@dataclass
class ReplicaBalancer:
    """Round-robin-with-failover reader over N snapshot-store replicas."""

    cooldown_sec: float = 30.0
    _replicas: list[_ReplicaState] = field(default_factory=list)
    _cursor: int = 0

    def add_replica(self, root: str) -> None:
        self._replicas.append(_ReplicaState(SnapshotStore(root)))

    # -- readiness (the endpoint-subset filter, portforward.go:50-62) ---
    def _ready(self, catalog: str) -> list[int]:
        out = []
        for i, r in enumerate(self._replicas):
            if r.failed_at is not None:
                if time.monotonic() - r.failed_at < self.cooldown_sec:
                    continue
                r.failed_at = None  # cooldown over: probe it again
            if r.store.current(catalog) is not None:
                out.append(i)
        return out

    def pick(self, catalog: str) -> int:
        """Resolve → ready endpoints → pick (rotation over ready)."""
        ready = self._ready(catalog)
        if not ready:
            raise FileNotFoundError(
                f"no ready replica serves catalog {catalog!r} "
                f"({len(self._replicas)} registered)"
            )
        choice = ready[self._cursor % len(ready)]
        self._cursor += 1
        return choice

    def read(self, spark: SparkSession, catalog: str) -> DataFrame:
        """Read the catalog's current snapshot from a balanced replica,
        failing over (and marking the replica unready for the cooldown)
        when the chosen replica errors — the retry-next-pod behavior a
        port-forward client gets from the service proxy."""
        attempts = max(1, len(self._replicas))
        last_err: Exception | None = None
        for _ in range(attempts):
            try:
                idx = self.pick(catalog)
            except FileNotFoundError as exc:
                last_err = exc
                break
            replica = self._replicas[idx]
            try:
                df = replica.store.read(spark, catalog)
                df.schema  # force manifest + file resolution now
                return df
            except Exception as exc:  # storage fault: mark + fail over
                replica.failed_at = time.monotonic()
                last_err = exc
        raise FileNotFoundError(
            f"all replicas failed for catalog {catalog!r}: {last_err}"
        )
