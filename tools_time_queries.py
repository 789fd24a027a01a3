#!/usr/bin/env python
"""Time a subset of queries with the bench methodology (noop sink,
min-of-N) without the full suite warmup — the optimization round's
iteration harness. NOT the driver contract; bench.py remains that.

Usage: python tools_time_queries.py [-p PASSES] [--warm] query [query ...]
       python tools_time_queries.py --core   # the frozen 30-query core

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {"queries": {name: min_sec}, "passes": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from console_etl_spark.session import get_spark, release_pins


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    if "-p" in args:
        i = args.index("-p")
        passes = int(args[i + 1])
        del args[i : i + 2]
    warm = "--warm" in args
    if warm:
        args.remove("--warm")
    if "--core" in args:
        import bench

        args.remove("--core")
        names = bench.CORE + args
    else:
        names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("console_etl_spark_timer")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if warm and os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        release_pins()
        spark.catalog.clearCache()
    out: dict[str, float] = {}
    per: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(passes):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_pins()
            spark.catalog.clearCache()
        per[name] = runs
        out[name] = min(runs)
        print(f"# {name}: {runs}", file=sys.stderr)
    print(json.dumps({"total_min": round(sum(out.values()), 3), "queries": out, "passes": per}))
    spark.stop()


if __name__ == "__main__":
    main()
