"""Shared fixtures: session-scoped Spark, DuckDB oracle connection, and
the synthetic FBC-shaped catalog_metas fixture (FIXTURES.md §2)."""

from __future__ import annotations

import base64
import json
import os
import random

import duckdb
import pytest

from console_etl_spark.compat import ensure_protobuf
from console_etl_spark.session import get_spark

# Must run at import time — BEFORE the session fixture launches the JVM —
# so Python workers inherit the protobuf shim's PYTHONPATH and the
# version-check env var (compat.ensure_protobuf docstring). The result is
# what the transformWithState test keys its skip on.
HAVE_PROTOBUF = ensure_protobuf()

SF_TEST = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    return get_spark("console-etl-spark-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with every fixture table registered as a view —
    mirrors the driver's pre-registration."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TEST}/{t}.parquet')"
        )
    return con


# --------------------------------------------------------------------------
# catalog_metas: deterministic FBC-shaped fixture (FIXTURES.md §2)
# --------------------------------------------------------------------------

SCHEMAS = ["olm.package", "olm.channel", "olm.bundle", "olm.deprecations"]


def make_catalog_metas_rows(n: int = 400, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    packages = [f"pkg{i:02d}" for i in range(20)]
    for i in range(n):
        catalog = f"catalog{i % 3}"
        schema = rng.choice(SCHEMAS)
        if schema == "olm.package":
            pkg_name = rng.choice(packages)
            name = pkg_name  # reference assumes name == package (main.go:291-295)
            package = ""  # olm.package rows carry the package in `name` (cache.go:101-103)
            has_icon = rng.random() > 0.3
            blob = {
                "schema": schema,
                "name": name,
                "defaultChannel": "stable",
                "icon": (
                    {
                        "base64data": base64.b64encode(
                            f"<svg id='{name}'/>".encode()
                        ).decode(),
                        "mediatype": "image/svg+xml",
                    }
                    if has_icon
                    else None
                ),
            }
        else:
            package = "" if rng.random() < 0.02 else rng.choice(packages)
            name = f"{schema.split('.')[-1]}-{i}"
            blob = {"schema": schema, "package": package, "name": name, "payload": {"i": i}}
        rows.append(
            {
                "catalog": catalog,
                "schema": schema,
                "package": package,
                "name": name,
                "blob": json.dumps(blob),
            }
        )
    return rows


@pytest.fixture(scope="session")
def catalog_metas(spark):
    """Raw (pre-shred) metas DataFrame, FBC-shaped."""
    rows = make_catalog_metas_rows()
    return spark.createDataFrame(
        [(r["catalog"], r["schema"], r["package"], r["name"], r["blob"]) for r in rows],
        "catalog string, schema string, package string, name string, blob string",
    )


@pytest.fixture()
def meta_stream_path(tmp_path):
    """A JSON-lines meta stream file (the all.json analog)."""
    rows = make_catalog_metas_rows(n=120, seed=7)
    path = tmp_path / "all.json"
    with open(path, "w") as f:
        for r in rows:
            f.write(r["blob"] + "\n")
    return str(path)
