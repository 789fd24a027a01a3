#!/usr/bin/env python
"""Capture .explain("formatted") for named queries to plans/<tag>/.

Usage: python tools_explain.py <tag> [query ...]
  tag    subdirectory under plans/ and filename suffix, e.g. "r14_before"
         writes plans/r14/<query>_before.txt (tag split on last _)
  query  query names; default = every bench.py HEADLINE query

The explain output is the optimization round's evidence artifact: the
judge checks plan claims (Exchange counts, join strategies, pushed
filters) against these files.
"""

from __future__ import annotations

import os
import sys

from console_etl_spark.session import get_spark, release_pins


def main() -> None:
    if len(sys.argv) < 2 or "_" not in sys.argv[1]:
        print(__doc__, file=sys.stderr)
        raise SystemExit(
            "usage: tools_explain.py <round>_<suffix> [query ...]"
        )
    tag = sys.argv[1]
    round_dir, _, suffix = tag.rpartition("_")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    spark = get_spark("console_etl_spark_explain")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        release_pins()
        spark.catalog.clearCache()
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
