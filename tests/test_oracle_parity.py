"""Local replica of the driver's correctness gate (SURVEY.md §5.2 item 1).

For every oracle-declared query: run the Spark plan and the DuckDB SQL on
the same parquet, compare row count, column names, and order-insensitive
values EXACTLY (no tolerance — the query suite is engineered for
bit-identical results; see relational.py module doc).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_TEST

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize engine-specific dtypes, then sort rows and columns.

    Numeric normalization is STRICT (VERDICT r1 item 2): int-like columns
    become exactly int64 and float-like exactly float64; anything that
    doesn't fit (e.g. a DuckDB HUGEINT surfacing as float64/object where
    Spark emits int64) keeps its kind and fails the dtype-kind assertion
    in test_oracle_parity — so local green predicts the driver's
    dtype-sensitive value hash.
    """
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[ns]")
        elif s.dtype == object:
            s = s.map(
                lambda v: v.hex()
                if isinstance(v, (bytes, bytearray))
                else (float(v) if hasattr(v, "as_tuple") else v)
            )
        elif pd.api.types.is_extension_array_dtype(s):
            if s.dtype.kind == "f":
                s = s.astype("float64")
            elif s.dtype.kind in "iu" and not s.isna().any():
                s = s.astype("int64")
            else:
                s = s.astype("object")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")  # raises on values outside int64
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        out[col] = s
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), ignore_index=True)


def test_driver_window_covers_all_families():
    """The driver value-checks only the FIRST 50 registered queries
    (VERDICT r1 item 2) — pin that the window is exactly the curated
    priority list. Round 15 (optimization round 2): never-checked
    backlog at 0 (the r14 window drained the registration backlog,
    CORRECTNESS_r14 green), changed tier = the two audio feature
    queries whose encoders the r14 optimization vectorized but which
    missed the r14 window (VERDICT r14 item 1) plus THIS round's two
    plan rewrites (spearman join-back removal, Mann-Kendall slope
    groupBy removal) — changed-code leads; then pure staleness
    oldest-first: the 40 remaining r8-vintage rows (16 oracle-backed,
    then the r8 rows-only registration block), then the 6 oldest r9
    rows."""
    first50 = list(QUERIES)[:50]
    assert first50 == list(entrymod._PRIORITY), "registration order drifted"
    assert first50[:4] == [
        "mm_aac_features",
        "mm_mp3_features",
        "stats_spearman_qty_price",
        "trend_mann_kendall_theil_sen",
    ]


def test_doc_coverage_counts_match_registry():
    """SURVEY.md §2.4 and README.md state the registry's size — pin the
    prose to the actual counts so they can't drift again (ADVICE r3)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    reg, orc = len(QUERIES), len(ORACLE)
    survey = (root / "SURVEY.md").read_text()
    m = re.search(
        r"(\d+) registered queries: (\d+) DuckDB-oracle value-hash-checked, "
        r"(\d+) rows-only",
        survey,
    )
    assert m, "SURVEY.md §2.4 count sentence missing"
    assert tuple(map(int, m.groups())) == (reg, orc, reg - orc), (
        f"SURVEY.md says {m.groups()}, registry has "
        f"({reg}, {orc}, {reg - orc})"
    )
    readme = (root / "README.md").read_text()
    m = re.search(r"\((\d+) registered queries, (\d+) value-hash-checked", readme)
    assert m, "README.md count sentence missing"
    assert tuple(map(int, m.groups())) == (reg, orc), (
        f"README.md says {m.groups()}, registry has ({reg}, {orc})"
    )


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_names_subset_of_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, oracle):
    sp = canonicalize(QUERIES[name](spark, SF_TEST).toPandas())
    dk = canonicalize(oracle.execute(ORACLE[name]).fetchdf())
    assert list(sp.columns) == list(dk.columns), (
        f"{name}: columns {list(sp.columns)} != {list(dk.columns)}"
    )
    assert len(sp) == len(dk), f"{name}: {len(sp)} rows vs oracle {len(dk)}"
    for col in sp.columns:
        sk, dkk = sp[col].dtype.kind, dk[col].dtype.kind
        assert sk == dkk or {sk, dkk} <= {"O", "b"} or (
            # an all-NULL or empty column may degrade to object on one side
            len(sp) == 0 or sp[col].isna().all() or dk[col].isna().all()
        ), f"{name}.{col}: dtype kind {sk!r} (spark) vs {dkk!r} (oracle)"
    pd.testing.assert_frame_equal(sp, dk, check_dtype=False, check_exact=True, obj=name)


# Driver-hash tripwire (VERDICT r1 item 1): DuckDB SUM(BIGINT) returns
# HUGEINT (int128), which the driver's dtype-sensitive value hash rejects
# even when values equal Spark's int64. Sweep every oracle's output types
# so no registered SQL can reintroduce the failure class.
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_no_hugeint_columns(name, oracle):
    desc = oracle.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
    bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()]
    assert not bad, f"{name}: oracle emits int128 columns {bad} — CAST(... AS BIGINT)"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark):
    """Non-SQL-expressible ops at least produce a stable schema and rows."""
    df = QUERIES[name](spark, SF_TEST)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_driver_window_is_full_and_oracle_backed():
    """The driver's correctness gate checks the FIRST 50 registered
    queries; a rotation mistake (typo'd name, short window, duplicate
    slot) silently wastes driver evidence slots. Pin the contract:
    exactly 50 priority slots, every one resolves to a registered
    query, no duplicates. Round 15's window is staleness-keyed; the
    rows-only density (26 slots) is the r8-vintage registration block
    (text/BPE/multimodal/sketch tiers) coming due oldest-first, plus
    the two r14-changed audio queries leading the window — every
    rows-only slot has an oracle-checked exact twin or pinned laws."""
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    assert len(E._PRIORITY) == 50
    assert len(set(E._PRIORITY)) == 50  # no duplicate slots
    missing = [n for n in E._PRIORITY if n not in qs]
    assert not missing, f"window names not registered: {missing}"
    rows_only = [n for n in E._PRIORITY if n not in osql]
    assert rows_only[:2] == ["mm_aac_features", "mm_mp3_features"]
    assert len(rows_only) == 26, f"unexpected rows-only slots: {rows_only}"
    # and the window really is the first 50 registrations
    assert list(qs)[:50] == list(E._PRIORITY)


def test_relational_split_preserves_registration_order():
    """Round-7 split of relational.py into a package (VERDICT r6 item 3):
    the shared-registry + ordered-tier-import scheme must keep
    list(relational.QUERIES) byte-identical to the pre-split module.
    Snapshot taken immediately before the split; regenerate it ONLY when
    deliberately appending queries (never to paper over a reorder)."""
    import json
    import pathlib

    from console_etl_spark import relational

    snap = json.load(
        (pathlib.Path(__file__).parent / "data" / "relational_order_r7.json").open()
    )
    assert list(relational.QUERIES)[: len(snap)] == snap


def test_staleness_artifact_stale_queries_all_windowed():
    """STALENESS.json (tools_staleness.py) automates the judge's
    changed-code rule: any query whose implementation (AST-semantic,
    oracle-inclusive) changed after its latest driver row is stale
    against HEAD. The rotation contract: every such query must sit in
    the CURRENT driver window so its evidence catches up same-round,
    and the tool must resolve every query (an unresolvable row means a
    wrapper/rename broke the anchor — fix the tool, not the list)."""
    import json
    import pathlib

    import __spark_entry__ as E

    root = pathlib.Path(__file__).resolve().parent.parent
    doc = json.loads((root / "STALENESS.json").read_text())
    s = doc["summary"]
    assert s["unresolvable"] == []
    window = set(E._PRIORITY)
    missing = [q for q in s["stale_against_head"] if q not in window]
    assert missing == [], (
        f"changed-since-driver-row queries not in the window: {missing}"
    )
    # artifact in sync with the registry (same contract as PLAN_AUDIT)
    assert set(doc["queries"]) == set(E.queries())
    # and never-checked queries are exactly the current round's new
    # registrations, which lead the window
    for q in s["never_driver_checked"]:
        assert q in window, f"never-checked query outside window: {q}"
    # rows-only queries carry the law fingerprint fields (VERDICT r12
    # item 7): law churn now flags staleness the def-diff cannot see
    oracle_backed = set(E.oracle_sql())
    for q, row in doc["queries"].items():
        if q not in oracle_backed and row["latest_driver_round"]:
            assert "laws_changed" in row, f"rows-only {q} missing law scan"


def test_staleness_closure_fingerprint_sees_helper_and_constant_edits():
    """r13 closure upgrade: the def fingerprint must include same-file
    helpers and constants the query references (transitively), so a
    helper-body or constant edit flags the query stale — the class the
    r12 k-means partial-sort fix silently escaped. Cross-module names
    and comment churn must NOT flag."""
    import tools_staleness as ts

    base = (
        "ALPHA = 0.2\n"
        "def _finalize(df):\n"
        "    return df.select(ALPHA)\n"
        "def _unrelated():\n"
        "    return 42\n"
        "def my_query(spark, sf_dir):\n"
        '    """doc"""\n'
        "    # comment\n"
        "    return _finalize(load_table(spark, sf_dir))\n"
    )
    fp = ts._def_source(base, "my_query")
    assert fp is not None
    # docstring/comment churn: same fingerprint
    cosmetic = base.replace('"""doc"""', '"""reworded"""').replace(
        "# comment", "# other"
    )
    assert ts._def_source(cosmetic, "my_query") == fp
    # helper-body edit: flags
    helper_edit = base.replace("df.select(ALPHA)", "df.where(ALPHA)")
    assert ts._def_source(helper_edit, "my_query") != fp
    # constant edit: flags (transitively via the helper)
    const_edit = base.replace("ALPHA = 0.2", "ALPHA = 0.3")
    assert ts._def_source(const_edit, "my_query") != fp
    # an UNREFERENCED same-file def changing must not flag
    unrelated = base.replace("return 42", "return 43")
    assert ts._def_source(unrelated, "my_query") == fp

    # cross-module arm: the full loader engine closes over in-repo
    # imports (function-local form included), so a KERNEL edit in the
    # imported module flags the consumer; an out-of-repo import never
    # resolves
    files = {
        "console_etl_spark/relational/q.py": (
            "from pyspark.sql import functions as F\n"
            "def consumer(spark, sf_dir):\n"
            "    from ..llmops.pipeline import global_prefix_sum\n"
            "    return global_prefix_sum(F.lit(1))\n"
        ),
        "console_etl_spark/llmops/pipeline.py": (
            "K = 7\n"
            "def global_prefix_sum(df):\n"
            "    return df + K\n"
        ),
    }
    loader = files.get
    fp2 = ts._fingerprint(
        loader, "console_etl_spark/relational/q.py", "consumer", {}
    )
    assert fp2 is not None and "global_prefix_sum" in fp2
    edited_files = dict(files)
    edited_files["console_etl_spark/llmops/pipeline.py"] = files[
        "console_etl_spark/llmops/pipeline.py"
    ].replace("df + K", "df - K")
    fp3 = ts._fingerprint(
        edited_files.get, "console_etl_spark/relational/q.py", "consumer", {}
    )
    assert fp3 != fp2, "kernel edit must flag the consumer"
    # the kernel's own constant K is in the closure too (transitive)
    const_files = dict(files)
    const_files["console_etl_spark/llmops/pipeline.py"] = files[
        "console_etl_spark/llmops/pipeline.py"
    ].replace("K = 7", "K = 8")
    assert (
        ts._fingerprint(
            const_files.get,
            "console_etl_spark/relational/q.py",
            "consumer",
            {},
        )
        != fp2
    )
    # pyspark (out-of-repo) import resolves to nothing and never flags
    assert "pyspark" not in fp2


def test_staleness_law_fingerprint_fires_on_law_churn():
    """Synthetic proof (VERDICT r12 item 7) that the rows-only law rule
    fires: a law-test BODY edit changes the fingerprint, comment and
    docstring churn does not, registry-plumbing tests (window pins,
    high-fanout allowlists) are excluded, and adding a law flags too."""
    import tools_staleness as ts

    base = {
        "tests/test_x.py": (
            "def test_ann_lsh_recall_floor(spark):\n"
            '    """Recall >= 0.9 vs brute force."""\n'
            "    # law for the rows-only ANN query\n"
            "    out = ann_lsh_bucketed(spark, SF)\n"
            "    assert recall(out) >= 0.9\n"
        )
    }
    names = ("ann_lsh_bucketed",)
    fp = ts.law_fingerprint(base, names)
    assert [(p, t) for p, t, _ in fp] == [
        ("tests/test_x.py", "test_ann_lsh_recall_floor")
    ]

    # comment + docstring churn: same fingerprint
    cosmetic = {
        "tests/test_x.py": base["tests/test_x.py"]
        .replace("Recall >= 0.9 vs brute force.", "reworded docstring")
        .replace("# law for the rows-only ANN query", "# new comment")
    }
    assert ts.law_fingerprint(cosmetic, names) == fp

    # assertion edit: fingerprint changes -> the query goes stale
    edited = {
        "tests/test_x.py": base["tests/test_x.py"].replace("0.9", "0.8")
    }
    assert ts.law_fingerprint(edited, names) != fp

    # a NEW law test flags too (new law = new evidence obligation)
    grown = {
        "tests/test_x.py": base["tests/test_x.py"]
        + "\n\ndef test_ann_lsh_bucket_sizes(spark):\n"
        "    assert ann_lsh_bucketed(spark, SF).count() > 0\n"
    }
    assert len(ts.law_fingerprint(grown, names)) == 2

    # registry plumbing is excluded two ways: by name pattern...
    registry = dict(base)
    registry["tests/test_reg.py"] = (
        "def test_driver_window_covers_families():\n"
        '    assert "ann_lsh_bucketed" in PRIORITY\n'
    )
    assert ts.law_fingerprint(registry, names) == fp
    # ...and by registered-name fanout
    all_names = tuple(f"q_{i}" for i in range(ts.LAW_NAME_FANOUT_CAP)) + names
    fanout = dict(base)
    fanout["tests/test_list.py"] = (
        "def test_collect_sites():\n"
        "    allowed = ["
        + ", ".join(f'"{n}"' for n in all_names)
        + "]\n    assert allowed\n"
    )
    assert ts.law_fingerprint(fanout, names, all_names) == fp
