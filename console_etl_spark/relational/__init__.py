"""Relational extension tier (SURVEY.md §2.3 X7).

The reference has no joins, numeric aggregations, windows, or set ops
(SURVEY.md §2.2) — this module makes those absences concrete and testable
over the star-schema fixtures, as pure built-in DataFrame plans that
Catalyst/Tungsten optimize (broadcast joins for bounded dims, partial
aggregation, whole-stage codegen, AQE skew handling).

Oracle-parity conventions (every query here is DuckDB-hash-checked):
- Money arithmetic casts inputs to DECIMAL(18,2) *before* summing, then
  casts the exact result to DOUBLE — bit-identical across engines
  regardless of summation order (verified by calibration).
- Averages are written sum/count explicitly so both engines divide the
  same exact operands.
- Every LIMIT carries a total ORDER BY (ties broken by key) so top-k
  sets match exactly.

Scale notes (100 TB): filters precede joins so parquet pushdown bounds
the scan; dimension joins (region/nation/customer/supplier/part) are
broadcast — only the fact table shuffles, and only when an aggregation
key demands it; AQE coalesces post-shuffle partitions and splits skewed
ones at runtime.
"""


from ._base import ORACLE, QUERIES, QueryFn, _register, dec, one, rate
from ..session import load_table

# Tier modules in ORIGINAL relational.py file order: each registers into
# the shared dicts at import, so list(QUERIES) is byte-identical to the
# pre-split single module (pinned by tests/test_oracle_parity.py).
from . import core       # noqa: E402  aggregations/joins/windows/setops/events/temporal
from . import tpch       # noqa: E402  TPC-H suite + skew salting + Q2/Q20 shapes
from . import warehouse  # noqa: E402  percentiles/fuzzy, SCD2, anomaly, DQ, behavioral, MV
from . import analytics  # noqa: E402  regression aggregates .. hypothesis tests
from . import timeseries # noqa: E402  EWMA/ACF, drift, association, privacy, lifecycle

# Hoist every tier-module name (including _private helpers other modules
# and tests import, e.g. streaming's _DQ_SQL) so `relational.X` keeps
# working exactly as before the split.
_hoisted_from: dict[str, str] = {}
for _mod in (core, tpch, warehouse, analytics, timeseries):
    for _n in dir(_mod):
        if _n.startswith("__"):
            continue
        _obj = getattr(_mod, _n)
        if _n not in globals():
            globals()[_n] = _obj
            _hoisted_from[_n] = _mod.__name__
        elif globals()[_n] is not _obj:
            # Two tier modules (or a tier module and this package) bind
            # the same name to DIFFERENT objects — a silent
            # first-import-wins here would mask a duplicated helper
            # with divergent behavior. Shared imports (F, Window,
            # _base's registries) are the same object and pass.
            raise ImportError(
                f"relational tier name collision: {_n!r} from "
                f"{_mod.__name__} conflicts with the binding from "
                f"{_hoisted_from.get(_n, __name__)}"
            )
del _mod, _n, _obj, _hoisted_from
