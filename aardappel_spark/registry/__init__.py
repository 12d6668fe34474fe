"""Query inventory: every implemented operator as (spark_fn, oracle_sql).

The driver runs each Spark query at sf0.01 against its DuckDB oracle
(row count + schema + order-insensitive value hash), so every pair here
must agree on COLUMN NAMES and value rendering. Numeric outputs are
bigint, or doubles produced by identical exact-decimal -> double -> round
pipelines in both engines.

Split into per-domain modules (round 8); each module populates the shared
``QUERIES``/``ORACLES`` dicts in ``_dicts`` at import time. Import order is
topological on cross-module oracle/function references (corpus and graph
consume ann's kNN oracle). ``_shared`` holds the helpers, CTE constants and
per-session caches every domain uses. The flat ``aardappel_spark.registry``
namespace (helpers, ``q_*`` functions, caches) is preserved by hoisting each
module's names below, so existing imports keep working unchanged.
"""

from __future__ import annotations

from . import _dicts, _shared
from . import cdc, tpch, events, dedup, ann, text, corpus, graph, sales, layout, misc
from . import _rotation

from ._shared import *  # noqa: F401,F403

_MODULES = (_shared, cdc, tpch, events, dedup, ann, text, corpus, graph,
            sales, layout, misc, _rotation)
for _m in _MODULES:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = _v
del _m, _k, _v

# ---------------------------------------------------------------------------
# Driver-coverage rotation (round 13).
#
# union(CORRECTNESS_r01..r12) covers all 261 queries with zero red
# latest rows (r12 judge-verified). Round-13 slots go to: the queries
# whose OUTPUT changed this round (the 4-bit packed grey PNG sub-arm)
# plus the PLAN-changed re-gates (the setsim verify join and the
# exact-dedup anti-join are now bucket-pruned; the guard reads a
# counts sidecar), then ALL 29 rows whose latest driver gate is r07
# (the r12 rotation comment's promise: the r07 tail leads), then the
# r08 block in name order. r08 rows that do not fit lead the r14
# stale block; full-registry parity is additionally checked every
# round by tools/check_oracle.py at sf0.001/0.01/0.1
# (CHECK_ORACLE_r13*.json).
_R13_ADDITIONS: list[str] = [
    k
    for k in _rotation.R13_ADDITION_NAMES
    if k in _dicts.QUERIES
]

_R13_PRIORITY: list[str] = list(
    dict.fromkeys(_R13_ADDITIONS + _rotation._R13_STALE)
)[:50]

assert len(_R13_PRIORITY) == 50 and len(set(_R13_PRIORITY)) == 50
assert set(_R13_PRIORITY) <= set(_dicts.QUERIES), sorted(
    set(_R13_PRIORITY) - set(_dicts.QUERIES)
)

# kept importable for the r12 rotation regression test
_R12_ADDITIONS: list[str] = [
    k
    for k in _rotation.R12_ADDITION_NAMES
    if k in _dicts.QUERIES
]
_R12_PRIORITY: list[str] = list(
    dict.fromkeys(_R12_ADDITIONS + _rotation._R12_STALE)
)[:50]

# kept importable for the r11 rotation regression test
_R11_ADDITIONS: list[str] = [
    k
    for k in _rotation.R11_ADDITION_NAMES
    if k in _dicts.QUERIES
]
_R11_PRIORITY: list[str] = list(
    dict.fromkeys(_R11_ADDITIONS + _rotation._R11_STALE)
)[:50]

# kept importable for the r10 rotation regression test
_R10_ADDITIONS: list[str] = [
    k
    for k in _rotation.R10_ADDITION_NAMES
    if k in _dicts.QUERIES
]
_R10_PRIORITY: list[str] = list(
    dict.fromkeys(_R10_ADDITIONS + _rotation._R10_STALE)
)[:50]

_rotated = _R13_PRIORITY + [k for k in _dicts.QUERIES if k not in set(_R13_PRIORITY)]
QUERIES = {k: _dicts.QUERIES[k] for k in _rotated}
ORACLES = {k: _dicts.ORACLES[k] for k in _rotated}
