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
# Driver-coverage rotation (round 9).
#
# union(CORRECTNESS_r01..r08) covers all queries with zero red latest rows
# (r8 judge-verified). Round-9 slots go to: the two new queries, the
# queries whose OUTPUT changed this round (setsim shingling, multimodal
# payload cycle), the CC-family whose PLAN changed (one-job rounds), then
# the stalest driver rows (4 r03 + the r04 block, oldest first). The 21
# r04 rows that do not fit lead the r10 stale block; full-registry parity
# is additionally checked every round by tools/check_oracle.py at
# sf0.001/0.01/0.1 (CHECK_ORACLE_r9*.json).
_R09_ADDITIONS: list[str] = [
    k
    for k in _rotation.R09_ADDITION_NAMES
    if k in _dicts.QUERIES
]

_R09_PRIORITY: list[str] = list(
    dict.fromkeys(_R09_ADDITIONS + _rotation._R09_STALE)
)[:50]

assert len(_R09_PRIORITY) == 50 and len(set(_R09_PRIORITY)) == 50
assert set(_R09_PRIORITY) <= set(_dicts.QUERIES), sorted(
    set(_R09_PRIORITY) - set(_dicts.QUERIES)
)

_rotated = _R09_PRIORITY + [k for k in _dicts.QUERIES if k not in set(_R09_PRIORITY)]
QUERIES = {k: _dicts.QUERIES[k] for k in _rotated}
ORACLES = {k: _dicts.ORACLES[k] for k in _rotated}
