"""As-of (temporal) join: match each left row to the most recent right
row at-or-before its timestamp, per key.

Spark has no ASOF JOIN operator; the naive encoding is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row max), which Catalyst
executes as an exploding inner join followed by an aggregation — O(n*m)
within each key at 100 TB. This implementation uses the scalable
union-and-carry formulation instead:

  1. tag right rows side=0, left rows side=1 and union them;
  2. one window over (key) ordered by (ts, side): ``last(payload,
     ignoreNulls=True)`` carries the latest right payload forward;
  3. keep only left rows.

Cost: ONE shuffle on the key (the window sort), linear in |L|+|R| —
the same shape Flink's temporal join and kdb's aj use. Ties (right.ts ==
left.ts) match, because side=0 sorts before side=1 at equal ts.

The right side must be unique per (key, ts); callers dedup first (see
``events_asof_order`` in registry.py) — otherwise "the" as-of row is
ambiguous and engines disagree arbitrarily. Payload columns must be
non-null on the right side: the ignore-nulls carry cannot distinguish
"matched a null value" from "no match", so a null payload would show
the previous row's value (wrap nullable payloads in a struct if this
matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of-backward join.

    Returns every ``left`` row with ``payload_cols`` from the most recent
    ``right`` row whose ``right_ts`` <= ``left_ts`` within the same
    ``key_cols`` group (null payloads when none precede). ``tolerance``
    optionally voids matches older than ``left_ts - tolerance`` (same
    unit as the ts columns).
    """
    overlap = set(left.columns) & set(payload_cols)
    if overlap:
        raise ValueError(f"payload columns collide with left side: {sorted(overlap)}")

    r = right.select(
        *key_cols,
        F.col(right_ts).cast("long").alias(_TS),
        F.lit(0).alias(_SIDE),
        *payload_cols,
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_ts).cast("long").alias(_TS),
        F.lit(1).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        F.col(_TS),
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
        F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        stale = F.col("__match_ts") < (F.col(_TS) - F.lit(tolerance))
        carried = carried.select(
            *left_cols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in payload_cols],
            F.when(stale, F.lit(None)).otherwise(F.col("__match_ts")).alias("__match_ts"),
        )
    return carried.select(*left_cols, *payload_cols, F.col("__match_ts").alias("asof_ts"))
