"""Banded range join: all (left, right) pairs with equal keys and
timestamps within a gap — |left.ts - right.ts| <= max_gap.

Spark's planner turns a raw inequality join condition into a broadcast
nested loop (or a full cartesian per key) — O(n*m) per key, hopeless at
100 TB. The scalable encoding bins both sides by ``max_gap``-sized time
buckets: a pair within the gap must sit in the same or adjacent buckets,
so exploding the LEFT side into its bucket±1 turns the range predicate
into an equi-join on (key, bucket) with exactly 3x left fan-out, then a
cheap residual filter. Linear work, ordinary shuffle hash join, AQE can
still split skewed (key, bucket) cells.

This is the same binned-interval-join strategy Flink's interval join and
DuckDB's IEJoin papers describe for bounded-gap joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_gap: int,
) -> DataFrame:
    """Inner join of left x right on equal ``key_cols`` with
    |left_ts - right_ts| <= max_gap (same unit as the ts columns).
    Column sets must be disjoint apart from ``key_cols``."""
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    gap = F.lit(max_gap).cast("long")

    def bucket(ts_col: str) -> F.Column:
        # exact integer floor-div; ts columns are non-negative epochs
        return F.expr(f"CAST({ts_col} AS LONG) div {int(max_gap)}")

    l = left.withColumn(
        _BUCKET,
        F.explode(F.array(bucket(left_ts) - 1, bucket(left_ts), bucket(left_ts) + 1)),
    )
    r = right.withColumn(_BUCKET, bucket(right_ts))
    j = l.join(r, [*key_cols, _BUCKET]).drop(_BUCKET)
    return j.filter(
        F.abs(F.col(left_ts).cast("long") - F.col(right_ts).cast("long")) <= gap
    )
