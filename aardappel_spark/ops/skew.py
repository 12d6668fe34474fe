"""Skew-safe two-phase (salted) aggregation.

A `groupBy(key)` over data where one key holds a large share of all rows
sends that whole share to a single reducer — the classic straggler at
100 TB. AQE splits skewed JOIN partitions but does not re-shard a
skewed aggregation key. The fix is algebraic: for decomposable
aggregates (count/sum/min/max), aggregate on (key, salt) first —
spreading the hot key over ``n_salts`` reducers — then combine the
partials with a second tiny aggregation on key alone.

The salt must be deterministic but well-spread; we derive it from a
hash of the full row's natural distribution: ``pmod(hash(monotonic row
pieces), n)`` would be nondeterministic under retries, so we hash the
VALUE columns. Spark's map-side partial aggregation already absorbs
mild skew; this operator is for the heavy-hitter regime where even
post-combine per-key partials overwhelm one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial -> final combiner for each supported decomposable aggregate
_COMBINERS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation of ``df`` grouped by ``key_cols``.

    ``aggs`` maps output column -> (agg_name, input_col) with agg_name
    in count/sum/min/max. ``salt_on`` (default: the first agg input
    column) seeds the deterministic salt ``pmod(hash(col), n_salts)``.
    Result is identical to the direct groupBy (tested), but the first
    shuffle spreads each key over up to ``n_salts`` reducers.
    """
    unknown = {a for a, _ in aggs.values()} - set(_COMBINERS)
    if unknown:
        raise ValueError(f"unsupported aggregates: {sorted(unknown)}")
    if salt_on is None:
        salt_on = next(iter(aggs.values()))[1]
    sc = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salt = F.pmod(F.hash(sc), F.lit(n_salts)).alias("__salt")

    partial = df.groupBy(*key_cols, salt).agg(
        *[
            _COMBINERS[a][0](col).alias(f"__p_{out}")
            for out, (a, col) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            _COMBINERS[a][1](f"__p_{out}").alias(out)
            for out, (a, _) in aggs.items()
        ]
    )
