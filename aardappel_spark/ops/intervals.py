"""Interval analytics: sweep-line concurrency and bucketed
point-in-interval joins.

Two operators Spark has no native form for, each with a scalable
encoding instead of the naive O(n*m) range join:

- ``interval_concurrency``: how many intervals are active at each
  grid boundary — the concurrent-sessions / active-connections curve.
  The naive form joins every interval to every boundary it covers;
  the sweep-line form aggregates FIRST (two hash-aggs: interval
  starts and ends bucketed to the grid) and only then runs the
  cumulative sum — over the GRID, whose size is time-range/bucket
  (thousands of rows at any corpus size), not the data. The
  boundary-instant identity is integer-exact:
  ``active(t) = #{start <= t} - #{end < t}`` for closed intervals.

- ``point_in_interval_join``: inner join of points to the intervals
  containing them (same keys, half-open ``[start, end)``). The naive
  inequality join is a per-key cartesian; the scalable encoding
  explodes each interval into the ``bucket``-sized time cells it
  covers, turning containment into an equi-join on (keys, cell) plus
  a residual filter — the binned range-join strategy (Flink interval
  join; Databricks range-join binning). Each point lives in exactly
  one cell, so no pair is produced twice. Fan-out per interval is
  ceil(len/bucket)+1 cells: pick ``bucket`` near the typical interval
  length so the explode is a small constant.

No reference counterpart (the reference is a CDC applier); these are
the session-analytics operators a 100 TB event pipeline adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_CELL = "__iv_cell"


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Active-interval count at each ``bucket``-grid boundary spanning
    the data: rows ``(boundary, active)``, both BIGINT. Intervals are
    closed ``[start, end]`` in integer time units; a boundary t counts
    interval i iff ``start_i <= t <= end_i``.

    Shape: two corpus-scale hash-aggs (starts by ceil-div cell, ends
    by floor-div cell), one 1-row min/max agg to materialize the grid,
    then a single-partition cumulative window over the grid only —
    fine because the grid is O(time_range / bucket), independent of
    row count.

    Raises ``ValueError`` on negative interval times: the ceil/floor
    boundary identities above use truncating integer division, whose
    ceil/floor correspondence only holds for non-negative operands —
    pre-1970 epochs would silently return wrong active counts, so
    misuse fails loudly instead (validated on the same 1-row min/max
    agg that materializes the grid, no extra pass).
    """
    b = int(bucket)

    # Three consumers (starts agg, ends agg, grid min/max) would
    # otherwise recompute the interval derivation — often a window
    # over the full corpus — three times; materialize the 16-byte
    # (start, end) projection once instead.
    iv = intervals.select(
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).localCheckpoint(eager=False)

    # starts <= k*b  <=>  ceil(start/b) <= k   (non-negative epochs)
    sc = (
        iv.select(F.expr(f"(__s + {b - 1}) div {b}").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("sc"))
    )
    # ends < k*b  <=>  floor(end/b) <= k - 1
    ec = (
        iv.select(F.expr(f"__e div {b}").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("ec"))
    )
    # 1-row agg doubles as the negative-time guard (the div identities
    # above require non-negative operands; see docstring)
    bounds = iv.agg(
        F.min("__s").alias("s0"),
        F.min("__e").alias("e0"),
        F.max("__e").alias("e1"),
    ).first()
    if bounds["s0"] is None:  # empty input -> empty curve
        return iv.select(
            F.lit(0).cast("bigint").alias("boundary"),
            F.lit(0).cast("bigint").alias("active"),
        ).limit(0)
    if bounds["s0"] < 0 or bounds["e0"] < 0:
        raise ValueError(
            "interval_concurrency requires non-negative interval times "
            f"(got min start {bounds['s0']}, min end {bounds['e0']}): the "
            "grid's truncating-div ceil/floor identities do not hold for "
            "negative operands"
        )
    k0 = bounds["s0"] // b
    k1 = (bounds["e1"] + b - 1) // b
    grid = iv.sparkSession.range(k0, k1 + 1).select(F.col("id").alias("k"))
    g = (
        grid.join(sc, "k", "left")
        .join(ec, "k", "left")
        .select(
            "k",
            F.coalesce("sc", F.lit(0)).alias("sc"),
            F.coalesce("ec", F.lit(0)).alias("ec"),
        )
    )
    w = Window.orderBy("k")
    cum_s = F.sum("sc").over(w.rowsBetween(Window.unboundedPreceding, 0))
    cum_e = F.coalesce(
        F.sum("ec").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return g.select(
        (F.col("k") * b).cast("bigint").alias("boundary"),
        (cum_s - cum_e).cast("bigint").alias("active"),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Inner join: each ``points`` row paired with every ``intervals``
    row sharing ``key_cols`` whose half-open ``[start, end)`` contains
    the point. Column sets must be disjoint apart from the keys.

    Encoded as an equi-join on (keys, time cell): the interval side
    explodes into its covered cells (``sequence(start div b,
    (end-1) div b)``), the point side computes its single cell, then a
    residual containment filter. Empty intervals (end <= start) match
    nothing.
    """
    overlap = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")
    b = int(bucket)

    iv = intervals.filter(
        F.col(end_col).cast("long") > F.col(start_col).cast("long")
    ).withColumn(
        _CELL,
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS LONG) div {b}"),
                F.expr(f"(CAST({end_col} AS LONG) - 1) div {b}"),
            )
        ),
    )
    pt = points.withColumn(_CELL, F.expr(f"CAST({point_col} AS LONG) div {b}"))
    j = pt.join(iv, [*key_cols, _CELL]).drop(_CELL)
    return j.filter(
        (F.col(point_col).cast("long") >= F.col(start_col).cast("long"))
        & (F.col(point_col).cast("long") < F.col(end_col).cast("long"))
    )
