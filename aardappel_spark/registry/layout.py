"""Clustered layout: Z-order/Hilbert writes, zone-map pruned reads."""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cdc_queries as cdc
from ..ops.dedup import (
    exact_dedup_groups,
    minhash_candidate_pairs,
    minhash_signatures,
    simhash,
    verify_pairs_jaccard,
)
from ..sources import load_events_ns
from ..ops.similarity import (
    brute_force_topk,
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    lsh_banded_candidates,
    lsh_banded_topk,
    lsh_bucket_topk,
)
from ..ops.text import (
    LANG_PROFILES,
    STOPWORDS,
    fingerprint,
    language_id,
    quality_by_group,
    token_stats,
)

from ._dicts import QUERIES, ORACLES
from ._shared import *  # noqa: F401,F403



def q_layout_zorder_skip(spark, sf_dir):
    """Z-order (Morton) data layout vs single-dimension sorts, scored
    by zone-map file skipping — the write-time decision that dominates
    100 TB scan cost: a table range-partitioned on one column prunes
    nothing for predicates on the other, while interleaving both
    dimensions' bits gives every file a tight min/max box in BOTH, so
    a 2-D range predicate (here the center 64/256 square of
    user x day) reads ~4/64 files instead of 16/64 (each single-sort
    layout) — the multi-dimensional clustering argument behind
    Delta/Iceberg OPTIMIZE ZORDER BY.

    Files are VALUE-range partitions (file = top 6 bits of the layout
    key), exactly how a range-partitioned write behaves — so the whole
    simulation is one scan + one hash-agg per (layout, file): no global
    sort, no window, fully distributed at any scale. min/max per file
    are the parquet footer zone maps; files_scanned counts files whose
    box intersects the predicate; scan_ppm is the fraction of rows a
    zone-map-pruning reader actually touches. All-integer output."""
    ev = load_events_ns(spark, sf_dir)
    base = ev.select(
        "user_id", F.expr(f"ts div {86_400 * 10**9}").alias("day")
    )
    rng = base.agg(
        F.min("user_id").alias("_u0"), F.max("user_id").alias("_u1"),
        F.min("day").alias("_d0"), F.max("day").alias("_d1"),
    )
    g = base.crossJoin(F.broadcast(rng)).selectExpr(
        "((user_id - _u0) * 256) div (_u1 - _u0 + 1) as ub",
        "((day - _d0) * 256) div (_d1 - _d0 + 1) as db",
    ).selectExpr(
        "ub", "db", f"({_zorder_terms('ub', 'db', 8, 'div')}) as zkey"
    )
    lay = g.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("user_sort").alias("layout"),
                    F.expr("ub div 4").alias("file_id"),
                ),
                F.struct(
                    F.lit("time_sort").alias("layout"),
                    F.expr("db div 4").alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr("zkey div 1024").alias("file_id"),
                ),
            )
        ).alias("lf"),
        "ub",
        "db",
    ).select("lf.layout", "lf.file_id", "ub", "db")
    hit = "ub between 96 and 159 and db between 96 and 159"
    files = lay.groupBy("layout", "file_id").agg(
        F.count("*").alias("rows_in_file"),
        F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
        F.min("db").alias("min_db"), F.max("db").alias("max_db"),
        F.sum(F.expr(f"case when {hit} then 1 else 0 end")).alias("rows_hit"),
    )
    scanned = F.expr(
        "min_ub <= 159 and max_ub >= 96 and min_db <= 159 and max_db >= 96"
    )
    return files.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.when(scanned, 1).otherwise(0)).cast("bigint")
        .alias("files_scanned"),
        F.sum("rows_in_file").cast("bigint").alias("rows_total"),
        F.sum(F.when(scanned, F.col("rows_in_file")).otherwise(0))
        .cast("bigint").alias("rows_scanned"),
        F.sum("rows_hit").cast("bigint").alias("rows_selected"),
    ).selectExpr(
        "layout", "n_files", "files_scanned", "rows_total", "rows_scanned",
        "rows_selected", "(1000000 * rows_scanned) div rows_total as scan_ppm",
    )


QUERIES["layout_zorder_skip"] = q_layout_zorder_skip

ORACLES["layout_zorder_skip"] = f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
r AS (
  SELECT min(user_id) AS u0, max(user_id) AS u1,
         min(day) AS d0, max(day) AS d1
  FROM b
),
g AS (
  SELECT ((user_id - u0) * 256) // (u1 - u0 + 1) AS ub,
         ((day - d0) * 256) // (d1 - d0 + 1) AS db
  FROM b CROSS JOIN r
),
gz AS (SELECT ub, db, ({_zorder_terms('ub', 'db', 8, '//')}) AS zkey FROM g),
lay AS (
  SELECT 'user_sort' AS layout, ub // 4 AS file_id, ub, db FROM gz
  UNION ALL SELECT 'time_sort', db // 4, ub, db FROM gz
  UNION ALL SELECT 'zorder', zkey // 1024, ub, db FROM gz
),
f AS (
  SELECT layout, file_id, count(*) AS rows_in_file,
         min(ub) AS min_ub, max(ub) AS max_ub,
         min(db) AS min_db, max(db) AS max_db,
         sum(CASE WHEN ub BETWEEN 96 AND 159 AND db BETWEEN 96 AND 159
                  THEN 1 ELSE 0 END) AS rows_hit
  FROM lay GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN min_ub <= 159 AND max_ub >= 96
                      AND min_db <= 159 AND max_db >= 96
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(rows_in_file) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN min_ub <= 159 AND max_ub >= 96
                      AND min_db <= 159 AND max_db >= 96
                     THEN rows_in_file ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(rows_hit) AS BIGINT) AS rows_selected,
       (1000000 * CAST(sum(CASE WHEN min_ub <= 159 AND max_ub >= 96
                                 AND min_db <= 159 AND max_db >= 96
                                THEN rows_in_file ELSE 0 END) AS BIGINT))
         // CAST(sum(rows_in_file) AS BIGINT) AS scan_ppm
FROM f GROUP BY layout
"""


def q_layout_hilbert_skip(spark, sf_dir):
    """Hilbert-curve layout vs Z-order, scored by zone-map skipping AND
    scan CONTIGUITY under a wide-flat 2-D predicate (user in the middle
    half x a narrow day band — the box shape that crosses Morton's
    midline seams): both layouts read the same bytes (files_scanned is
    equal; zone maps don't care which curve ordered the files), but the
    Hilbert layout's scanned files form ~3 contiguous id runs vs
    Morton's ~8 — and at 100 TB a run of consecutive files is a
    sequential-IO range request, so scan_runs is the seek count. This
    is the published clustering result (Moon et al., "Analysis of the
    Clustering Properties of the Hilbert Space-Filling Curve", TKDE
    2001) and the reason engines offer Hilbert alongside Z-order for
    OPTIMIZE clustering.

    Same fully-distributed shape as layout_zorder_skip (value-range
    files, one scan + hash-aggs); the Hilbert walk is 8 row-local
    projections (one codegen stage), generated from the SAME expression
    text the oracle runs. The run-counting window orders ~128
    (layout, file) rows — driver-scale, not data-scale."""
    from pyspark.sql import Window

    ev = load_events_ns(spark, sf_dir)
    base = ev.select(
        "user_id", F.expr(f"ts div {86_400 * 10**9}").alias("day")
    )
    rng = base.agg(
        F.min("user_id").alias("_u0"), F.max("user_id").alias("_u1"),
        F.min("day").alias("_d0"), F.max("day").alias("_d1"),
    )
    g = base.crossJoin(F.broadcast(rng)).selectExpr(
        "((user_id - _u0) * 256) div (_u1 - _u0 + 1) as ub",
        "((day - _d0) * 256) div (_d1 - _d0 + 1) as db",
    )
    h = g.selectExpr(
        "ub", "db", "ub as hx", "db as hy", "CAST(0 AS BIGINT) as hd"
    )
    for s in _HILBERT_LEVELS:
        d_e, x_e, y_e = _hilbert_level(s, "div")
        h = h.selectExpr(
            "ub", "db", f"({x_e}) as hx", f"({y_e}) as hy", f"({d_e}) as hd"
        )
    keyed = h.selectExpr(
        "ub", "db",
        f"({_zorder_terms('ub', 'db', 8, 'div')}) as zkey", "hd as hkey",
    )
    lay = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr("zkey div 1024").alias("file_id"),
                ),
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.expr("hkey div 1024").alias("file_id"),
                ),
            )
        ).alias("lf"),
        "ub",
        "db",
    ).select("lf.layout", "lf.file_id", "ub", "db")
    hit = "ub between 64 and 191 and db between 100 and 131"
    files = lay.groupBy("layout", "file_id").agg(
        F.count("*").alias("rows_in_file"),
        F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
        F.min("db").alias("min_db"), F.max("db").alias("max_db"),
        F.sum(F.expr(f"case when {hit} then 1 else 0 end")).alias("rows_hit"),
    ).withColumn(
        "scanned",
        F.expr(
            "min_ub <= 191 and max_ub >= 64 and min_db <= 131 and max_db >= 100"
        ),
    )
    w = Window.partitionBy("layout", "scanned").orderBy("file_id")
    runs = files.withColumn("prev_scanned", F.lag("file_id").over(w))
    return runs.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.when(F.col("scanned"), 1).otherwise(0)).cast("bigint")
        .alias("files_scanned"),
        F.sum(
            F.when(
                F.col("scanned")
                & (
                    F.col("prev_scanned").isNull()
                    | (F.col("file_id") != F.col("prev_scanned") + 1)
                ),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("scan_runs"),
        F.sum("rows_in_file").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("scanned"), F.col("rows_in_file")).otherwise(0))
        .cast("bigint").alias("rows_scanned"),
        F.sum("rows_hit").cast("bigint").alias("rows_selected"),
    ).selectExpr(
        "layout", "n_files", "files_scanned", "scan_runs", "rows_total",
        "rows_scanned", "rows_selected",
        "(1000000 * rows_scanned) div rows_total as scan_ppm",
    )


QUERIES["layout_hilbert_skip"] = q_layout_hilbert_skip


ORACLES["layout_hilbert_skip"] = f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
r AS (
  SELECT min(user_id) AS u0, max(user_id) AS u1,
         min(day) AS d0, max(day) AS d1
  FROM b
),
g AS (
  SELECT ((user_id - u0) * 256) // (u1 - u0 + 1) AS ub,
         ((day - d0) * 256) // (d1 - d0 + 1) AS db
  FROM b CROSS JOIN r
),
{_hilbert_ctes('//')},
keyed AS (
  SELECT ub, db, ({_zorder_terms('ub', 'db', 8, '//')}) AS zkey, hd AS hkey
  FROM h8
),
lay AS (
  SELECT 'zorder' AS layout, zkey // 1024 AS file_id, ub, db FROM keyed
  UNION ALL SELECT 'hilbert', hkey // 1024, ub, db FROM keyed
),
f AS (
  SELECT layout, file_id, count(*) AS rows_in_file,
         min(ub) AS min_ub, max(ub) AS max_ub,
         min(db) AS min_db, max(db) AS max_db,
         sum(CASE WHEN ub BETWEEN 64 AND 191 AND db BETWEEN 100 AND 131
                  THEN 1 ELSE 0 END) AS rows_hit
  FROM lay GROUP BY 1, 2
),
s AS (
  SELECT *,
         (min_ub <= 191 AND max_ub >= 64 AND min_db <= 131 AND max_db >= 100)
           AS scanned,
         lag(file_id) OVER (
           PARTITION BY layout,
             (min_ub <= 191 AND max_ub >= 64
              AND min_db <= 131 AND max_db >= 100)
           ORDER BY file_id
         ) AS prev_scanned
  FROM f
)
SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned,
       CAST(sum(CASE WHEN scanned AND (prev_scanned IS NULL
                      OR file_id != prev_scanned + 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS scan_runs,
       CAST(sum(rows_in_file) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN scanned THEN rows_in_file ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(sum(rows_hit) AS BIGINT) AS rows_selected,
       (1000000 * CAST(sum(CASE WHEN scanned THEN rows_in_file ELSE 0 END)
                       AS BIGINT))
         // CAST(sum(rows_in_file) AS BIGINT) AS scan_ppm
FROM s GROUP BY layout
"""
