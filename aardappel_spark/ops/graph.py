"""Graph kernels over edge DataFrames.

The engine's graph queries (PageRank over the kNN similarity graph,
connected components in ops.dedup) are data-parallel passes keyed on
the graph's edges — never a driver-side adjacency structure. This
module holds the iteration kernels so the gated registry queries and
the scale probe's dialed variants run the SAME code on different edge
frames (fixed-band vs occupancy-constant-band candidate generation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**15  # fixed-point unit for pagerank mass


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    iters: int = 3,
    d_pct: int = 85,
) -> DataFrame:
    """PageRank power iterations in FIXED-POINT BIGINT units of 1e-15.

    ``nodes`` is one ``vec_id`` per vertex; ``edges`` is (src, dst).
    Each iteration is one edges-join-ranks + groupBy(dst) pass
    (shuffle keyed on the graph) plus a 1-row dangling-mass aggregate
    collected like quality_lr_train's gradient steps. Integer sums are
    exact under any shuffle order — a float formulation flipped the
    9th decimal at sf0.1 — which is what lets a DuckDB oracle replay
    every iteration as CTEs in the same arithmetic. ``localCheckpoint``
    per pass truncates lineage so iteration i re-reads N rank rows,
    not the whole history.

    Returns (vec_id, r) with r in PR_SCALE fixed-point units; callers
    convert to double at the edge of the engine.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    r = nodes.select("vec_id", F.lit(PR_SCALE // n_nodes).alias("r"))
    base = ((100 - d_pct) * PR_SCALE) // (100 * n_nodes)
    for _ in range(iters):
        r = r.localCheckpoint()  # truncate lineage: each pass reads N rows
        dang = (
            r.join(outdeg.withColumnRenamed("src", "vec_id"), "vec_id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)))
            .first()[0]
        )
        contrib = (
            edges.join(r.withColumnRenamed("vec_id", "src"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).alias("contrib"))
        )
        r = nodes.join(contrib.withColumnRenamed("dst", "vec_id"), "vec_id", "left").select(
            "vec_id",
            F.expr(
                f"{base}L + ({d_pct} * (coalesce(contrib, 0L)"
                f" + {int(dang) // n_nodes}L)) div 100"
            ).alias("r"),
        )
    return r
