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
        # lazy: the dangling-mass first() below is the pass's own
        # driver sync and materializes the blocks — an eager
        # checkpoint spent a second job per iteration on the same rows
        r = r.localCheckpoint(eager=False)  # truncate lineage: each pass reads N rows
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


def _oriented_edges(edges: DataFrame, src: str = "src", dst: str = "dst"):
    """Shared degree-ordered orientation (Schank & Wagner 2005): dedup
    the undirected edge list, compute degrees, and direct every edge
    from its (degree, id)-smaller endpoint to the larger. Returns
    (und, deg, o) where ``o`` has columns (a, b, db). Both the global
    triangle census and the per-vertex clustering census consume this
    ONE implementation, so the orientation (tie-break, checkpoint
    policy) can never diverge between them.

    The deduped edge list feeds several consumers (degrees, orientation,
    edge count) and its upstream is typically an expensive candidate
    generation — materialize the 16-byte pairs once; oriented edges are
    read three times (both wedge legs + closing) — materialize instead
    of recomputing the degree joins per consumer."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # lazy: the degree aggregate is the first consumer and
        # materializes the blocks (no dedicated checkpoint job)
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = F.struct(F.col("du").alias("kd"), F.col("u").alias("kn")) < F.struct(
        F.col("dv").alias("kd"), F.col("v").alias("kn")
    )
    o = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=False)
    return und, deg, o


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle census of the undirected graph under ``edges``:
    one row — (n_nodes, n_edges, n_wedges, n_triangles, gcc_ppm), all
    BIGINT (gcc = 3*triangles/wedges as fixed-point ppm, 0 when
    wedge-free).

    Algorithm: degree-ordered edge orientation (Schank & Wagner 2005;
    the MapReduce form is Suri & Vassilvitskii, WWW 2011). Every edge
    is directed from its (degree, id)-smaller endpoint to the larger;
    wedges are generated ONLY among a node's out-neighbors, and a
    node's out-degree under this orientation is O(sqrt(m)) for any
    graph — so wedge generation is bounded even around celebrity hubs,
    where the naive "join edges on the shared endpoint" explodes
    quadratically in the hub degree. The closing-edge check is a
    LEFT SEMI join (each wedge at most once, no post-dedup). Every
    triangle is counted exactly once: its three vertices have a unique
    (degree, id) order.

    Shapes: dedup + degree count (two hash-aggs), one self-join on the
    orientation source, one semi join — all equi-joins on vertex ids;
    AQE handles residual skew.
    """
    und, deg, o = _oriented_edges(edges, src, dst)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.a") == F.col("e2.a"))
        & (
            F.struct(F.col("e1.db").alias("kd"), F.col("e1.b").alias("kn"))
            < F.struct(F.col("e2.db").alias("kd"), F.col("e2.b").alias("kn"))
        ),
    ).select(F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc"))
    closed = wedge.join(
        o.select(F.col("a").alias("wb"), F.col("b").alias("wc")),
        ["wb", "wc"],
        "left_semi",
    )
    tri = closed.agg(F.count("*").cast("bigint").alias("n_triangles"))
    nn = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("d * (d - 1) div 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    ne = und.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        nn.crossJoin(ne)
        .crossJoin(tri)
        .selectExpr(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            "CAST(CASE WHEN n_wedges = 0 THEN 0"
            " ELSE (1000000 * 3 * n_triangles) div n_wedges END AS BIGINT)"
            " AS gcc_ppm",
        )
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous majority-vote label propagation (Raghavan, Albert &
    Kumara 2007) over the undirected graph beneath ``edges`` — the
    near-linear community detector. Labels seed as the node id; each
    round every node adopts the most frequent label among its
    neighbors, ties broken toward the SMALLEST label, so the whole
    run is deterministic (the classic formulation breaks ties
    randomly; a distributed engine wants reproducible communities).

    Returns (node, label) after ``iters`` synchronous rounds. Each
    round is one equi-join of the bidirected edge list with the label
    frame + one hash-agg + one per-node top-1 window — two shuffles,
    both keyed on vertex ids; labels are checkpointed per round so
    round i reads N label rows, not the whole lineage (the
    pagerank_fixed_point discipline). Input direction is ignored;
    self-loops dropped; every emitted node has >= 1 neighbor by
    construction.
    """
    from pyspark.sql.window import Window

    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("u"),
            F.greatest(F.col("src"), F.col("dst")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    bidir = (
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=False)
    )
    lab = bidir.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(iters):
        # lazy: rounds chain as stages inside the final action's job
        # instead of one eager checkpoint job per round; each round
        # still reads the previous round's pinned blocks, not history
        lab = lab.localCheckpoint(eager=False)
        votes = (
            bidir.join(lab.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return lab


def kcore_census(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling census (Seidman 1983; the synchronous
    distributed formulation of Montresor, De Pellegrini & Miorandi
    2011): round 0 is the undirected deduped input graph; each
    subsequent round drops every node whose CURRENT degree is < k and
    keeps only edges with both endpoints surviving. A FIXED round count
    (not until-fixpoint) keeps the computation replayable as a finite
    CTE chain by the SQL oracle — the same determinism contract
    label_propagation uses. Returns one row per round:
    (round, n_nodes, n_edges).

    Scale: each round is one degree hash-agg plus two vertex-keyed
    semi-joins — linear in surviving edges; the survivor frame is
    checkpointed between rounds so lineage stays flat (graph_pagerank's
    pattern). Peeling converges monotonically, so at 100 TB rounds is
    the dial: diameter-many rounds give the exact core, few rounds give
    the upper-bound census (each round only removes).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out = None
    cur = und
    for r in range(rounds + 1):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        census = deg.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("bigint").alias("n_edges"),
        )
        out = census if out is None else out.unionByName(census)
        if r == rounds:
            break
        keep = deg.filter(F.col("d") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return out


def local_clustering_census(
    edges: DataFrame,
    buckets: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient census (Watts & Strogatz 1998):
    for every vertex with degree >= 2, c_v = 2*T_v / (d_v*(d_v-1))
    where T_v is the number of triangles through v, bucketed into
    ``buckets``+1 integer cells — cc_bucket = (2*buckets*T_v) div
    (d_v*(d_v-1)), so 0 <= cc_bucket <= buckets with the top cell
    holding only perfect cliques (2T = d(d-1)). Integer arithmetic
    end-to-end: no float crosses an engine boundary or a bucket edge.
    Output: (cc_bucket, n_vertices, sum_triangles, sum_wedges), all
    BIGINT; degree-1 vertices have no wedge and are excluded (the
    Watts-Strogatz convention).

    Triangle enumeration reuses triangle_stats' degree-ordered edge
    orientation (Schank & Wagner 2005; Suri & Vassilvitskii WWW 2011)
    but RETAINS the wedge apex, so each closed wedge contributes its
    three vertices to one exploded count: out-degree under (degree, id)
    order is O(sqrt(m)), bounding wedge generation around hubs, and the
    per-vertex census costs one extra explode + hash-agg over the
    triangle list — linear in triangles, never in pairs.
    """
    und, deg, o = _oriented_edges(edges, src, dst)
    # deg is read twice here (filter + census) — pin it like o/und
    deg = deg.localCheckpoint(eager=False)
    e1, e2 = o.alias("e1"), o.alias("e2")
    # the apex rides the wedge (unlike triangle_stats, which only needs
    # the closing count) so the semi-joined survivors are full triangles
    wedge = e1.join(
        e2,
        (F.col("e1.a") == F.col("e2.a"))
        & (
            F.struct(F.col("e1.db").alias("kd"), F.col("e1.b").alias("kn"))
            < F.struct(F.col("e2.db").alias("kd"), F.col("e2.b").alias("kn"))
        ),
    ).select(
        F.col("e1.a").alias("apex"),
        F.col("e1.b").alias("wb"),
        F.col("e2.b").alias("wc"),
    )
    closed = wedge.join(
        o.select(F.col("a").alias("wb"), F.col("b").alias("wc")),
        ["wb", "wc"],
        "left_semi",
    )
    tv = (
        closed.select(
            F.explode(F.array("apex", "wb", "wc")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    j = (
        deg.filter(F.col("d") >= 2)
        .join(tv, "node", "left")
        .select("node", "d", F.coalesce("t", F.lit(0)).alias("t"))
    )
    return (
        j.groupBy(
            F.expr(f"CAST(({2 * buckets} * t) div (d * (d - 1)) AS BIGINT)").alias(
                "cc_bucket"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_vertices"),
            F.sum("t").cast("bigint").alias("sum_triangles"),
            F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("sum_wedges"),
        )
    )
