"""kNN-graph consumers: PageRank, triangles, communities, assortativity."""


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





def q_graph_pagerank(spark, sf_dir):
    """PageRank over the kNN similarity graph (d = 0.85, 3 power
    iterations) — graph centrality IN the engine, the shape that finds
    hub documents/embeddings worth auditing. Each iteration is one
    edges-join-ranks + groupBy(dst) pass (data-parallel, shuffle keyed
    on the graph, never a driver adjacency); the dangling mass is a
    1-row aggregate collected like quality_lr_train's gradient. Ranks
    live in FIXED-POINT BIGINT units of 1e-15: integer sums are exact
    under any shuffle order (a float formulation flipped the 9th
    decimal at sf0.1), and the oracle replays every iteration as CTEs
    over the SAME banded-LSH kNN edge oracle in the same integer
    arithmetic."""
    from ..ops.graph import pagerank_fixed_point

    edges = (
        _knn_edges_cached(spark, sf_dir)
        .select(F.col("vec_id").alias("src"), F.col("neighbor").alias("dst"))
        .localCheckpoint(eager=False)
    )
    nodes = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("vec_id", F.lit(0.0).alias("pagerank")).limit(0)
    # FIXED-POINT ranks: BIGINT units of 1e-15 so every sum is exact and
    # order-independent — float sums over different shuffle orders land
    # within an ulp of a round() boundary and flip the 9th decimal (seen
    # at sf0.1); integer arithmetic removes the hazard entirely. The
    # iteration kernel is ops.graph.pagerank_fixed_point, shared with
    # the scale probe's graph_pagerank_dialed row (same kernel on the
    # occupancy-constant-banded graph).
    r = pagerank_fixed_point(nodes, edges, n_nodes, iters=3, d_pct=85)
    return r.select(
        "vec_id",
        (F.col("r").cast("double") / F.lit(1.0e15)).alias("pagerank"),
    )
QUERIES["graph_pagerank"] = q_graph_pagerank


ORACLES["graph_pagerank"] = _pagerank_oracle_sql()


def q_graph_triangles(spark, sf_dir):
    """Exact triangle census of the kNN similarity graph — the local-
    clustering signal next to graph_pagerank and the dedup components:
    (n_nodes, n_edges, n_wedges, n_triangles, gcc_ppm), one BIGINT
    row. Edges are the SAME shared banded kNN graph emb_knn_graph
    gates (so candidate generation stays an equi-join on band buckets
    and inherits the band-bits scale dial); the census itself is
    degree-ordered orientation (Schank & Wagner 2005 / Suri &
    Vassilvitskii WWW 2011, see ops.graph.triangle_stats): wedges only
    among out-neighbors under (degree, id) order — out-degree
    O(sqrt(m)) around any hub — and a LEFT SEMI closing-edge join, so
    each triangle counts exactly once and nothing explodes
    quadratically. The global clustering coefficient crosses the hash
    as integer ppm."""
    from ..ops.graph import triangle_stats

    knn = _knn_edges_cached(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
    )
    return triangle_stats(knn)


def q_graph_communities(spark, sf_dir):
    """Community structure of the kNN similarity graph via synchronous
    majority-vote label propagation (Raghavan et al. 2007; see
    ops.graph.label_propagation — deterministic min-label tie-break
    instead of the paper's random one), reported as the community-size
    histogram (community_size, n_communities). Three synchronous
    rounds over the SAME shared banded kNN edges the rest of the graph
    family consumes; each round is two vertex-keyed shuffles with the
    label frame checkpointed between rounds, so the oracle can replay
    every round as CTEs — integer counts and ids only, nothing
    floats. Completes the graph family: PageRank (influence),
    connected components (reachability), triangles (local density),
    LPA (mesoscale communities)."""
    from ..ops.graph import label_propagation

    knn = _knn_edges_cached(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
    )
    lab = label_propagation(knn, iters=3)
    sizes = lab.groupBy("label").agg(F.count("*").alias("sz"))
    return sizes.groupBy("sz").agg(
        F.count("*").cast("bigint").alias("n_communities")
    ).select(F.col("sz").cast("bigint").alias("community_size"), "n_communities")


QUERIES["graph_communities"] = q_graph_communities
ORACLES["graph_communities"] = _communities_oracle_sql()

QUERIES["graph_triangles"] = q_graph_triangles

# composed verbatim from the gated kNN-graph oracle (the same pattern
# emb_knn_classify uses); the oracle counts triangles by the simple
# a<b<c triple join — orientation is a Spark-side efficiency choice,
# the census is identical
ORACLES["graph_triangles"] = f"""
WITH knn AS MATERIALIZED ({ORACLES["emb_knn_graph"].strip()}),
und AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, neighbor) AS u,
                  greatest(vec_id, neighbor) AS v
  FROM knn WHERE vec_id <> neighbor
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(sum(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM deg
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
SELECT w.n_nodes, m.n_edges, w.n_wedges, t.n_triangles,
       CAST(CASE WHEN w.n_wedges = 0 THEN 0
                 ELSE (1000000 * 3 * t.n_triangles) // w.n_wedges END
         AS BIGINT) AS gcc_ppm
FROM w, t, m
"""


def q_graph_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient census of the kNN similarity graph
    (Watts & Strogatz 1998) — the per-vertex companion to
    graph_triangles' single global census: every degree>=2 vertex's
    c_v = 2*T_v/(d_v*(d_v-1)) bucketed into eleven integer cells
    (cc_bucket = (20*T_v) div (d_v*(d_v-1))), reported as
    (cc_bucket, n_vertices, sum_triangles, sum_wedges). The bucket edge
    is integer division on exact integer counts, so no float ever
    touches the hash. Triangle enumeration is the same degree-ordered
    orientation as triangle_stats (wedges only among out-neighbors,
    O(sqrt(m)) out-degree around hubs) with the wedge apex retained —
    see ops.graph.local_clustering_census; edges are the SAME shared
    banded kNN graph every other graph consumer reads, so candidate
    generation stays an equi-join on band buckets and inherits the
    occupancy-constant band-bits dial."""
    from ..ops.graph import local_clustering_census

    knn = _knn_edges_cached(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
    )
    return local_clustering_census(knn, buckets=10)


QUERIES["graph_clustering_coeff"] = q_graph_clustering_coeff

# composed verbatim from the gated kNN-graph oracle; the oracle
# enumerates triangles by the simple a<b<c triple join and explodes the
# three vertices — orientation is a Spark-side efficiency choice, the
# per-vertex census is identical
ORACLES["graph_clustering_coeff"] = f"""
WITH knn AS MATERIALIZED ({ORACLES["emb_knn_graph"].strip()}),
und AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, neighbor) AS u,
                  greatest(vec_id, neighbor) AS v
  FROM knn WHERE vec_id <> neighbor
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
tv AS (
  SELECT node, count(*) AS t
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri)
  GROUP BY node
),
j AS (
  SELECT deg.node, deg.d, COALESCE(tv.t, 0) AS t
  FROM deg LEFT JOIN tv USING (node)
  WHERE deg.d >= 2
)
SELECT CAST((20 * t) // (d * (d - 1)) AS BIGINT) AS cc_bucket,
       CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(t) AS BIGINT) AS sum_triangles,
       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS sum_wedges
FROM j GROUP BY cc_bucket
"""


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity of the undirected kNN similarity graph
    (Newman 2002): the Pearson correlation of endpoint degrees over all
    directed edge stubs — negative r means hubs attach to low-degree
    nodes (the typical kNN-graph shape), positive means a rich club.
    Edges are the same dedup'd least/greatest orientation
    graph_triangles uses on the shared banded graph. The sufficient
    statistics are EXACT integers (per symmetric stub pair: M = 2m,
    Sx = sum(du+dv), Sxy = 2*sum(du*dv), Sx2 = sum(du^2+dv^2)) from two
    degree joins; r is then evaluated mean-first in doubles — never
    M*Sxy - Sx^2 in integer space, whose Sx^2 overflows BIGINT at
    ~1e10 stubs where Spark would wrap and DuckDB would raise. Both
    engines fold the identical expression over identical integers, so
    the rounded double is engine-exact."""
    knn = _knn_edges_cached(spark, sf_dir)
    # barriers: the edge list feeds the degree union twice plus the
    # stats join, and degrees join the edges twice — both frames are
    # O(edges)/O(nodes) small; without them the banded top-k window
    # subtree re-executes per consumer
    und = (
        knn.filter(F.col("vec_id") != F.col("neighbor"))
        .select(
            F.least("vec_id", "neighbor").alias("u"),
            F.greatest("vec_id", "neighbor").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=False)
    )
    ed = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("da")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("db")), "v")
    )
    st = ed.agg(
        F.count("*").cast("bigint").alias("n_edges"),
        F.coalesce(F.sum(F.col("da") + F.col("db")), F.lit(0))
        .cast("bigint")
        .alias("sum_d"),
        F.coalesce(F.sum(2 * F.col("da") * F.col("db")), F.lit(0))
        .cast("bigint")
        .alias("sum_dxy"),
        F.coalesce(
            F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")), F.lit(0)
        )
        .cast("bigint")
        .alias("sum_d2"),
    )
    return st.select(
        "n_edges",
        "sum_d",
        "sum_dxy",
        "sum_d2",
        F.expr(
            "CASE WHEN n_edges = 0 THEN 0.0 ELSE CASE WHEN"
            " (sum_d2 / (2 * n_edges)"
            "  - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges))) <= 0"
            " THEN 0.0 ELSE round("
            " (sum_dxy / (2 * n_edges)"
            "  - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges)))"
            " / (sum_d2 / (2 * n_edges)"
            "  - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges))), 6)"
            " END END"
        ).alias("assortativity"),
    )


QUERIES["graph_assortativity"] = q_graph_assortativity

ORACLES["graph_assortativity"] = f"""
WITH knn AS MATERIALIZED ({ORACLES["emb_knn_graph"].strip()}),
und AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, neighbor) AS u,
                  greatest(vec_id, neighbor) AS v
  FROM knn WHERE vec_id <> neighbor
),
deg AS MATERIALIZED (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
),
ed AS (
  SELECT du.d AS da, dv.d AS db
  FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(COALESCE(sum(da + db), 0) AS BIGINT) AS sum_d,
         CAST(COALESCE(sum(2 * da * db), 0) AS BIGINT) AS sum_dxy,
         CAST(COALESCE(sum(da * da + db * db), 0) AS BIGINT) AS sum_d2
  FROM ed
)
SELECT n_edges, sum_d, sum_dxy, sum_d2,
       CASE WHEN n_edges = 0 THEN 0.0 ELSE CASE WHEN
         (sum_d2 / (2 * n_edges)
          - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges))) <= 0
       THEN 0.0 ELSE round(
         (sum_dxy / (2 * n_edges)
          - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges)))
         / (sum_d2 / (2 * n_edges)
          - (sum_d / (2 * n_edges)) * (sum_d / (2 * n_edges))), 6)
       END END AS assortativity
FROM st
"""


def q_graph_degree_hist(spark, sf_dir):
    """Degree distribution of the undirected kNN similarity graph —
    the first plot anyone makes of a graph, completing the family
    (hubness covers the DIRECTED in-degree; this is the undirected
    census the communities/assortativity math runs on). Same shared
    banded kNN edges, same least/greatest dedup as graph_triangles;
    then two integer hash-aggs: degree per node, nodes per degree.
    Linear in edges — and covered by the decomposed dialed probe like
    every other consumer of the shared graph."""
    knn = _knn_edges_cached(spark, sf_dir)
    # barrier: the degree union consumes the edge list twice; without
    # it the banded top-k window subtree re-executes per leg (the same
    # checkpoint graph_assortativity carries)
    und = (
        knn.filter(F.col("vec_id") != F.col("neighbor"))
        .select(
            F.least("vec_id", "neighbor").alias("u"),
            F.greatest("vec_id", "neighbor").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .select(F.col("degree").cast("bigint").alias("degree"), "n_nodes")
    )


QUERIES["graph_degree_hist"] = q_graph_degree_hist

# composed verbatim from the gated kNN-graph oracle, same und/deg CTEs
# as graph_triangles/graph_assortativity
ORACLES["graph_degree_hist"] = f"""
WITH knn AS MATERIALIZED ({ORACLES["emb_knn_graph"].strip()}),
und AS (
  SELECT DISTINCT least(vec_id, neighbor) AS u,
                  greatest(vec_id, neighbor) AS v
  FROM knn WHERE vec_id <> neighbor
),
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node
)
SELECT CAST(degree AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


def q_graph_kcore(spark, sf_dir):
    """Bounded k-core decomposition census (k=6, 3 peeling rounds) of
    the kNN similarity graph — the density-stratification view next to
    triangles (local density) and LPA (mesoscale): which part of the
    graph survives repeated pruning of weakly-connected nodes. Rides
    the SAME shared banded kNN edges (equi-join candidate generation,
    band-bits scale dial); each round is one degree hash-agg + two
    vertex-keyed semi-joins, linear in surviving edges and shrinking
    monotonically (ops.graph.kcore_census). Fixed round count keeps the
    oracle a finite CTE chain — the label_propagation determinism
    contract. Output: (round, n_nodes, n_edges) for rounds 0..3."""
    from ..ops.graph import kcore_census

    knn = _knn_edges_cached(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
    )
    return kcore_census(knn, k=6, rounds=3)


QUERIES["graph_kcore"] = q_graph_kcore


def _kcore_oracle_sql(k: int = 6, rounds: int = 3) -> str:
    """CTE chain replaying kcore_census round by round (same pattern as
    the LPA/PageRank oracles: one CTE block per synchronous round)."""
    parts = [
        f"WITH knn AS MATERIALIZED ({ORACLES['emb_knn_graph'].strip()}),",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT least(vec_id, neighbor) AS u,
                  greatest(vec_id, neighbor) AS v
  FROM knn WHERE vec_id <> neighbor
),""",
    ]
    for r in range(rounds + 1):
        parts.append(f"""d{r} AS MATERIALIZED (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM e{r} UNION ALL SELECT v AS node FROM e{r})
  GROUP BY node
),
c{r} AS (
  SELECT CAST({r} AS BIGINT) AS round,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(sum(d), 0) // 2 AS BIGINT) AS n_edges
  FROM d{r}
),""")
        if r < rounds:
            parts.append(f"""k{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r} e
  JOIN k{r} a ON e.u = a.node
  JOIN k{r} b ON e.v = b.node
),""")
    sel = " UNION ALL ".join(f"SELECT * FROM c{r}" for r in range(rounds + 1))
    return "\n".join(parts).rstrip(",\n") + ",\n" + f"_last AS (SELECT 1)\n{sel}"


ORACLES["graph_kcore"] = _kcore_oracle_sql(6, 3)


# ---------------------------------------------------------------------------
# Decomposed consumer kernels for the scale probe (r8 verdict #3).
#
# One entry per gated consumer of the shared banded kNN graph. Each
# callable takes (spark, emb, edges) where ``edges`` is the PRE-BUILT
# directed edge list (src, dst) and runs ONLY the consumer stage — the
# part of the gated query after candidate generation. tools/scale_probe.py
# ENUMERATES this dict to emit a ``<name>_dialed`` leg on the
# occupancy-constant graph (band bits ∝ log N), so every future consumer
# gets its measured scale leg by registering here instead of editing a
# hand-kept probe list; tests assert every registry query built on
# q_emb_knn_graph has an entry.
# ---------------------------------------------------------------------------

GRAPH_CONSUMERS: dict[str, Callable] = {}


def _und_deg(edges):
    """Shared undirected-edge + degree frames (the least/greatest dedup
    every undirected consumer starts from)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=False)
    )
    return und, deg


def _consumer_pagerank(spark, emb, edges):
    from ..ops.graph import pagerank_fixed_point

    nodes = emb.select("vec_id")
    return pagerank_fixed_point(nodes, edges, nodes.count(), iters=3, d_pct=85)


def _consumer_triangles(spark, emb, edges):
    from ..ops.graph import triangle_stats

    return triangle_stats(edges)


def _consumer_communities(spark, emb, edges):
    from ..ops.graph import label_propagation

    lab = label_propagation(edges, iters=3)
    sizes = lab.groupBy("label").agg(F.count("*").alias("sz"))
    return sizes.groupBy("sz").agg(F.count("*").alias("n_communities"))


def _consumer_assortativity(spark, emb, edges):
    und, deg = _und_deg(edges)
    ed = (
        und.join(deg.select(F.col("node").alias("u"), F.col("d").alias("da")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("db")), "v")
    )
    return ed.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("da") + F.col("db")).alias("sum_d"),
        F.sum(2 * F.col("da") * F.col("db")).alias("sum_dxy"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")).alias("sum_d2"),
    )


def _consumer_degree_hist(spark, emb, edges):
    _und, deg = _und_deg(edges)
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count("*").alias("n_nodes")
    )


def _consumer_kcore(spark, emb, edges):
    from ..ops.graph import kcore_census

    return kcore_census(edges, k=6, rounds=3)


def _consumer_clustering_coeff(spark, emb, edges):
    from ..ops.graph import local_clustering_census

    return local_clustering_census(edges, buckets=10)


def _consumer_hubness(spark, emb, edges):
    ind = (
        edges.groupBy(F.col("dst"))
        .agg(F.count("*").alias("in_deg"))
        .localCheckpoint(eager=False)
    )
    hist = ind.groupBy("in_deg").agg(F.count("*").alias("n_vecs"))
    nz = ind.agg(F.count("*").alias("nz"))
    zero = (
        emb.agg(F.count("*").alias("t"))
        .crossJoin(nz)
        .select(
            F.lit(0).alias("in_deg"),
            (F.col("t") - F.col("nz")).alias("n_vecs"),
        )
        .filter(F.col("n_vecs") > 0)
    )
    return hist.unionByName(zero)


def _consumer_knn_classify(spark, emb, edges):
    from pyspark.sql.window import Window

    lab = emb.select("vec_id", "label")
    seeds = lab.filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("dst"), F.col("label").alias("seed_label")
    )
    votes = (
        edges.filter(F.col("src") % 4 != 0)
        .join(seeds, "dst")
        .groupBy("src", "seed_label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("n_votes"), F.asc("seed_label"))
    return votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


GRAPH_CONSUMERS["graph_pagerank"] = _consumer_pagerank
GRAPH_CONSUMERS["graph_triangles"] = _consumer_triangles
GRAPH_CONSUMERS["graph_communities"] = _consumer_communities
GRAPH_CONSUMERS["graph_assortativity"] = _consumer_assortativity
GRAPH_CONSUMERS["graph_degree_hist"] = _consumer_degree_hist
GRAPH_CONSUMERS["graph_kcore"] = _consumer_kcore
GRAPH_CONSUMERS["graph_clustering_coeff"] = _consumer_clustering_coeff
GRAPH_CONSUMERS["emb_hubness"] = _consumer_hubness
GRAPH_CONSUMERS["emb_knn_classify"] = _consumer_knn_classify
