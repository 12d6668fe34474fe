"""Unit tests for ops/intervals.py (sweep-line concurrency, bucketed
point-in-interval join), ops/dq.py (constraint suite), and
ops.graph.triangle_stats — each checked against a brute-force Python
model on randomized inputs plus hand-built known cases."""

import random

import pytest
from pyspark.sql import functions as F

from aardappel_spark.ops.dq import RefCheck, RowCheck, UniqueCheck, dq_check
from aardappel_spark.ops.graph import triangle_stats
from aardappel_spark.ops.intervals import (
    interval_concurrency,
    point_in_interval_join,
)


# ---------------------------------------------------------------- intervals
def test_interval_concurrency_matches_naive(spark):
    rng = random.Random(7)
    ivs = []
    for _ in range(200):
        s = rng.randrange(0, 1000)
        ivs.append((s, s + rng.randrange(0, 300)))
    df = spark.createDataFrame(ivs, "s long, e long")
    got = {
        r.boundary: r.active
        for r in interval_concurrency(df, "s", "e", 50).collect()
    }
    # brute force: closed intervals, boundary t active iff s <= t <= e
    k0 = min(s for s, _ in ivs) // 50
    k1 = -(-max(e for _, e in ivs) // 50)
    want = {
        k * 50: sum(1 for s, e in ivs if s <= k * 50 <= e)
        for k in range(k0, k1 + 1)
    }
    assert got == want


def test_interval_concurrency_aligned_edges(spark):
    # starts/ends exactly on boundaries: closed-interval semantics
    df = spark.createDataFrame([(100, 200), (200, 300)], "s long, e long")
    got = {
        r.boundary: r.active
        for r in interval_concurrency(df, "s", "e", 100).collect()
    }
    assert got == {100: 1, 200: 2, 300: 1}


def test_point_in_interval_join_matches_naive(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(3), i, rng.randrange(0, 500)) for i in range(150)]
    ivs = []
    for j in range(60):
        s = rng.randrange(0, 500)
        ivs.append((rng.randrange(3), j, s, s + rng.randrange(0, 120)))
    p = spark.createDataFrame(pts, "k long, pid long, t long")
    v = spark.createDataFrame(ivs, "k long, iid long, s long, e long")
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(p, v, ["k"], "t", "s", "e", 40).collect()
    }
    want = {
        (pid, iid)
        for (pk, pid, t) in pts
        for (ik, iid, s, e) in ivs
        if pk == ik and s <= t < e
    }
    assert got == want
    # each matching pair produced exactly once (points live in one cell)
    n = point_in_interval_join(p, v, ["k"], "t", "s", "e", 40).count()
    assert n == len(want)


def test_point_in_interval_empty_interval_matches_nothing(spark):
    p = spark.createDataFrame([(1, 1, 10)], "k long, pid long, t long")
    v = spark.createDataFrame([(1, 1, 10, 10)], "k long, iid long, s long, e long")
    assert point_in_interval_join(p, v, ["k"], "t", "s", "e", 5).count() == 0


def test_point_in_interval_rejects_column_collision(spark):
    p = spark.createDataFrame([(1, 10)], "k long, t long")
    v = spark.createDataFrame([(1, 10, 20)], "k long, t long, e long")
    with pytest.raises(ValueError):
        point_in_interval_join(p, v, ["k"], "t", "t", "e", 5)


# ----------------------------------------------------------------------- dq
def test_dq_row_checks_counts_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (-3, "b"), (None, "a")], "x int, s string"
    )
    rep = {
        r.constraint: (r.total, r.violations, r.ok)
        for r in dq_check(
            df,
            "t",
            [
                RowCheck("x_pos", "x > 0"),  # null x counts as violation
                RowCheck("s_not_null", "s IS NOT NULL"),
                RowCheck("s_domain", "s IN ('a', 'b')"),
            ],
        ).collect()
    }
    assert rep["x_pos"] == (4, 2, 0)
    assert rep["s_not_null"] == (4, 1, 0)
    assert rep["s_domain"] == (4, 1, 0)


def test_dq_row_checks_fused_into_one_scan(spark, tmp_path):
    spark.createDataFrame([(i,) for i in range(10)], "x int").write.parquet(
        f"{tmp_path}/t"
    )
    df = spark.read.parquet(f"{tmp_path}/t")
    rep = dq_check(
        df, "t", [RowCheck(f"c{i}", f"x <> {i}") for i in range(5)]
    )
    # the five predicates share one fused aggregation pass, run at
    # checkpoint time — the report plan reads the checkpointed 1-row
    # frame, never the parquet again
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_dq_unique_and_ref_checks(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 13)], "id int, ref int"
    )
    dim = spark.createDataFrame([(10,), (12,)], "rid int")
    rep = {
        r.constraint: (r.total, r.violations, r.ok)
        for r in dq_check(
            df,
            "t",
            [
                UniqueCheck("id_unique", ("id",)),
                RefCheck("ref_ri", ("ref",), ref=dim, ref_cols=("rid",)),
            ],
        ).collect()
    }
    assert rep["id_unique"] == (4, 1, 0)  # one redundant id row
    assert rep["ref_ri"] == (4, 2, 0)  # 11, 13 unmatched


def test_dq_ref_check_broadcasts_dimension(spark):
    df = spark.createDataFrame([(1,)], "ref int")
    dim = spark.createDataFrame([(1,)], "rid int")
    rep = dq_check(
        df, "t", [RefCheck("ri", ("ref",), ref=dim, ref_cols=("rid",))]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dq_empty_constraint_list_raises(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        dq_check(df, "t", [])


def test_dq_empty_input_all_pass(spark):
    df = spark.createDataFrame([], "x int")
    rep = {
        r.constraint: (r.total, r.violations, r.ok)
        for r in dq_check(
            df, "t", [RowCheck("x_pos", "x > 0"), UniqueCheck("u", ("x",))]
        ).collect()
    }
    assert rep["x_pos"] == (0, 0, 1)
    assert rep["u"] == (0, 0, 1)


# ------------------------------------------------------------------- graph
def _tri_row(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_stats(df).collect()[0]


def test_triangle_stats_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri_row(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.gcc_ppm == 1_000_000


def test_triangle_stats_path_graph_no_triangles(spark):
    r = _tri_row(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.n_triangles, r.n_wedges) == (0, 2)
    assert r.gcc_ppm == 0


def test_triangle_stats_dedups_reversed_and_self_edges(spark):
    # both directions + duplicates + self loops: same census as K3
    e = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (1, 1)]
    r = _tri_row(spark, e)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_triangle_stats_random_vs_python(spark):
    rng = random.Random(5)
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(30), rng.randrange(30)) for _ in range(160)
        )
        if a != b
    }
    r = _tri_row(spark, sorted(edges))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # count each triangle once: vertices sorted
    tri = len(
        {
            tuple(sorted((a, b, c)))
            for a, b in edges
            for c in adj[a] & adj[b]
        }
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    assert r.n_triangles == tri
    assert r.n_wedges == wedges
    assert r.n_edges == len(edges)


def test_label_propagation_two_cliques(spark):
    from aardappel_spark.ops.graph import label_propagation

    tri = lambda base: [
        (base + a, base + b) for a in range(3) for b in range(3) if a < b
    ]
    df = spark.createDataFrame(tri(0) + tri(3), "src long, dst long")
    lab = {r.node: r.label for r in label_propagation(df, iters=3).collect()}
    assert set(lab) == set(range(6))
    assert {lab[0], lab[1], lab[2]} == {0}
    assert {lab[3], lab[4], lab[5]} == {3}


def test_label_propagation_matches_python_model(spark):
    from collections import Counter, defaultdict

    from aardappel_spark.ops.graph import label_propagation

    rng = random.Random(13)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(25), rng.randrange(25)) for _ in range(80))
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, iters=3).collect()}

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lab = {n: n for n in adj}
    for _ in range(3):
        lab = {
            n: min(
                Counter(lab[m] for m in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    assert got == lab


def test_interval_concurrency_rejects_negative_times(spark):
    """Pre-1970 interval times would break the truncating-div
    ceil/floor identities and silently return wrong counts — the
    operator must refuse loudly instead (r7 ADVICE)."""
    df = spark.createDataFrame([(-100, 200), (0, 300)], "s long, e long")
    with pytest.raises(ValueError, match="non-negative"):
        interval_concurrency(df, "s", "e", 100)
    # negative end alone must also refuse
    df2 = spark.createDataFrame([(10, -5)], "s long, e long")
    with pytest.raises(ValueError, match="non-negative"):
        interval_concurrency(df2, "s", "e", 100)


def test_interval_concurrency_empty_input(spark):
    df = spark.createDataFrame([], "s long, e long")
    out = interval_concurrency(df, "s", "e", 100)
    assert out.columns == ["boundary", "active"]
    assert out.count() == 0
