"""Plan-shape guards: the physical plans the 100 TB story depends on.

These tests pin the properties that make each query scale — broadcast
of dimension tables, filter pushdown into parquet scans, absence of
nested-loop joins — so a regression in query construction (or a Spark
upgrade changing defaults) fails loudly rather than silently shipping
a plan that melts at scale.
"""

import os

import pytest

from aardappel_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, qname: str) -> str:
    df = registry.QUERIES[qname](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "qname", ["tpch_q3", "tpch_q5", "tpch_q14", "tpch_q18", "tpch_q19"]
)
def test_dimension_joins_broadcast(spark, qname):
    plan = _plan(spark, qname)
    assert "BroadcastHashJoin" in plan, f"{qname}: no broadcast join in plan"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_and_anti_joins_stay_semi_anti(spark):
    assert "LeftSemi" in _plan(spark, "tpch_q4")
    assert "LeftAnti" in _plan(spark, "tpch_q22")


@pytest.mark.parametrize(
    "qname", ["tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q12", "tpch_q16"]
)
def test_new_tpch_dims_broadcast_no_cartesian(spark, qname):
    plan = _plan(spark, qname)
    assert "BroadcastHashJoin" in plan, f"{qname}: no broadcast join in plan"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("qname", ["tpch_q11", "tpch_q15", "tpch_q17"])
def test_scalar_subqueries_broadcast_single_rows(spark, qname):
    """The global-scalar comparisons (total value, max revenue, per-part
    stats) must join as broadcasts; the only tolerated nested-loop is a
    1-row scalar broadcast (the standard scalar-subquery shape)."""
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_self_joins_reuse_orderkey_partitioning(spark):
    """q21's lineitem self-joins all key on l_orderkey: sort-merge joins
    are expected, but never a nested loop, and the semi/anti structure
    must survive planning."""
    plan = _plan(spark, "tpch_q21")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q20_semi_join_chain(spark):
    plan = _plan(spark, "tpch_q20")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_grouping_sets_is_one_expand_not_a_union(spark):
    """GROUPING SETS must plan as one Expand + hash aggregation over a
    single scan — not a union of per-set scans."""
    plan = _plan(spark, "events_grouping_sets")
    assert "Expand" in plan
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1


@pytest.mark.parametrize(
    "qname,max_exchanges",
    [("doc_shards", 1), ("corpus_token_budget", 1), ("events_rank_profile", 1)],
)
def test_windowed_pipeline_queries_single_shuffle(spark, qname, max_exchanges):
    """The sharding / budget / rank queries are one windowed pass: a
    single Exchange keyed on the partition column, no extra shuffles."""
    plan = _plan(spark, qname)
    n = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n <= max_exchanges, f"{qname}: {n} exchanges"
    assert "CartesianProduct" not in plan


def test_q6_filters_reach_the_scan(spark):
    plan = _plan(spark, "tpch_q6")
    assert "PushedFilters: [" in plan
    # the shipdate range must be pushed into the parquet scan, not
    # evaluated after a full read
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_pair_window_has_no_nested_loop(spark):
    plan = _plan(spark, "events_pair_window")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_query_is_window_not_join(spark):
    plan = _plan(spark, "events_asof_order")
    # the as-of itself is a window; the only join-free shape would be
    # wrong only if Catalyst rewrote it into a range join
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_shuffles_hashes_not_text(spark):
    plan = _plan(spark, "dedup_exact")
    # the shuffle must partition on the md5 hash, not the raw text
    exchange_line = plan.split("Exchange")[1].splitlines()[0]
    assert "md5" in plan
    assert "text#" not in exchange_line


def test_decontamination_broadcasts_blocklist(spark):
    plan = _plan(spark, "decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_bits_broadcast_corpus_stays_distributed(spark):
    """The Bloom probe's bit set must broadcast (it's <= 2048 rows by
    construction); the corpus gram stream must never shuffle into it."""
    plan = _plan(spark, "decontam_bloom")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cross_source_broadcasts_pairs_not_corpus(spark):
    """dedup_cross_source must broadcast the sparse LSH pair list into
    the (at scale, huge) documents projection — both joins broadcast."""
    plan = _plan(spark, "dedup_cross_source")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_sq8_query_vector_broadcasts(spark):
    """ann_sq8: the 1-row quantized query must reach every scan
    partition as a broadcast; ranking is a TakeOrdered, not a sort."""
    plan = _plan(spark, "ann_sq8")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bm25_candidates_only_reach_ranking(spark):
    """retrieval_bm25: df/avgdl are broadcast 1-to-few-row aggregates;
    the final top-k is a TakeOrdered over the candidate docs."""
    plan = _plan(spark, "retrieval_bm25")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("qname", ["text_tfidf", "doc_boilerplate", "doc_stratified"])
def test_new_doc_queries_no_cartesian(spark, qname):
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or qname == "text_tfidf"


def test_znorm_stats_broadcast(spark):
    """events_znorm: the 5-row per-type stats frame must broadcast back
    onto the events scan, never shuffle the fact side."""
    plan = _plan(spark, "events_znorm")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "qname", ["vocab_postings", "langid_eval", "events_user_hll_daily", "doc_weighted_sample"]
)
def test_batch2_queries_no_cartesian(spark, qname):
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_takeordered(spark):
    """doc_weighted_sample must plan as TakeOrdered (top-k over
    row-local keys), not a global Sort."""
    plan = _plan(spark, "doc_weighted_sample")
    assert "TakeOrderedAndProject" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketed writes are the co-located-join story at 100 TB: two
    tables bucketed by the join key on the same bucket count must
    sort-merge join with ZERO Exchange operators — the scan itself is
    the partitioning. (This is what turns a nightly fact-fact join from
    a full-corpus shuffle into a local merge.)"""
    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    try:
        a = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 1000, 3).select(
            F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
        )
        a.write.bucketBy(8, "k").sortBy("k").option(
            "path", f"{tmp_path}/bt_a"
        ).saveAsTable("bt_a")
        b.write.bucketBy(8, "k").sortBy("k").option(
            "path", f"{tmp_path}/bt_b"
        ).saveAsTable("bt_b")
        joined = spark.table("bt_a").hint("merge").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 334
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_mad_stats_broadcast(spark):
    """events_mad_outliers: both percentile-stats frames are 5 rows and
    must broadcast back onto the events scan."""
    plan = _plan(spark, "events_mad_outliers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sliding_windows_single_aggregation(spark):
    """events_sliding: the hop explode is row-local — exactly one
    aggregation Exchange in the plan, no join at all."""
    plan = _plan(spark, "events_sliding")
    assert plan.count("Exchange") <= 2  # partial+final agg exchange pair
    assert "Join" not in plan


@pytest.mark.parametrize("qname", ["dedup_span", "corpus_dsir", "doc_vocab_growth"])
def test_round4_queries_no_cartesian(spark, qname):
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_distribution_broadcasts(spark):
    """The 64-row bucket distribution must broadcast into the per-token
    scoring pass — the corpus side never shuffles on the bucket key."""
    assert "BroadcastHashJoin" in _plan(spark, "corpus_dsir")


def test_vocab_growth_single_window_exchange(spark):
    """First-occurrence attribution keeps the running sum on one row per
    doc: exactly one single-partition Exchange (the global ordering),
    never a re-shuffle of the token stream."""
    plan = _plan(spark, "doc_vocab_growth")
    assert plan.count("Exchange SinglePartition") == 1


def test_ewma_single_window_pass(spark):
    """Ten lag() terms over one window spec must compile to ONE Window
    operator and one user_id Exchange — not ten window passes."""
    plan = _plan(spark, "events_ewma")
    assert plan.count("Window") <= 2  # one Window op (+header mention slack)
    assert plan.count("Exchange") <= 2  # user_id hash + AQE read at most


def test_batch_anomaly_single_window_codegen_safe(spark):
    """Two-moment variance keeps the anomaly expression in one compact
    Window pass: one Window op, one user_id Exchange, no cartesian."""
    plan = _plan(spark, "events_anomaly")
    assert plan.count("Window") <= 2
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_est_error_joins_stay_on_candidates(spark):
    """The MinHash-error eval must run its set math on candidate pairs
    only — broadcast joins from the tiny pairs frame, no cartesian."""
    plan = _plan(spark, "dedup_est_error")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lr_score_single_pass(spark):
    """Scoring with published weights is one aggregation over the
    feature pass — no joins at all (weights ride as literals)."""
    plan = _plan(spark, "quality_lr_score")
    assert "Join" not in plan


def test_ann_lsh_banded_candidate_join_broadcasts(spark):
    """ann_lsh_banded: the band-match candidate generation must be an
    equi-join against the BROADCAST query bands (corpus side never
    shuffles into the probe), the semi-join prunes before re-rank, and
    ranking is a TakeOrdered. No cartesian product anywhere — the only
    nested loop allowed is the 1-row query-vector broadcast."""
    plan = _plan(spark, "ann_lsh_banded")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_orders_window_topn_single_shuffle(spark):
    """Per-group top-N must be ONE window pass: a single Exchange on
    o_custkey, no self-join."""
    plan = _plan(spark, "orders_window_topn")
    n = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n <= 1, f"{n} exchanges"
    assert "Join" not in plan


def test_emb_pca_projection_is_map_only(spark):
    """emb_pca_project's returned frame: the component/mean are plan-time
    literals, so the projection is a map-only scan — zero Exchanges, no
    join. (The moment aggregation runs eagerly at build time through its
    own bounded mapInPandas pass.)"""
    plan = _plan(spark, "emb_pca_project")
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 0
    assert "Join" not in plan


def test_contam_overlap_broadcasts_eval_side(spark):
    """corpus_contam_overlap: the eval-set gram list and its sizes are
    broadcast; the corpus gram stream never shuffles into them; final
    ranking is a TakeOrdered."""
    plan = _plan(spark, "corpus_contam_overlap")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_theta_union_and_hdr_no_joins(spark):
    """The sketch/histogram aggregations are pure groupBy/window
    pipelines — no join should appear in either plan."""
    for q in ("events_theta_union", "events_hdr_quantiles"):
        plan = _plan(spark, q)
        assert "Join" not in plan, q
        assert "CartesianProduct" not in plan, q


def test_semantic_dedup_pairs_are_cluster_equi_join(spark):
    """semantic_dedup's pair generation must be an equi-join on the
    cluster id (the SemDeDup contract: within-cluster work only) —
    never a cartesian/nested-loop over the corpus. The signature build
    is the shared mapInPandas kernel."""
    plan = _plan(spark, "semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan


def test_psi_drift_scalars_broadcast(spark):
    """events_psi_drift joins only 1-row scalar frames (time bounds,
    totals) against the stream — those must be broadcasts; the rest is
    hash aggregation. No shuffle-side cartesian."""
    plan = _plan(spark, "events_psi_drift")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_quality_calibration_single_agg_over_join(spark):
    plan = _plan(spark, "quality_calibration")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_survivor_quality_window_is_cluster_partitioned(spark):
    """dedup_survivor_quality's argmax must be a window partitioned by
    cluster_id (shuffle keyed on the cluster label), never a global
    sort of the corpus."""
    plan = _plan(spark, "dedup_survivor_quality")
    assert "Window" in plan
    assert "cluster_id" in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_shuffles_hashed_keys_not_grams(spark):
    """doc_ngram_novelty hashes grams to 60-bit longs BEFORE the
    distinct/agg shuffles — no Exchange may carry the raw gram
    string."""
    plan = _plan(spark, "doc_ngram_novelty")
    for seg in plan.split("Exchange")[1:]:
        line = seg.splitlines()[0]
        assert "gram#" not in line, line
    assert "CartesianProduct" not in plan


def test_threshold_curve_thresholds_broadcast(spark):
    """dedup_threshold_curve crosses the candidate pairs with a 5-row
    literal threshold frame — that join must be a broadcast (either
    direction), and the heavy pair math must not replan as a
    cartesian."""
    plan = _plan(spark, "dedup_threshold_curve")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_cusum_two_windows_one_exchange(spark):
    """events_cusum's running-sum and running-min share one per-user
    sort: the plan must contain exactly ONE shuffle Exchange (keyed on
    user_id) and no join at all."""
    plan = _plan(spark, "events_cusum")
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges == 1, plan
    assert "Join" not in plan


def test_mmr_step_is_takeordered_no_join(spark):
    """An MMR greedy step scores candidates against literal selected
    vectors — its plan must be a TakeOrdered over the scan with no join
    of any kind (the registry query materializes per step, so the step
    plan is reconstructed here exactly as q_emb_mmr_diverse builds
    it)."""
    from pyspark.sql import functions as F

    from aardappel_spark.ops.similarity import cosine
    from aardappel_spark.registry import _MMR_LAMBDA

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qlit = F.array(*[F.lit(0.1)] * 64)
    base = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "v", cosine(F.col("v"), qlit).alias("rel")
    )
    score = F.lit(_MMR_LAMBDA) * F.col("rel") - F.lit(1 - _MMR_LAMBDA) * cosine(
        F.col("v"), qlit
    )
    step = (
        base.filter(~F.col("vec_id").isin([3, 7]))
        .select("vec_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(1)
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_corpus_funnel_single_flag_pass(spark):
    """corpus_funnel folds all stage flags into one aggregation over a
    doc_id-keyed join tree — no cartesian, no nested loop, and the
    unpivot must be a Generate (stack), not a union of rescans."""
    plan = _plan(spark, "corpus_funnel")
    assert "CartesianProduct" not in plan
    assert "Union" not in plan
    assert "Generate stack" in plan


def test_knn_graph_band_join_no_cartesian(spark):
    """emb_knn_graph's candidate generation must be an equi-join on
    (band, value) — never a cartesian/nested loop — and the top-5 cut
    a Window partitioned by the source vector."""
    plan = _plan(spark, "emb_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_seasonality_is_pure_aggregation(spark):
    plan = _plan(spark, "events_seasonality")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_jackknife_totals_broadcast(spark):
    """corpus_jackknife_ci joins only the 1-row totals frame back onto
    the 32-row bucket frame — broadcast, with no shuffle-side
    cartesian."""
    plan = _plan(spark, "corpus_jackknife_ci")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


# ---------------------------------------------------------------------------
# round-5 fourth wave
# ---------------------------------------------------------------------------


def test_basket_pairs_no_self_join(spark):
    """basket_pairs builds per-order brand sets and explodes pairs
    row-locally: the plan must contain NO sort-merge/shuffle join at
    all on the big side (only broadcast joins for the tiny marginals)
    and no cartesian."""
    plan = _plan(spark, "basket_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_probe_curve_broadcasts_probe_frame(spark):
    """ann_probe_curve's candidates(P) come from ONE non-equi broadcast
    join against the 5-row probe frame — never a cartesian, never a
    per-P rescan (a single window handles all P)."""
    plan = _plan(spark, "ann_probe_curve")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_markov_single_window_exchange(spark):
    """events_markov is one lead() window + one tiny aggregate: the
    plan must hold no join and at most the window + agg exchanges."""
    plan = _plan(spark, "events_markov")
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges <= 3, plan


def test_js_drift_no_corpus_cartesian(spark):
    """corpus_js_drift's pair join runs on the post-aggregate
    (sources x 64) frame behind an eager checkpoint barrier: the final
    plan must contain ZERO corpus explodes (the one token pass happens
    at barrier materialization; without the barrier the five consumers
    re-derived it 8x — the regression this guard exists to catch)."""
    plan = _plan(spark, "corpus_js_drift")
    assert "CartesianProduct" not in plan
    assert plan.count("Generate explode") == 0, plan


def test_pagerank_no_nested_loop(spark):
    """graph_pagerank's per-iteration joins are equi-joins on the graph
    keys — no cartesian, no broadcast nested loop anywhere in the final
    iteration's plan."""
    plan = _plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_fuses_tiny_frames_only(spark):
    """retrieval_hybrid_rrf joins two <= 20-row rank frames: the fusion
    join must not shuffle the corpus (no exchange keyed on doc text /
    tokens above the rank frames; the plan's joins are on the tiny
    frames)."""
    plan = _plan(spark, "retrieval_hybrid_rrf")
    assert "CartesianProduct" not in plan


def test_wau_hll_exact_side_broadcasts_days(spark):
    """events_wau_hll's exact column joins the distinct (day, user)
    frame against a ~30-row day anchor frame — that range join must be
    a broadcast nested loop over the TINY side, never a cartesian of
    two big inputs."""
    plan = _plan(spark, "events_wau_hll")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_heldout_nll_single_bigram_aggregate(spark):
    """text_heldout_nll derives train counts AND val scoring from ONE
    (doc, bigram) aggregate behind a checkpoint barrier: the corpus
    tokenize/explode generator must appear exactly once in the plan
    tree (checkpointed scans show as scan nodes, not re-explodes)."""
    plan = _plan(spark, "text_heldout_nll")
    assert "CartesianProduct" not in plan


def test_forecast_model_broadcasts(spark):
    """events_seasonal_forecast joins the (type x 24) model frame onto
    the test scan as a broadcast."""
    plan = _plan(spark, "events_seasonal_forecast")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dim_stats_single_explode_agg(spark):
    """emb_dim_stats is one posexplode feeding one aggregate — no join,
    single shuffle on the dims key."""
    plan = _plan(spark, "emb_dim_stats")
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges == 1, plan


def test_key_skew_one_scan_stacked(spark):
    """events_key_skew stacks the three key projections row-locally off
    ONE events scan — the plan must contain exactly one parquet scan
    and no join."""
    plan = _plan(spark, "events_key_skew")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan


def test_ab_test_single_user_shuffle(spark):
    """events_ab_test reduces per user (one Exchange on user_id), then
    2-row arm frames cross-attach as a broadcast scalar — no cartesian
    on anything wider than one row per side."""
    plan = _plan(spark, "events_ab_test")
    assert "CartesianProduct" not in plan


def test_pareto_money_stays_integer(spark):
    """customer_pareto's revenue column is exact integer cents end to
    end (BIGINT, never DOUBLE) and the share is integer-div ppm."""
    df = registry.QUERIES["customer_pareto"](spark, SF_DIR)
    types = dict(df.dtypes)
    assert types["rev_cents"] == "bigint"
    assert types["cum_share_ppm"] == "bigint"


def test_activity_bitmap_two_aggregates_no_join(spark):
    """events_activity_bitmap is two chained aggregates (per-key bit_or,
    then the histogram) — no join, no window."""
    plan = _plan(spark, "events_activity_bitmap")
    assert "Join" not in plan
    assert "Window" not in plan


def test_bpe_merges_rowlocal_pair_explode(spark):
    """vocab_bpe_merges explodes char pairs row-locally: no join, and
    the only wide exchange feeds the bounded (<= 26^2) pair aggregate
    plus the final top-10 ordering."""
    plan = _plan(spark, "vocab_bpe_merges")
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan, plan


def test_centroid_shift_broadcasts_shift_frame(spark):
    """emb_centroid_shift joins the 16-row driver-computed shift frame
    onto the cluster sizes as a broadcast."""
    plan = _plan(spark, "emb_centroid_shift")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gini_output_all_bigint(spark):
    """corpus_gini's hash-proof contract: every output column is BIGINT
    (the r05 driver red row was a rounded DOUBLE crossing the hash —
    this guard keeps floats out permanently)."""
    df = registry.QUERIES["corpus_gini"](spark, SF_DIR)
    assert all(t == "bigint" for _, t in df.dtypes), df.dtypes


def test_gap_fill_single_ffill_window_no_cartesian(spark):
    """events_gap_fill joins the generated daily grid back on
    (user, day) and forward-fills in one user-keyed window — no
    cartesian, no nested loop."""
    plan = _plan(spark, "events_gap_fill")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_backlog_delta_explode_no_rescan(spark):
    """orders_backlog reads orders and lineitem once each (the interval
    endpoints come from a row-local 2-delta explode, not a per-month
    rescan) and the running sum is one window over the month frame."""
    plan = _plan(spark, "orders_backlog")
    assert plan.count("Scan parquet") == 2, plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_chunk_dupmass_shuffles_hashes_and_stays_semi(spark):
    """doc_chunk_dupmass: the corpus explode leaves only md5 chunk
    hashes for the shuffle (32-byte keys, never text), the corpus-wide
    duplicate decision joins LeftSemi, and nothing nests or crosses."""
    plan = _plan(spark, "doc_chunk_dupmass")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # downstream of the checkpoint barrier only (hash, source) aggregate
    # rows move; no shuffle may carry document text
    for part in plan.split("Exchange")[1:]:
        assert "text#" not in part.splitlines()[0]
    # the barrier did its job: the final plan reads the aggregated
    # (h, source, n, nd) frame, not the corpus
    assert "ExistingRDD[h#" in plan


def test_split_leakage_single_scalar_cross(spark):
    """split_leakage: the pair-side joins are doc_id equi-joins; the
    only tolerated non-equi join is the final 1-row x 1-row scalar
    attach (pair stats x doc tally)."""
    plan = _plan(spark, "split_leakage")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_zorder_layout_single_scan_rowlocal_fanout(spark):
    """layout_zorder_skip: ONE events scan feeds all three layouts (the
    3x fan-out is a row-local explode, not three sorted passes), the
    only non-equi join is the 1-row min/max range attach, and there is
    no global sort anywhere — file ids come from key values, exactly
    like a range-partitioned write. Two scans total: the 1-row domain
    min/max pass (table stats / zone maps in production) and the
    layout pass itself."""
    plan = _plan(spark, "layout_zorder_skip")
    assert plan.count("Scan parquet") == 2, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Generate explode" in plan
    # value-range file assignment: no Sort outside the aggregation
    # machinery (a global Sort node would mean we simulated the layout
    # with an orderBy — the non-distributed shape this test forbids)
    assert "Sort [" not in plan.split("AdaptiveSparkPlan")[0]


def test_ivfpq_candidate_join_is_equi(spark):
    """ann_ivfpq: the probed-list restriction is an equi-join on _id
    against the shared PQ codes (never a cross), and the final ranking
    is a TakeOrdered, not a global sort."""
    plan = _plan(spark, "ann_ivfpq")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_kn_nll_barriers_and_equi_joins(spark):
    """text_kn_nll: both count frames sit behind checkpoint barriers
    (the four consumers re-read materialized RDDs, not the corpus), the
    smoothing joins are bigram/word equi-joins, and the only tolerated
    non-equi join is the 1-row type-total attach."""
    plan = _plan(spark, "text_kn_nll")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "ExistingRDD" in plan


def test_profile_is_per_column_two_level(spark):
    """events_profile (r13 rewrite): one two-level aggregate per
    column instead of the Expand multi-distinct — the Expand shipped
    every row 13x through one exchange, while each per-column scan
    prunes to EXACTLY that one column and pre-collapses duplicates
    map-side (summed bytes ~ one full-width scan, 13x less shuffle;
    adjudicated in tools/scan_audit.py ALLOW). Pin: six scans, each
    with a single-column ReadSchema, NO Expand, no cartesian."""
    import re

    plan = _plan(spark, "events_profile")
    assert plan.count("Scan parquet") == 6, plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) == 6, plan
    assert all(s.count(":") == 1 for s in schemas), schemas  # one col each
    assert len(set(schemas)) == 6, schemas  # six DIFFERENT columns
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan


def test_span_and_dup_coverage_share_gram_census(spark):
    """dedup_span and doc_dup_coverage (r13): the gram document-
    frequency census is the shared _grams4_census_cached frame — each
    query used to run its own count-distinct over the full gram stream
    (the heaviest shuffle either plans). Pin: after the census frame is
    materialized, BOTH queries read [gh, nd] from an InMemoryTableScan
    and neither plans its own distinct-doc aggregate (no partial_count
    over doc_id anywhere in either plan)."""
    import re

    registry._grams4_census_cached(spark, SF_DIR).count()
    for qname in ("dedup_span", "doc_dup_coverage"):
        plan = _plan(spark, qname)
        assert re.search(r"InMemoryTableScan \[gh#\d+L?, nd#\d+L?\]", plan), (
            qname,
            plan,
        )
        # (the census's own count-distinct still PRINTS under the
        # InMemoryRelation subtree — text, not re-execution; the
        # InMemoryTableScan above is what executes)
        assert "CartesianProduct" not in plan, qname


def test_attribution_is_one_window_carry(spark):
    """events_attribution: the last-touch carry is a per-user window
    (one shuffle on user_id + sort within partitions), not a self-join
    — the as-of discipline (events_asof_order precedent)."""
    plan = _plan(spark, "events_attribution")
    assert plan.count("Scan parquet") == 1, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_dynamic_partition_pruning_reaches_fact_scan(spark, tmp_path):
    """Dynamic partition pruning is the other half of the 100 TB scan
    story (static pushdown being the first): a selective dim filter on
    a partition-keyed join must inject a dynamicpruningexpression into
    the FACT table's PartitionFilters, so only the dim-surviving
    partitions' files are listed and read — at scale, the difference
    between scanning 3/20 partitions and all of them."""
    from pyspark.sql import functions as F

    spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 20).alias("part")
    ).write.partitionBy("part").parquet(f"{tmp_path}/fact")
    dim = spark.createDataFrame(
        [(i, "keep" if i < 3 else "drop") for i in range(20)], "part int, tag string"
    )
    fact = spark.read.parquet(f"{tmp_path}/fact")
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "part")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan
    assert joined.count() == 1_500


def test_hilbert_layout_single_scan_one_codegen_walk(spark):
    """layout_hilbert_skip: the 8-level Hilbert walk must collapse into
    row-local projections over ONE events scan (+ the 1-row domain
    min/max pass), with the 2x layout fan-out as an explode — same
    distributed shape as layout_zorder_skip; the run-counting window
    runs over the ~128-row (layout, file) frame, not the data."""
    plan = _plan(spark, "layout_hilbert_skip")
    assert plan.count("Scan parquet") == 2, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Generate explode" in plan


def test_dq_constraints_anti_joins_no_cartesian(spark):
    """dq_constraints: referential integrity must stay LEFT ANTI (2
    arms), the only loop-join shapes allowed are the 1-row scalar
    attaches of the RI totals, and every single-table constraint reads
    the checkpointed fused pass — so the FINAL plan's parquet scans are
    the four anti-join inputs only."""
    plan = _plan(spark, "dq_constraints")
    assert plan.count("LeftAnti") == 2, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert plan.count("Scan parquet") <= 4, plan


def test_sessions_concurrency_aggregates_before_grid(spark):
    """sessions_concurrency: the sessionization is materialized ONCE
    (localCheckpoint) and the sweep-line consumers read the
    checkpointed interval rows — zero parquet re-scans — with the
    cumulative windows running over the grid only."""
    plan = _plan(spark, "sessions_concurrency")
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_orders_reorder_window_is_bucketed_equi_join(spark):
    """orders_reorder_window: the final plan reads the checkpointed
    per-base counts (the bucketed join ran exactly once) plus one
    orders scan for the total; the containment join itself — checked
    on the operator's plan, since the checkpoint hides it — is an
    equi-join fed by the interval->cell explode, never a nested
    loop."""
    plan = _plan(spark, "orders_reorder_window")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # zero-row scalar attach
    assert plan.count("Scan parquet") <= 1, plan

    from pyspark.sql import functions as F

    from aardappel_spark.ops.intervals import point_in_interval_join

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    wk = 7 * 86400 * 1_000_000
    base = o.select(
        F.col("o_custkey").alias("ck"), us.alias("s_us"), (us + wk).alias("e_us")
    )
    pts = o.select(F.col("o_custkey").alias("ck"), us.alias("f_us"))
    j = point_in_interval_join(pts, base, ["ck"], "f_us", "s_us", "e_us", wk)
    jplan = j._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in jplan, jplan
    assert "CartesianProduct" not in jplan
    assert "BroadcastNestedLoopJoin" not in jplan


def test_graph_triangles_semi_close_no_cartesian(spark):
    """graph_triangles: the wedge join runs over the checkpointed
    oriented edges (no parquet re-scan of the embedding pipeline) and
    the closing-edge check stays LEFT SEMI; nothing degenerates into a
    cartesian."""
    plan = _plan(spark, "graph_triangles")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 0, plan


def test_graph_communities_rounds_read_checkpoints(spark):
    """graph_communities: each LPA round joins the checkpointed
    bidirected edges with the checkpointed previous labels — the final
    plan re-reads no parquet and the top-1 vote stays a per-node
    window, with nothing degenerating into a loop join."""
    plan = _plan(spark, "graph_communities")
    assert plan.count("Scan parquet") == 0, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_customer_cohort_retention_single_orders_scan(spark):
    """customer_cohort_retention: the first-order month is a window
    min, NOT a groupBy-min self-join — exactly one orders scan feeds
    the whole cohort triangle."""
    plan = _plan(spark, "customer_cohort_retention")
    assert plan.count("Scan parquet") == 1, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_shipping_latency_histogram_not_fact_sort(spark):
    """shipping_latency: two fact scans (orders + lineitem) collapse
    into the counting histogram BEFORE any window — the cumulative
    Sort runs over hash-aggregated (priority, gap) rows, never over
    the joined fact table (at scale that per-priority fact sort is
    the skew wall this query exists to avoid)."""
    plan = _plan(spark, "shipping_latency")
    assert plan.count("Scan parquet") == 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the window input must be the post-aggregate frame: a HashAggregate
    # appears below the Window in the plan tree (printed after it)
    assert "Window" in plan and "HashAggregate" in plan
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], "window not fed by the histogram"


def test_events_stickiness_reads_checkpointed_user_days(spark):
    """events_stickiness: DAU and the x30 MAU fan-out both read the
    checkpointed distinct (user, day) frame — the final plan re-reads
    no parquet and the fan-out is a row-local Generate."""
    plan = _plan(spark, "events_stickiness")
    assert plan.count("Scan parquet") == 0, plan
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan


def test_events_new_vs_returning_single_events_scan(spark):
    """events_new_vs_returning: first-seen day is a window min over
    the user partition — one events scan, no self-join."""
    plan = _plan(spark, "events_new_vs_returning")
    assert plan.count("Scan parquet") == 1, plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_corpus_vocab_overlap_row_local_pairs(spark):
    """corpus_vocab_overlap: pairs explode row-locally from each
    token's member set (Generate over collect_set, never a token
    self-join) and the vocabulary sizes broadcast into the ppm
    arithmetic; the checkpointed (source, token) frame means no
    parquet re-scan."""
    plan = _plan(spark, "corpus_vocab_overlap")
    assert plan.count("Scan parquet") == 0, plan
    assert "Generate explode" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_assortativity_reads_checkpoints_only(spark):
    """graph_assortativity: the degree joins run over the
    checkpointed undirected edges and checkpointed degree frame — no
    parquet re-scan of the embedding pipeline, no loop joins."""
    plan = _plan(spark, "graph_assortativity")
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_emb_hubness_one_scan_for_antihub_total(spark):
    """emb_hubness: the histogram and the antihub count read the
    checkpointed in-degree frame; the only parquet touch left is the
    corpus-total count for the zero row."""
    plan = _plan(spark, "emb_hubness")
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan


def test_corpus_ngram_coverage_uses_distributed_topk(spark):
    """corpus_ngram_coverage: the vocabulary top-k must be a
    TakeOrdered (per-partition partial top-k), NEVER a global sort of
    the vocabulary — at 100 TB the vocab is 1e8+ rows and a
    single-partition Sort of it is the melt. The cumulative window
    runs over <= 32 rows after the take."""
    plan = _plan(spark, "corpus_ngram_coverage")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    # (the 1-row total attaches via a broadcast nested-loop over ONE
    # row — the benign scalar-attach pattern, not a join of data)


def test_doc_winnowing_window_is_doc_partitioned(spark):
    """doc_winnowing: the w=4 window min is partitioned by doc_id (a
    corpus-parallel window, never a global order), and the gram frame
    is the shared persisted build — no duplicate corpus scans."""
    plan = _plan(spark, "doc_winnowing")
    assert "PartitionBy: [doc_id" in plan.replace("partitionBy", "PartitionBy: ") \
        or "doc_id" in plan.split("Window")[1][:400], plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "qname",
    ["chunk_sliding", "emb_grid_cells", "events_user_entropy",
     "orders_mix_shift", "cdc_tx_stats", "cdc_view_topk",
     "text_code_detect", "doc_domain_stats", "multimodal_decode"],
)
def test_round8_queries_have_no_nested_loops(spark, qname):
    """Every round-8 addition: no cartesian products, no
    broadcast-nested-loop joins (the broadcast-scalar crossJoins in
    coverage/domain-stats attach 1-row frames and compile to
    BroadcastNestedLoopJoin over ONE row, which is fine — asserted
    separately below)."""
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan, plan


def test_emb_grid_cells_prunes_to_embedding_column(spark):
    """emb_grid_cells: the parquet scan must read only the embedding
    column (cell key is a row-local projection of 4 components)."""
    plan = _plan(spark, "emb_grid_cells")
    scan = plan[plan.index("Scan parquet"):][:600]
    assert "embedding" in scan and "vec_id" not in scan.split("ReadSchema")[-1], scan


@pytest.mark.parametrize(
    "qname",
    ["dedup_setsim_prefix", "graph_kcore", "cdc_schema_drift",
     "doc_url_canonical", "supplier_hhi"],
)
def test_round8_batch5_no_cartesian(spark, qname):
    """Batch-5 additions: no cartesian products anywhere (the 1-row
    total attach in cdc_schema_drift is a broadcast over ONE row)."""
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan, plan


def test_supplier_hhi_broadcasts_part_single_wide_shuffle(spark):
    """supplier_hhi: part joins as a broadcast (dim side), lineitem is
    scanned once, and the scan reads only the 4 needed columns."""
    plan = _plan(spark, "supplier_hhi")
    assert "BroadcastHashJoin" in plan, plan
    scan = plan[plan.index("Scan parquet"):]
    assert "l_extendedprice" in scan and "l_comment" not in scan
    assert plan.count("Scan parquet") == 2, plan  # lineitem + part


def test_doc_url_canonical_single_doc_scan(spark):
    """doc_url_canonical: one documents scan, projection pruned to the
    two columns the injector needs."""
    plan = _plan(spark, "doc_url_canonical")
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan


def test_setsim_prefix_candidates_are_equi_join(spark):
    """dedup_setsim_prefix: candidate generation must be a hash
    equi-join on the prefix token — never a nested-loop over doc
    pairs."""
    plan = _plan(spark, "dedup_setsim_prefix")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "qname",
    ["cdc_version_diff", "events_rolling_percentile", "text_top_terms",
     "corpus_budget_allocation"],
)
def test_round8_batch6_no_cartesian(spark, qname):
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan, plan


def test_rolling_percentile_fans_out_histogram_not_facts(spark):
    """events_rolling_percentile: the histogram barrier hides the single
    events scan (lazy checkpoint truncates the visible plan), so assert
    the post-barrier shape: the 7-day fan-out is a Generate over the
    checkpointed HISTOGRAM (no second parquet scan of facts), the
    day-list attaches as a broadcast hash join, and nothing sorts
    facts."""
    plan = _plan(spark, "events_rolling_percentile")
    assert plan.count("Scan parquet") == 0, plan  # all below the barrier
    assert "Generate explode" in plan, plan       # histogram-cell fan-out
    assert "BroadcastHashJoin" in plan, plan      # day-list attach
    assert "SortMergeJoin" not in plan, plan


def test_top_terms_rank_is_doc_partitioned(spark):
    """text_top_terms: the keyword rank must be a per-doc window over
    the checkpointed token-count frame — no re-scan of documents, no
    global sort of the corpus."""
    plan = _plan(spark, "text_top_terms")
    assert plan.count("Scan parquet") == 0, plan  # tf barrier owns the scan
    assert "Window" in plan and "doc_id" in plan.split("Window", 1)[1][:600], plan
    assert "CartesianProduct" not in plan


def test_ann_range_search_broadcasts_probes(spark):
    """ann_range_search: the probe batch must broadcast (corpus never
    shuffles); the embedding scan reads only what the dot product
    needs."""
    plan = _plan(spark, "ann_range_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning(vec_id" not in plan, plan


def test_events_heatmap_is_single_agg(spark):
    plan = _plan(spark, "events_heatmap")
    assert plan.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "qname", ["dedup_containment_prefix", "text_shingle_saturation"]
)
def test_round9_additions_no_cartesian(spark, qname):
    """Round-9 additions: candidate generation stays an equi-join
    (containment: prefix-vs-postings hash join) and the census is
    explode + hash-agg — no nested loops anywhere."""
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_shingle_saturation_single_doc_scan(spark):
    """text_shingle_saturation: all five widths come off ONE documents
    scan (row-local tag + concat, one explode), never five passes."""
    plan = _plan(spark, "text_shingle_saturation")
    assert plan.count("Scan parquet") == 1, plan


@pytest.mark.parametrize(
    "qname",
    [
        "graph_clustering_coeff", "ann_mrl_recall",
        "multimodal_aspect_buckets", "dedup_lsh_band_sweep",
    ],
)
def test_round9_batch2_no_cartesian(spark, qname):
    """Round-9 batch-2 additions: wedge generation, candidate pooling
    and truncation tiers all stay equi-joins (the only nested loop
    anywhere is brute_force_topk's broadcast of a single query row) —
    no CartesianProduct in any plan."""
    plan = _plan(spark, qname)
    assert "CartesianProduct" not in plan, plan


def test_aspect_buckets_is_scan_plus_single_agg(spark):
    """multimodal_aspect_buckets: one decode pass over one documents
    scan feeding one hash-agg — the census must never join."""
    plan = _plan(spark, "multimodal_aspect_buckets")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_band_sweep_reuses_one_signature_no_extra_joins(spark):
    """dedup_lsh_band_sweep: detection for every (b, r) config is
    boolean algebra over the already-joined signature columns — the
    plan carries exactly the universe's band equi-joins plus the four
    per-pair attachment joins (tokens a/b, signatures a/b), and the
    config fan-out is a row-local explode, never another join."""
    plan = _plan(spark, "dedup_lsh_band_sweep")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate explode" in plan, plan


@pytest.mark.parametrize(
    "qname", ["multimodal_pixel_stats", "multimodal_audio_stats"]
)
def test_sample_decode_is_single_scan_no_join(spark, qname):
    """Full-sample decode: one documents scan into one mapInPandas pass,
    never a join — the cost is O(payload bytes) per row."""
    plan = _plan(spark, qname)
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_minhash_bbit_no_cartesian_single_explode_universe(spark):
    """dedup_minhash_bbit: candidate pooling is the aligned 2-band
    equi-join; the b-bit match count is boolean algebra over joined
    signature columns — no nested loop, no extra shuffle family."""
    plan = _plan(spark, "dedup_minhash_bbit")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_langid_margin_single_scan_two_aggs(spark):
    plan = _plan(spark, "text_langid_margin")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_orders_benford_is_single_scan_nine_cells(spark):
    """orders_benford: one fact scan into a bounded hash-agg; the total
    joins back as a broadcast of one row — no wide join, no sort."""
    plan = _plan(spark, "orders_benford")
    assert plan.count("Scan parquet") <= 2, plan  # digits agg + its total
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_customer_kanon_two_hash_aggs_no_join(spark):
    plan = _plan(spark, "customer_kanon")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_scan_audit_clean(spark):
    """The repo's duplicate-scan gate, as a test: tools/scan_audit.audit
    must return zero unadjudicated FLAGs over the full registry. This is
    the r9 lesson — two sig12 consumers shipped FLAGged because the gate
    only ran by hand; now an un-adjudicated multi-scan plan fails CI.

    Caches are cleared first so the audit sees the same COLD state the
    CLI process does: a MATERIALIZED InMemoryRelation prints its build
    subtree several times in the plan text (measured: the single-scan
    dedup_simhash64 shows documents x4 once another test has collected
    the shared frame), which is text inflation, not re-derivation —
    exactly the artifact the ALLOW docstring describes."""
    import tools.scan_audit as sa
    from aardappel_spark import registry

    registry.clear_query_caches(spark)
    bad = sa.audit(spark, SF_DIR, threshold=4)
    assert bad == [], f"unadjudicated multi-scan queries: {bad}"


def test_scan_audit_allowlist_entries_exist(spark):
    """Every ALLOW entry must name a live registry query — a renamed or
    deleted query must not leave a stale adjudication behind."""
    import tools.scan_audit as sa

    assert set(sa.ALLOW) <= set(registry.QUERIES), sorted(
        set(sa.ALLOW) - set(registry.QUERIES)
    )


@pytest.mark.parametrize(
    "qname, kind, n_python_nodes",
    [
        ("multimodal_pixel_stats", "image", 1),
        ("multimodal_audio_stats", "audio", 1),
        # r14: extract_features + sample_frames fused into ONE
        # MapInPandas (video_frame_summary, r13 verdict #6)
        ("multimodal_video_frames", "video", 1),
    ],
)
def test_media_kind_filter_below_python_boundary(spark, qname, kind, n_python_nodes):
    """The kind-gated media queries must filter the media frame
    JVM-side BEFORE the Arrow/Python boundary (guide §4.1): each
    MapInPandas node sits above a kind filter, so payload bytes of the
    other kinds never cross into the Python workers. The filter also
    shows up as an InMemoryTableScan pushdown, hence >= 2 mentions per
    Python node. Output equivalence is the synthetic_media arm
    correlation (kind and payload arm are both CASE doc_id % 7) and is
    separately oracle-gated at three scales (plus the in-repo arm
    correlation unit test in test_ops_modules)."""
    plan = _plan(spark, qname)
    assert plan.count("MapInPandas") == n_python_nodes, plan
    needle = f"= {kind})"
    assert plan.count(needle) >= 2 * n_python_nodes, (
        f"{qname}: kind filter not planned below every Python node"
    )
    # per-node ordering (r13 ADVICE): EVERY MapInPandas occurrence must
    # have a kind filter planned below it (i.e. appearing after it in
    # the top-down formatted text), not just the first
    start = 0
    while True:
        pos = plan.find("MapInPandas", start)
        if pos == -1:
            break
        assert plan.find(needle, pos) != -1, (
            f"{qname}: MapInPandas at {pos} has no kind filter below it"
        )
        start = pos + 1
