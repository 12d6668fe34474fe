"""Scale probe: measure how headline queries scale when the data grows.

Replicates the sf0.1 tables N times into a derived dataset whose keys
are offset per replica (stride > any base key, so joins stay
replica-consistent and key cardinalities grow Nx) and whose document
tokens are suffixed per replica (so the gram/shingle space grows Nx —
"10x more unique data", not "10 copies of the same data", which would
quadratically inflate near-dup candidate sets instead of modeling
growth). Then runs a cross-family set of headline queries at 1x and Nx
and reports wall-clock scaling ratios.

The point of the artifact (SCALE_PROBE.json): on a fixed 32-thread
local executor, time should grow at most ~linearly with data (ratio <=
N, typically well under because fixed costs amortize). A query whose
ratio blows past N has a super-linear term — exactly what would melt at
100 TB — and fails the probe.

Usage: python tools/scale_probe.py [N] [outdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
STRIDE = 10**9  # larger than any base key

# key columns to offset per replica, per table (join-consistent)
KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# cross-family headliners: relational agg, broadcast join chain, window,
# shuffle-heavy dedup/LSH, text pipeline, CDC kernel
PROBE_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "events_sessions",
    "events_type_stats_salted",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_token_stats",
    "doc_boilerplate",
    "corpus_dsir",
    "cdc_apply",
    # round-5 additions: banded ANN (vectorized signature + band join),
    # PCA moment pass (mapInPandas partial sums), KMV sketch pipeline
    "ann_lsh_banded",
    "emb_pca_project",
    "events_theta_union",
    # round-5 second batch: CUSUM window pair (one Exchange), gram
    # novelty (hashed-key aggs). semantic_dedup is deliberately NOT
    # probed at fixed parameters: with n_centroids pinned at 16 for
    # oracle parity its within-cluster pair mass grows ~quadratically
    # in corpus size — the production dial is n_centroids ∝ N (see the
    # query docstring); probing the fixed-parameter variant would
    # measure the wrong configuration, not reveal a hidden defect.
    "events_cusum",
    "doc_ngram_novelty",
    # round-5 batch 4/5/6: order-pair self-join, token-entropy agg,
    # JS-divergence bucket scan, lead() transition window
    "basket_pairs",
    "doc_token_entropy",
    "corpus_js_drift",
    "events_markov",
    # round-6: the remaining duplicate-scan-audit-fixed queries (the
    # checkpoint-barrier fix class must stay measured; corpus_js_drift
    # is already above) and the kNN-graph family, probeable now that
    # replica embeddings are jittered (see replicate())
    "events_psi_drift",
    "retrieval_bm25",
    "events_funnel",
    # round-7 batch 2/3 additions: the window-carry and the 4-way
    # bigram-count-join families
    "events_attribution",
    "text_kn_nll",
    "emb_knn_graph",
    "graph_pagerank",
    # round-7: the near-dup calibration histogram (bits=4 fixed for
    # oracle parity -> same fixed-parameter arithmetic as the kNN family)
    "emb_sim_histogram",
    # round-7 batch 5: fused DQ gate (3 scans + 2 anti joins),
    # sweep-line concurrency (aggregate-first grid), bucketed
    # point-in-interval join, and the triangle/LPA kNN-graph consumers
    "dq_constraints",
    "sessions_concurrency",
    "orders_reorder_window",
    "graph_triangles",
    "graph_communities",
    # round-7 batch 6/7: window-min cohort triangle, dense-grid
    # autocorrelation, hash-agg burst histogram, per-source hapax
    # explode, shared-index health consumers (IVF silhouette, PQ code
    # census, simhash bit census) and two more kNN-graph consumers
    "customer_cohort_retention",
    "events_autocorr",
    "events_burst_rate",
    "doc_hapax_ratio",
    "emb_silhouette",
    "pq_code_balance",
    "doc_simhash_bit_balance",
    "emb_hubness",
    "graph_assortativity",
    # round-7 batch 8/9/10: user-day distinct fan-outs (stickiness /
    # growth split), histogram-exact percentile join, regexp-scan
    # readability, window-rank repeat latency, row-local vocab pairs
    "events_stickiness",
    "events_new_vs_returning",
    "shipping_latency",
    "text_readability",
    "orders_repeat_latency",
    "corpus_vocab_overlap",
    # round-8: winnowing window-min over the shared gram frame, chunk
    # fan-out arithmetic, distributed top-k coverage, injected
    # detectors, entropy cohorts, mix-shift windows, grid occupancy,
    # wire tx census, top-k view recompute, real-payload decode, and
    # the undirected degree census (kNN-graph consumer: fixed-param
    # annotated, dialed twin via the decomposed graph section)
    "doc_winnowing", "chunk_sliding", "corpus_ngram_coverage",
    "text_code_detect", "doc_domain_stats", "events_user_entropy",
    "orders_mix_shift", "emb_grid_cells", "cdc_tx_stats",
    "cdc_view_topk", "multimodal_decode", "graph_degree_hist",
    # round-8 batch 5: prefix-filter join (rare-token buckets), k-core
    # peel (kNN consumer: fixed-param annotated), schema drift census,
    # URL canonicalization, supplier HHI
    "dedup_setsim_prefix", "graph_kcore", "cdc_schema_drift",
    "doc_url_canonical", "supplier_hhi",
    # round-8 batch 6: two-fold snapshot diff, histogram-cell fan-out
    # percentiles, keyword-rank window, strata apportionment
    "cdc_version_diff", "events_rolling_percentile", "text_top_terms",
    "corpus_budget_allocation",
    # round-8 batch 7: probe-batch brute force (probes grow with N at
    # fixed modulus -> quadratic at oracle parity; production dial is a
    # FIXED query batch), heatmap 168-cell reduction
    "ann_range_search", "events_heatmap",
    # round 9: asymmetric containment join (prefix-vs-postings), the
    # w=1..5 shingle saturation census (single explode, two hash-aggs)
    "dedup_containment_prefix", "text_shingle_saturation",
    # round 9 batch 2: per-vertex clustering census (kNN consumer:
    # fixed-band annotated, dialed leg auto-enumerated), Matryoshka
    # truncation recall (4 brute-force scans, probe fixed at vec 0),
    # aspect bucketing (decode pass + hash-agg), the (b,r) band sweep
    # (one 12-hash signature + the aligned 2-band pooled universe)
    "graph_clustering_coeff", "ann_mrl_recall",
    "multimodal_aspect_buckets", "dedup_lsh_band_sweep",
    # round 9 batch 3: full uncompressed-sample decode (one mapInPandas
    # pass each, O(payload bytes) per row, no join anywhere)
    "multimodal_pixel_stats", "multimodal_audio_stats",
    # round 9 batch 4: b-bit estimation census (pooled 2-band universe,
    # boolean algebra over the shared signature), langid margin census
    # (one explode + two hash-aggs), Benford first-digit screen (one
    # fact scan into a 9-cell hash-agg)
    "dedup_minhash_bbit", "text_langid_margin", "orders_benford",
    # k-anonymity census: two hash-aggs over customer
    "customer_kanon",
    # round 10: real ISO-BMFF box walk (one mapInPandas pass,
    # O(payload bytes) per row, no join)
    "multimodal_video_frames",
    # round 11: the streaming twins' replay slots — 3 micro-batches
    # through incremental_setsim_batch / incremental_dedup_batch
    # including their parquet state stores, so the probe measures
    # store growth + the per-batch joins, not just a stateless plan
    "dedup_setsim_stream", "dedup_incremental_stream",
]

# the r4 probe's three worst linear constants (9.3x / 7.2x / 5.6x at
# x10) get a second, 100x point: if any had a hidden super-linear term,
# x100 is where it shows (and where spill-thrash would start). r8 adds
# the headline pipeline operators (r7 verdict #4) — the 100 TB claim
# rests on the x100 shape more than the x10 one.
X100_QUERIES = [
    "corpus_dsir", "doc_boilerplate", "cdc_apply",
    "dedup_minhash_pairs", "dq_constraints", "sessions_concurrency",
]

# measured at FIXED parameters although the production dial scales with
# N: LSH candidate mass is ~N²/2^bits at fixed band bits (the kNN graph
# and the PageRank built on it), so a super-linear x10 ratio here is
# the expected fixed-parameter arithmetic, not a plan defect — the
# 100 TB configuration raises band bits ∝ log N to hold bucket
# occupancy constant (knn_graph_banded docstring). The probe reports
# the honest measured number with this annotation instead of a
# linearity verdict.
FIXED_PARAM_SUPERLINEAR = {
    "emb_knn_graph": "LSH candidate mass ~N^2/2^bits at fixed band bits; production dial: bits grows with log N",
    "graph_pagerank": "runs on the kNN graph's edges (same fixed-band candidate arithmetic); dialed twin: graph_pagerank_dialed",
    "emb_sim_histogram": "LSH bucket pair mass ~N^2/2^bits at fixed bits=4 (oracle parity); production dial: bits grows with log N; dialed twin: emb_sim_histogram_dialed",
    "graph_triangles": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); the census itself is linear in edges+wedges",
    "graph_communities": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); each LPA round is linear in edges",
    "emb_hubness": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); the in-degree census is linear in edges",
    "graph_assortativity": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); degrees + stats are linear in edges",
    "graph_degree_hist": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); the degree census is linear in edges — see the decomposed *_dialed consumer rows",
    "graph_kcore": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); each peel round is linear in surviving edges — see the decomposed *_dialed consumer rows",
    "ann_range_search": "probe batch = vec_id % 67 at oracle parity, so probes grow with N and pair mass ~N^2/67; the production shape is a FIXED user-supplied query batch — MEASURED as ann_range_search_fixedbatch (r8 verdict #2)",
    "graph_clustering_coeff": "runs on the kNN graph's edges (same fixed-band candidate arithmetic as emb_knn_graph); the oriented-wedge census is linear in wedges — see the decomposed *_dialed consumer rows",
}

# Queries whose OUTPUT is detail-granularity (one row per input event,
# not an aggregate): the probe's .collect() adds a serial driver-side
# row-materialization term that grows with N and dominates the measured
# ratio — a measurement artifact of local mode, not a plan term (on a
# cluster this output is written distributed, never collected). For
# these the probe reports a second, distributed-sink leg
# (write.format("noop"): full execution, zero driver transfer) as
# ratio_compute alongside the collect ratio. Measured r7 decomposition
# for events_cusum at x10: collect 3.7s vs distributed compute 0.66s
# (compute ratio 1.7 on a 0.39s x1 — the one-Exchange window plan is
# strongly sub-linear; the 7.78 headline ratio was the driver collect).
DETAIL_OUTPUT = {"events_cusum"}


def replicate(spark: SparkSession, n: int, outdir: str) -> None:
    for table, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        parts = []
        for i in range(n):
            r = df
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if table == "documents" and i > 0:
                # distinct token space per replica: every token gets a
                # replica suffix, so shingles/grams/minhash signatures
                # are new values, not cross-replica duplicates
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
            if table == "embeddings" and i > 0:
                # jittered replicas: copied vectors get deterministic
                # per-(vec,dim,replica) noise (±0.05, ~half the mean
                # component magnitude) so projection sign bits differ
                # across replicas. Verbatim copies would grow every LSH
                # band bucket Nx with IDENTICAL vectors and the
                # bucket-local pair mass ~N^2 — the duplicated-corpus
                # pathology, not growth — which is why graph_pagerank /
                # emb_knn_graph were excluded from the r5 probe. With
                # jitter they are probed like everything else.
                r = r.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x
                            + 0.1
                            * (
                                F.pmod(
                                    F.xxhash64(F.col("vec_id"), j, F.lit(i)),
                                    F.lit(1000),
                                )
                                / 1000.0
                                - 0.5
                            )
                        ).cast("float"),
                    ),
                )
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n_files = 32 if table in ("lineitem", "orders", "events") else 4
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{outdir}/{table}.parquet"
        )


def run_probe(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, float]:
    from aardappel_spark import registry
    from aardappel_spark.registry import clear_query_caches

    import gc

    clear_query_caches(spark)
    out = {}
    for name in names:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).collect()
        out[name] = round(time.perf_counter() - t0, 2)
        # outside the timed window: drop dead checkpoint blocks so later
        # queries don't pay eviction pressure (same hygiene as bench.py)
        gc.collect()
        print(f"#   {name}: {out[name]}s", file=sys.stderr)
    clear_query_caches(spark)
    return out


def main() -> None:
    global PROBE_QUERIES, X100_QUERIES
    only = os.environ.get("SCALE_PROBE_ONLY", "")
    if only:  # smoke/debug: probe a subset, e.g. SCALE_PROBE_ONLY=tpch_q1,cdc_apply
        keep = set(only.split(","))
        PROBE_QUERIES = [q for q in PROBE_QUERIES if q in keep]
        X100_QUERIES = [q for q in X100_QUERIES if q in keep]
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_probe"
    )
    from aardappel_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {"n": n, "base": BASE, "queries": {}}
    dirs = {}
    for factor in (1, n):
        d = f"{root}/x{factor}"
        print(f"# building {d}", file=sys.stderr)
        t0 = time.perf_counter()
        replicate(spark, factor, d)
        print(f"# built x{factor} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        dirs[factor] = d

    # one discarded x1 pass first: JIT/codegen/first-touch costs land
    # here, not in the measured x1 numbers (without this, x1 absorbs all
    # warm-up and the xN/x1 ratios read absurdly sub-linear)
    print("# jit warm-up pass (discarded)", file=sys.stderr)
    run_probe(spark, dirs[1], PROBE_QUERIES)

    def best_of(sf_dir, names, passes=2):
        # min over passes: one transient hiccup (page-cache flush, GC
        # pause) must not flip a linearity verdict — a x10 run of
        # tpch_q1 once read 17.8 s in-probe vs 0.9 s steady-state
        runs = [run_probe(spark, sf_dir, names) for _ in range(passes)]
        return {k: min(r[k] for r in runs) for k in names}

    t1 = best_of(dirs[1], PROBE_QUERIES)
    tn = best_of(dirs[n], PROBE_QUERIES)

    def best_of_noop(sf_dir, name, passes=2):
        from aardappel_spark import registry

        best = float("inf")
        for _ in range(passes):
            df = registry.QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    for name in PROBE_QUERIES:
        ratio = round(tn[name] / max(t1[name], 0.01), 2)
        row = {
            f"t_x1_sec": t1[name],
            f"t_x{n}_sec": tn[name],
            "ratio": ratio,
        }
        if name in FIXED_PARAM_SUPERLINEAR:
            row["fixed_param_note"] = FIXED_PARAM_SUPERLINEAR[name]
        elif name in DETAIL_OUTPUT:
            # second leg: same query through a distributed sink, so the
            # serial driver collect of the N-row detail output doesn't
            # masquerade as a plan term (see DETAIL_OUTPUT comment)
            c1 = best_of_noop(dirs[1], name)
            cn = best_of_noop(dirs[n], name)
            rc = round(cn / max(c1, 0.01), 2)
            row["t_x1_compute_sec"] = c1
            row[f"t_x{n}_compute_sec"] = cn
            row["ratio_compute"] = rc
            row["linear_or_better"] = rc <= n * 1.2
            row["detail_output_note"] = (
                "collect ratio includes serial driver materialization of "
                "the per-event detail output (local-mode measurement "
                "artifact); ratio_compute is the distributed-sink leg"
            )
        else:
            row["linear_or_better"] = ratio <= n * 1.2  # 20% tolerance
        results["queries"][name] = row
    _flush_results(results)

    # the fixed-parameter kNN rows above measure the pinned test
    # configuration; this row DEMONSTRATES the documented dial — at xN
    # the band bits grow by ~log2(N) so bucket occupancy (and therefore
    # per-bucket Gram work) stays constant. Same kernel, the
    # occupancy-constant configuration a production deployment runs.
    import math

    from aardappel_spark.ops.similarity import knn_graph_banded

    def knn_dialed(sf_dir, factor):
        bits = 4 + max(0, int(round(math.log2(factor))))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return knn_graph_banded(emb, k=5, n_bands=12, band_bits=bits)

    dialed = {}
    for factor in (1, n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            knn_dialed(dirs[factor], factor).collect()
            best = min(best, time.perf_counter() - t0)
        dialed[factor] = round(best, 2)
        print(f"#   emb_knn_graph_dialed x{factor}: {dialed[factor]}s", file=sys.stderr)
    results["queries"]["emb_knn_graph_dialed"] = {
        "t_x1_sec": dialed[1],
        f"t_x{n}_sec": dialed[n],
        "ratio": round(dialed[n] / max(dialed[1], 0.01), 2),
        "linear_or_better": dialed[n] / max(dialed[1], 0.01) <= n * 1.2,
        "note": (
            "band_bits raised 4 -> 4+log2(N) at xN (occupancy-constant "
            "configuration): the production dial the fixed-parameter "
            "emb_knn_graph row documents"
        ),
    }

    # DECOMPOSED demonstration for every consumer of the shared banded
    # kNN graph (r7 verdict #1, r8 verdict #3): build the occupancy-
    # constant graph (band_bits 4 -> 4+log2(N)) ONCE per factor, time
    # the build as its own row, then time each consumer's OWN leg on
    # the materialized edges. The consumer list is ENUMERATED from
    # registry.graph.GRAPH_CONSUMERS (one kernel per gated consumer
    # query, completeness unit-tested) — no hand-kept list to forget
    # when a new consumer lands.
    from aardappel_spark.ops.similarity import cosine_neardup_lsh
    from aardappel_spark.registry.graph import GRAPH_CONSUMERS

    def dialed_bits(factor):
        return 4 + max(0, int(round(math.log2(factor))))

    build_t = {}
    consumer_t: dict[str, dict[int, float]] = {}
    build_failed = False
    for factor in (1, n):
        emb = spark.read.parquet(f"{dirs[factor]}/embeddings.parquet")
        best_build, edges = float("inf"), None
        attempts = 0
        while attempts < 3 and (edges is None or attempts < 2):
            attempts += 1
            try:
                t0 = time.perf_counter()
                edges = (
                    knn_graph_banded(
                        emb, k=5, n_bands=12, band_bits=dialed_bits(factor)
                    )
                    .select(
                        F.col("vec_id").alias("src"), F.col("neighbor").alias("dst")
                    )
                    .localCheckpoint()  # eager: the build leg ends here
                )
                best_build = min(best_build, time.perf_counter() - t0)
            except Exception as exc:  # transient python-worker death:
                # one crashed attempt must not lose the whole artifact
                print(f"#   build x{factor} attempt failed: {exc}",
                      file=sys.stderr)
        if edges is None:
            # every attempt failed: bail out of this factor's dialed
            # section with an explicit error row instead of letting
            # inf/None flow into ratio math and non-standard JSON
            # (r8 ADVICE item)
            build_failed = True
            results["queries"]["knn_graph_build_dialed"] = {
                "error": f"build never succeeded at x{factor} "
                         f"({attempts} attempts)"
            }
            continue
        build_t[factor] = round(best_build, 2)
        print(
            f"#   knn_graph_build_dialed x{factor}: {build_t[factor]}s",
            file=sys.stderr,
        )
        for qname, kern in GRAPH_CONSUMERS.items():
            cname = f"{qname}_dialed"
            best = float("inf")
            for _ in range(2):
                try:
                    t0 = time.perf_counter()
                    kern(spark, emb, edges).collect()
                    best = min(best, time.perf_counter() - t0)
                except Exception as exc:
                    print(f"#   {cname} x{factor} attempt failed: {exc}",
                          file=sys.stderr)
            if best == float("inf"):
                continue
            consumer_t.setdefault(cname, {})[factor] = round(best, 2)
            print(f"#   {cname} x{factor}: {best:.2f}s", file=sys.stderr)

    if not build_failed:
        results["queries"]["knn_graph_build_dialed"] = {
            "t_x1_sec": build_t[1],
            f"t_x{n}_sec": build_t[n],
            "ratio": round(build_t[n] / max(build_t[1], 0.01), 2),
            "linear_or_better": build_t[n] / max(build_t[1], 0.01) <= n * 1.2,
            "note": (
                "the SHARED banded kNN graph build at occupancy-constant "
                "band bits (4 -> 4+log2(N)), materialized via checkpoint — "
                "the build leg every *_dialed consumer row below excludes"
            ),
        }
    for cname, dd in consumer_t.items():
        if 1 not in dd or n not in dd:
            results["queries"][cname] = {"error": f"leg missing: {sorted(dd)}"}
            continue
        results["queries"][cname] = {
            "t_x1_sec": dd[1],
            f"t_x{n}_sec": dd[n],
            "ratio": round(dd[n] / max(dd[1], 0.01), 2),
            "linear_or_better": dd[n] / max(dd[1], 0.01) <= n * 1.2,
            "note": (
                "consumer leg ONLY, on the materialized occupancy-"
                "constant graph (build timed separately as "
                "knn_graph_build_dialed) — demonstrates the consumer "
                "is linear in edges; enumerated from GRAPH_CONSUMERS"
            ),
        }
    _flush_results(results)

    # the similarity histogram consumes the banded PAIRS (with sims),
    # not the kNN edge list — its dialed row stays build-inclusive,
    # same as r6/r7
    def sim_histogram_dialed(sf_dir, factor):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pairs = cosine_neardup_lsh(emb, threshold=-1.0, bits=dialed_bits(factor))
        b = F.floor(F.col("sim") * 20).cast("bigint")
        return pairs.groupBy(b.alias("bin")).agg(F.count("*").alias("n_pairs"))

    dd = {}
    for factor in (1, n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sim_histogram_dialed(dirs[factor], factor).collect()
            best = min(best, time.perf_counter() - t0)
        dd[factor] = round(best, 2)
        print(f"#   emb_sim_histogram_dialed x{factor}: {dd[factor]}s", file=sys.stderr)
    results["queries"]["emb_sim_histogram_dialed"] = {
        "t_x1_sec": dd[1],
        f"t_x{n}_sec": dd[n],
        "ratio": round(dd[n] / max(dd[1], 0.01), 2),
        "linear_or_better": dd[n] / max(dd[1], 0.01) <= n * 1.2,
        "note": (
            "band bits raised 4 -> 4+log2(N) at xN (occupancy-"
            "constant): the production dial the fixed-parameter "
            "emb_sim_histogram row documents (build-inclusive)"
        ),
    }
    _flush_results(results)

    # FIXED-BATCH radius search (r8 verdict #2): the gated
    # ann_range_search draws probes as vec_id % 67, so at oracle parity
    # the probe batch GROWS with the corpus and pair mass is ~N^2/67 —
    # the fixed_param_note arithmetic. The production shape is a fixed
    # user-supplied query batch against a growing corpus; this leg
    # MEASURES that: probes restricted to the base replica (vec_id <
    # STRIDE — the identical batch at x1 and xN) while the corpus grows
    # Nx. Expected ~linear.
    from aardappel_spark.registry.ann import range_search_kernel

    def range_fixedbatch(sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        probes = emb.filter(
            (F.col("vec_id") % 67 == 1) & (F.col("vec_id") < STRIDE)
        ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        return range_search_kernel(emb, probes)

    dd = {}
    for factor in (1, n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            range_fixedbatch(dirs[factor]).collect()
            best = min(best, time.perf_counter() - t0)
        dd[factor] = round(best, 2)
        print(f"#   ann_range_search_fixedbatch x{factor}: {dd[factor]}s",
              file=sys.stderr)
    results["queries"]["ann_range_search_fixedbatch"] = {
        "t_x1_sec": dd[1],
        f"t_x{n}_sec": dd[n],
        "ratio": round(dd[n] / max(dd[1], 0.01), 2),
        "linear_or_better": dd[n] / max(dd[1], 0.01) <= n * 1.2,
        "note": (
            "FIXED probe batch (base-replica vec_ids, identical at both "
            "factors) against the Nx corpus — the production radius-"
            "search shape the gated row's fixed_param_note describes, "
            "now measured instead of asserted"
        ),
    }
    _flush_results(results)

    # SHARED-VOCABULARY setsim legs (r8 verdict #1): the default probe
    # replicas suffix every token per replica, which structurally caps
    # setsim candidate growth at Nx independent subproblems (disjoint
    # vocabularies) — the r8 2.06 ratio measured the replication
    # scheme, not the kernel. These legs replicate documents with
    # per-replica word PERMUTATIONS instead: the unigram vocabulary is
    # SHARED across replicas (the realistic growth model — new docs in
    # the same language), 4-gram shingles are new combinations from
    # it, and the FILTERED candidate mass curve is recorded alongside
    # wall-clock. The dialed twin raises the shingle width at xN
    # (|V|^w must stay >> postings as the corpus grows — saturation of
    # the shingle space is the degenerate regime the kernel's guard
    # refuses).
    from aardappel_spark.ops.dedup import setsim_prefix_pairs

    if only and not X100_QUERIES and not (
        {"dedup_setsim_sharedvocab", "dedup_setsim_sharedvocab_dialed"}
        & set(only.split(","))
    ):
        # subset run that names neither a sharedvocab leg nor a dialed
        # x100 query: skip the remaining sections INCLUDING the
        # shared_docs replica build (~minutes); the merge-write keeps
        # the committed rows
        _flush_results(results)
        print(json.dumps(results))
        shutil.rmtree(root, ignore_errors=True)
        return

    d_shared = f"{root}/shared_docs_x{n}"
    base_docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(n):
        r = base_docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * STRIDE)
        )
        if i > 0:
            # deterministic word shuffle per replica: same words
            # (shared vocab), different order -> new shingles
            r = (
                r.withColumn(
                    "_w",
                    F.filter(F.split(F.col("text"), " "), lambda x: x != ""),
                )
                .withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(1), F.size("_w")),
                            lambda idx: F.element_at(
                                F.col("_w"),
                                (
                                    F.pmod(
                                        idx * (2 * i + 1) + 7 * i,
                                        F.size("_w"),
                                    )
                                    + 1
                                ).cast("int"),
                            ),
                        ),
                        " ",
                    ),
                )
                .drop("_w")
            )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(4).write.mode("overwrite").parquet(
        f"{d_shared}/documents.parquet"
    )

    def setsim_summary(docs_dir, shingle):
        docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
        pairs = setsim_prefix_pairs(docs, 4, 5, shingle=shingle)
        return pairs.agg(
            F.count("*").alias("n_candidates"),
            F.coalesce(F.sum(F.col("verified").cast("bigint")), F.lit(0))
            .alias("n_verified"),
        )

    for leg, w_at in (
        ("dedup_setsim_sharedvocab", {1: 4, n: 4}),
        ("dedup_setsim_sharedvocab_dialed", {1: 4, n: 5}),
    ):
        row: dict = {}
        try:
            times, counts = {}, {}
            for factor, ddir in ((1, dirs[1]), (n, d_shared)):
                best, cnt = float("inf"), None
                for _ in range(2):
                    t0 = time.perf_counter()
                    got = setsim_summary(ddir, w_at[factor]).collect()[0]
                    best = min(best, time.perf_counter() - t0)
                    cnt = (got["n_candidates"], got["n_verified"])
                times[factor] = round(best, 2)
                counts[factor] = cnt
                print(f"#   {leg} x{factor}: {times[factor]}s "
                      f"cand={cnt[0]}", file=sys.stderr)
            row = {
                "t_x1_sec": times[1],
                f"t_x{n}_sec": times[n],
                "ratio": round(times[n] / max(times[1], 0.01), 2),
                "linear_or_better": times[n] / max(times[1], 0.01) <= n * 1.2,
                "n_candidates_x1": counts[1][0],
                f"n_candidates_x{n}": counts[n][0],
                "candidate_ratio": round(
                    counts[n][0] / max(counts[1][0], 1), 2
                ),
                "shingle_x1": w_at[1],
                f"shingle_x{n}": w_at[n],
                "note": (
                    "SHARED unigram vocabulary across replicas (word-"
                    "permuted copies, no token suffixing) — the honest "
                    "growth model for the prefix-filter join; candidate "
                    "mass curve recorded, filters + guard active"
                ),
            }
        except ValueError as exc:
            # the degenerate-regime guard refusing IS a designed
            # outcome — record it rather than crash the artifact
            row = {"guard_refused": str(exc)[:300]}
        results["queries"][leg] = row
        _flush_results(results)

    big = int(os.environ.get("SCALE_PROBE_BIG", "100"))
    if big > n:
        d_big = f"{root}/x{big}"
        print(f"# building {d_big}", file=sys.stderr)
        t0 = time.perf_counter()
        replicate(spark, big, d_big)
        print(f"# built x{big} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        t_big = best_of(d_big, X100_QUERIES)
        for name in X100_QUERIES:
            r = results["queries"][name]
            ratio_big = round(t_big[name] / max(t1[name], 0.01), 2)
            r[f"t_x{big}_sec"] = t_big[name]
            r[f"ratio_x{big}"] = ratio_big
            r[f"linear_or_better_x{big}"] = ratio_big <= big * 1.2
        results["x_big"] = big
        _flush_results(results)

        # x100 points for the two DIALED operators whose production
        # configuration scales a parameter with N: the occupancy-
        # constant kNN graph build (band bits 4 -> 4+log2(100) ~= 11)
        # and SemDeDup with n_centroids ∝ N (within-cluster pair mass
        # stays ∝ N; fixed 16 centroids would be the documented
        # quadratic misconfiguration, not growth)
        from aardappel_spark.ops.similarity import cosine, ivf_build

        def knn_build_at(sf_dir, factor):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            return knn_graph_banded(
                emb, k=5, n_bands=12, band_bits=dialed_bits(factor)
            )

        def semantic_dedup_at(sf_dir, factor):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            assigned, _ = ivf_build(
                emb, n_centroids=16 * factor, refine_iters=1
            )
            a = assigned.select(
                F.col("_c").alias("cid"), F.col("_id").alias("id_a"),
                F.col("_v").alias("va"),
            )
            b = assigned.select(
                F.col("_c").alias("cid"), F.col("_id").alias("id_b"),
                F.col("_v").alias("vb"),
            )
            return (
                a.join(b, "cid")
                .filter(F.col("id_b") < F.col("id_a"))
                .filter(cosine(F.col("va"), F.col("vb")) >= 0.4)
                .groupBy("id_a")
                .agg(F.min("id_b").alias("dup_of"))
            )

        for dname, fn in (
            ("emb_knn_graph_dialed", knn_build_at),
            ("semantic_dedup_dialed", semantic_dedup_at),
        ):
            dd = {}
            for factor in (1, big):
                best = float("inf")
                # best-of-2 with up to 3 tries: the x100 mapInPandas legs
                # are where a single transient python-worker death killed
                # the r9 first run at stage ~7000 — one crashed attempt
                # must not lose the factor, let alone the artifact
                successes = 0
                for _ in range(3):
                    try:
                        t0 = time.perf_counter()
                        fn(dirs.get(factor, d_big), factor).collect()
                        best = min(best, time.perf_counter() - t0)
                        successes += 1
                        if successes >= 2:
                            break
                    except Exception as exc:
                        print(
                            f"#   {dname} x{factor} attempt failed: {exc}",
                            file=sys.stderr,
                        )
                if best == float("inf"):
                    results["queries"].setdefault(dname, {})[
                        f"error_x{big}"
                    ] = f"all attempts failed at x{factor}"
                    break
                dd[factor] = round(best, 2)
                print(f"#   {dname} x{factor}: {dd[factor]}s", file=sys.stderr)
            if 1 not in dd or big not in dd:
                continue
            row = results["queries"].setdefault(dname, {"t_x1_sec": dd[1]})
            row[f"t_x{big}_dialed_sec"] = dd[big]
            row["t_x1_dialed_sec"] = dd[1]
            row[f"ratio_x{big}"] = round(dd[big] / max(dd[1], 0.01), 2)
            row[f"linear_or_better_x{big}"] = (
                dd[big] / max(dd[1], 0.01) <= big * 1.2
            )
            row["note_x100"] = (
                "parameter dialed with N (band bits +log2(N) / "
                "n_centroids x N): the production configuration"
            )
            _flush_results(results)
    _flush_results(results)
    print(json.dumps(results))
    shutil.rmtree(root, ignore_errors=True)


def _flush_results(results: dict) -> None:
    """MERGE-write the artifact atomically NOW — called at section
    boundaries so a crash in any later section loses at most that
    section, never the whole run (the r9 first run measured everything
    and then died writing nothing: the dump only lived at the end of
    main). The write MERGES this run's per-query rows over the
    committed artifact's rows instead of replacing the file wholesale:
    an aborted or SCALE_PROBE_ONLY subset run can update only the rows
    it actually probed and provably cannot lose committed rows (r11
    verdict #6 — an aborted subset run once clobbered the 100-row
    artifact down to its subset; restored from git in 6a08bbb)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json",
    )
    try:
        with open(path) as fh:
            committed = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        committed = {}
    # start from the COMMITTED dict and overlay this run's keys: any
    # committed top-level key this run didn't produce (e.g. "x_big"
    # from a prior full run) survives a subset/aborted run too — the
    # same clobber class as the query rows (r12 ADVICE)
    merged = {**committed, **results}
    if isinstance(committed.get("queries"), dict):
        qs = {k: dict(v) for k, v in committed["queries"].items()}
        for name, row in results.get("queries", {}).items():
            # per-ROW merge too: a subset run that re-measures only the
            # x10 legs must not drop the committed row's dialed-x100 legs
            qs.setdefault(name, {}).update(row)
        merged["queries"] = qs
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
