"""Corpus-level statistics, vocab, retrieval, quality classifier."""


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
from .ann import q_ann_cosine
from ..localrel import local_df



def q_corpus_contam_overlap(spark, sf_dir):
    """Pairwise contamination overlap: for each (corpus doc, eval doc)
    pair sharing 4-grams, the shared-gram count and Jaccard over their
    distinct gram sets — the evidence table behind the boolean
    decontamination verdict. Candidates come from the gram equi-join;
    nothing all-pairs."""
    g = _grams4_cached(spark, sf_dir).select("doc_id", "gram").distinct()
    corpus = g.filter(F.col("doc_id") >= 5)
    eval_g = g.filter(F.col("doc_id") < 5)
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n"))
    shared = (
        corpus.select(F.col("doc_id").alias("corpus_doc"), "gram")
        .join(
            F.broadcast(
                eval_g.select(F.col("doc_id").alias("eval_doc"), "gram")
            ),
            "gram",
        )
        .groupBy("corpus_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
    )
    na = sizes.select(F.col("doc_id").alias("corpus_doc"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("eval_doc"), F.col("n").alias("nb"))
    return (
        shared.join(na, "corpus_doc")
        .join(F.broadcast(nb), "eval_doc")
        .select(
            "corpus_doc",
            "eval_doc",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                4,
            ).alias("gram_jaccard"),
        )
        .orderBy(F.desc("n_shared"), "corpus_doc", "eval_doc")
        .limit(20)
    )


def q_corpus_health(spark, sf_dir):
    """One-row corpus health dashboard — the governance headline a
    pipeline owner checks before cutting a training snapshot: volume
    (docs/tokens), exact-duplicate mass (bag-of-words fingerprint),
    near-dup candidate mass (share of docs in >= 1 LSH pair), and
    language-ID coverage (share detected as und). Three tiny 1-row
    aggregates broadcast-join the doc-level stats; the only corpus-
    scale work is one token count and the shared fingerprint/pair
    frames."""
    from ..ops.text import language_id, tokens_col

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tok")
    )
    fp = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.array_sort(F.array_distinct(tokens_col("text"))),
            )
        ).alias("fp"),
    )
    dup_docs = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("exact_dup_docs"))
    )
    pairs = _minhash_pairs_cached(spark, sf_dir)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .agg(F.count("*").alias("neardup_candidate_docs"))
    )
    und = language_id(docs).agg(
        F.sum((F.col("pred_lang") == "und").cast("long")).alias("n_und")
    )
    totals = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(F.avg("n_tok"), 4).alias("mean_doc_tokens"),
    )
    j = (
        totals.crossJoin(F.broadcast(dup_docs))
        .crossJoin(F.broadcast(cand_docs))
        .crossJoin(F.broadcast(und))
    )
    return j.select(
        "n_docs",
        "n_tokens",
        "mean_doc_tokens",
        "exact_dup_docs",
        F.round(
            F.col("exact_dup_docs") / F.greatest(F.col("n_docs"), F.lit(1)), 6
        ).alias("exact_dup_ratio"),
        "neardup_candidate_docs",
        F.round(
            F.col("neardup_candidate_docs") / F.greatest(F.col("n_docs"), F.lit(1)), 6
        ).alias("neardup_candidate_ratio"),
        F.col("n_und").alias("lang_und_docs"),
        F.round(
            F.col("n_und") / F.greatest(F.col("n_docs"), F.lit(1)), 6
        ).alias("lang_und_ratio"),
    )


def q_corpus_mixture(spark, sf_dir):
    """Weighted corpus mixing: per-source keep fractions (src0 full,
    src1 half, src2 tenth, everything else 25%), then the resulting
    mixture profile per source."""
    from ..ops.sampling import mixture_sample

    mixed = mixture_sample(
        _docs(spark, sf_dir),
        {"src0": 1.0, "src1": 0.5, "src2": 0.1},
        default_frac=0.25,
    )
    return mixed.groupBy("source").agg(F.count("*").alias("n"))


def q_vocab_top_bigrams(spark, sf_dir):
    """Vocabulary construction: global top-20 word bigrams by count.
    Partial (map-side) aggregation shrinks the shuffle to distinct
    bigrams; the top-k is a TakeOrdered, never a full sort."""
    from ..ops.dedup import shingles_col

    g = _docs(spark, sf_dir).select(
        F.explode(shingles_col("text", k=2)).alias("ngram")
    )
    return (
        g.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "ngram")
        .limit(20)
    )


def q_chunk_packing(spark, sf_dir):
    """Context-window packing of the chunk stream: hash-bucket shards,
    running-token-count bins of 64 tokens within each bucket."""
    from ..ops.chunking import chunk_documents, pack_chunks

    ch = chunk_documents(_docs(spark, sf_dir), chunk_tokens=16, overlap=4)
    return pack_chunks(ch, context_tokens=64, n_buckets=8)


def q_vocab_countmin(spark, sf_dir):
    """Count-min sketch of corpus token frequencies: 4 hash rows x 256
    columns, salted-md5 column assignment — deterministic, so the whole
    sketch table is oracle-exact (sketches are usually unverifiable
    across engines; plan-time hashing makes this one checkable). Build
    order: aggregate to (token, count) FIRST, then fan out 4 sketch rows
    per DISTINCT token — the explode runs on vocabulary size, not corpus
    token count, and the final agg is at most 1024 rows."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("c"))
    cells = counts.select(
        F.posexplode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{r}:"), F.col("token"))), 1, 7
                            ),
                            16,
                            10,
                        ).cast("long")
                        % 256
                    )
                    for r in range(4)
                ]
            )
        ).alias("row", "col"),
        F.col("c"),
    )
    return cells.groupBy(
        F.col("row").cast("bigint").alias("row"), "col"
    ).agg(F.sum("c").alias("total"))


def q_corpus_token_budget(spark, sf_dir):
    """Token-budgeted corpus selection: per source, take documents in
    deterministic salted-md5 ticket order until a token budget fills —
    how a mixture recipe caps each source's contribution by TOKENS, not
    documents. Running sum via an explicit ROWS window (RANGE shares
    peers); ticket ordering is unique per doc, so the cut is exact and
    reproducible. One shuffle keyed on source."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("bigint")
    ticket = F.md5(F.concat(F.lit("budget:"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy("ticket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        docs.select(
            "doc_id", "source", n_tokens.alias("n_tokens"), ticket.alias("ticket")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 600)
    )
    return sel.select("doc_id", "source", "n_tokens", "cum_tokens")


def q_retrieval_bm25(spark, sf_dir):
    """BM25 top-20 documents for the fixed query {table, join, window}."""
    from ..ops.text import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), k=20)


def q_vocab_postings(spark, sf_dir):
    """Inverted-index summary for the 50 highest-df tokens: df, total
    tf, and the top-scoring document per token."""
    from ..ops.text import postings

    return postings(_docs(spark, sf_dir), top_tokens=50)


def q_corpus_temperature(spark, sf_dir):
    """Temperature-based language rebalancing (alpha = 0.5): keep rate
    per language = sqrt(n_smallest / n_lang), so the language
    distribution moves toward sqrt-proportional (the multilingual
    up/down-sampling step). alpha = 0.5 keeps every arithmetic op
    IEEE-exact (sqrt is correctly rounded, unlike pow/ln), so the
    md5-ticket cut is engine-portable. Counts frame is 5 rows ->
    broadcast; the filter is row-local. Output: the kept-count profile
    per language."""
    from ..ops.sampling import sample_ticket

    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").alias("_n"))
    from pyspark.sql.window import Window

    counts = counts.withColumn(
        "_nmin", F.min("_n").over(Window.partitionBy())
    ).withColumn(
        "_cut",
        F.floor(
            F.sqrt(F.col("_nmin").cast("double") / F.col("_n"))
            * F.lit(4294967296.0)
        ).cast("long"),
    )
    t = sample_ticket("doc_id", "temp")
    kept = docs.join(F.broadcast(counts), "lang").filter(t < F.col("_cut"))
    return kept.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_kept"))


def q_quality_lr_train(spark, sf_dir):
    """Train a logistic-regression quality classifier IN the engine:
    three full-batch gradient-descent iterations, each ONE distributed
    aggregation pass (sum of x*(sigmoid(x.w) - y) over the corpus) with
    only the 4-float gradient reaching the driver — textbook
    data-parallel GD, the shape that holds at any corpus size. Labels:
    lang == 'en'; features: bias, token count, stopword ratio, token
    length. The oracle replays the identical three iterations in SQL;
    weights round to 6 decimals so the engines' different summation
    orders (both valid IEEE) cannot flip the comparison."""
    w = _lr_weights(spark, sf_dir)
    return local_df(
        spark, [tuple(w)], "w0 double, w1 double, w2 double, w3 double"
    )


def q_quality_lr_score(spark, sf_dir):
    """Inference for the in-engine classifier: score every document with
    the weights q_quality_lr_train just learned (the 4 floats ride along
    as literals — no join), completing the train -> score loop a
    quality-filtering pipeline runs before a corpus cut. One pass, pure
    column math."""
    w = _lr_weights(spark, sf_dir)
    feats = _lr_feats_cached(spark, sf_dir)
    z = (
        F.col("x0") * w[0]
        + F.col("x1") * w[1]
        + F.col("x2") * w[2]
        + F.col("x3") * w[3]
    )
    return feats.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("quality_p"),
    )


def q_corpus_gini(spark, sf_dir):
    """Source-concentration Gini coefficient over per-source token mass
    (the governance dial for 'is the corpus dominated by one crawl?').
    G = sum_i (2i - n - 1) w_i / (n sum w) with sources ranked by
    weight. Hash-proof output (the r05 driver red row was a rounded
    DOUBLE crossing the hash): emits the EXACT integer pair
    (gini_num, gini_den) plus gini_ppm = (1e6*num) div den — every
    column BIGINT, integer arithmetic end to end, so no float ever
    crosses the comparison hash (same discipline as graph_pagerank's
    fixed-point ranks). The ranked frame is per-source (tiny); the
    only corpus-scale work is one token count."""
    from pyspark.sql.window import Window

    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    per_src = (
        docs.select("source", F.size(tokens_col("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("w"))
    )
    w = Window.orderBy("w", "source")
    ranked = per_src.select(
        "source",
        "w",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_sources"),
        F.sum("w").alias("total_tokens"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("w"))
        .cast("bigint")
        .alias("gini_num"),
        (F.max("n") * F.sum("w")).cast("bigint").alias("gini_den"),
    ).selectExpr(
        "n_sources",
        "total_tokens",
        "gini_num",
        "gini_den",
        "(1000000 * gini_num) div gini_den as gini_ppm",
    )


def q_corpus_dsir(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, 'Data Selection for
    Language Models via Importance Resampling'): hash unigrams into 64
    buckets, estimate target (lang='en') and raw token distributions
    with add-one smoothing, and score each document by the mean
    log-ratio of its tokens' buckets. Both distributions come out of
    ONE tiny 64-row conditional aggregate broadcast into the per-token
    scoring pass — two corpus passes total, and the corpus never
    shuffles on anything wider than doc_id."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        % 64
    )
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens_col("text")).alias("token")
    ).withColumn("b", bucket)
    # ONE tokenize+aggregate pass yields both distributions and (by
    # summing the 64 collected rows driver-side) both token totals —
    # the previous shape ran FIVE full tokenize passes over the corpus
    # (raw agg, tgt agg, two bare counts, scoring pass; guide §1.2/§2.3:
    # remove passes, aggregate before shuffling). The conditional sum
    # equals the old filter+left-join+fillna(0) exactly: a bucket with
    # no 'en' tokens sums to 0, and every bucket present in raw is
    # present in the groupBy. The log-ratio stays a SPARK expression
    # with the same literals, so every double is bit-identical.
    agged = toks.groupBy("b").agg(
        F.count("*").alias("c_raw"),
        F.sum((F.col("lang") == "en").cast("long")).alias("c_tgt"),
    ).localCheckpoint(eager=False)
    rows = agged.collect()
    n_raw = sum(r.c_raw for r in rows)
    n_tgt = sum(r.c_tgt for r in rows)
    dist = agged.select(
        "b",
        (
            F.log((F.col("c_tgt") + 1) / F.lit(float(n_tgt + 64)))
            - F.log((F.col("c_raw") + 1) / F.lit(float(n_raw + 64)))
        ).alias("logratio"),
    )
    return (
        toks.join(F.broadcast(dist), "b")
        .groupBy("doc_id")
        # + 0.0 canonicalizes IEEE -0.0 (a doc whose buckets cancel
        # exactly rounds to -0.0 in Spark but 0.0 in DuckDB)
        .agg((F.round(F.avg("logratio"), 6) + F.lit(0.0)).alias("dsir_weight"))
    )


def q_quality_calibration(spark, sf_dir):
    """Calibration audit of the in-engine LR quality classifier: decile
    bucket of quality_lr_score's probability vs the realized label rate
    (lang == 'en', the training target). A well-calibrated classifier
    has pos_rate tracking mean_p per bucket — this is the reliability
    diagram a pipeline inspects before trusting the scores for a corpus
    cut. One join of the scored frame with the label column plus one
    hash-agg; the scores themselves come from the exact train+score
    loop quality_lr_train/score already gate."""
    scored = q_quality_lr_score(spark, sf_dir)
    labels = _docs(spark, sf_dir).select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    return (
        scored.join(labels, "doc_id")
        .groupBy(
            F.least(F.floor(F.col("quality_p") * 10), F.lit(9))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.avg("quality_p"), 6).alias("mean_p"),
            F.round(F.avg("y"), 6).alias("pos_rate"),
        )
    )


def q_corpus_funnel(spark, sf_dir):
    """The corpus-cut funnel a training pipeline reports before a run:
    how many documents survive each successive stage — exact dedup
    (md5-group min-id), near-dup dedup (LSH cluster survivors),
    quality heuristics (doc_quality keep), and decontamination (no
    benchmark 4-gram overlap, the doc_score convention). Every flag is
    a doc_id-keyed LEFT join of the shared frames the individual gated
    queries already build, folded into ONE conditional aggregation and
    unpivoted with stack() — a single pass over the flag frame, no
    per-stage rescans, the 100 TB-sane funnel shape."""
    from ..ops.dedup import contamination_check_grams
    from ..ops.text import doc_quality

    docs = _docs(spark, sf_dir)
    surv_e = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("f_exact"))
    )
    near = (
        _clusters_cached(spark, sf_dir)
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .select("doc_id", F.lit(True).alias("f_near"))
    )
    q = doc_quality(docs).select("doc_id", F.col("keep").alias("f_keep"))
    g4 = _grams4_cached(spark, sf_dir)
    cont = contamination_check_grams(
        g4.filter(F.col("doc_id") >= 5), g4.filter(F.col("doc_id") < 5)
    ).select("doc_id", F.lit(True).alias("f_cont"))
    fl = (
        docs.select("doc_id")
        .join(surv_e, "doc_id", "left")
        .join(near, "doc_id", "left")
        .join(q, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            F.coalesce("f_exact", F.lit(False)).alias("f_exact"),
            F.coalesce("f_near", F.lit(False)).alias("f_near"),
            F.coalesce("f_keep", F.lit(False)).alias("f_keep"),
            F.coalesce("f_cont", F.lit(False)).alias("f_cont"),
        )
    )
    one = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    a = fl.agg(
        F.count("*").cast("bigint").alias("total"),
        one(F.col("f_exact")).alias("n_exact"),
        one(F.col("f_exact") & F.col("f_near")).alias("n_near"),
        one(F.col("f_exact") & F.col("f_near") & F.col("f_keep")).alias(
            "n_quality"
        ),
        one(
            F.col("f_exact")
            & F.col("f_near")
            & F.col("f_keep")
            & ~F.col("f_cont")
        ).alias("n_clean"),
    )
    for c in ("total", "n_exact", "n_near", "n_quality", "n_clean"):
        # try_divide: an empty corpus has total = 0 and must report a
        # NULL pct, not raise under ANSI mode
        a = a.withColumn(
            f"p_{c}",
            F.round(F.try_divide(F.col(c), F.col("total").cast("double")), 6),
        )
    return a.select(
        F.expr(
            "stack(5,"
            " 'total', total, p_total,"
            " 'exact_dedup', n_exact, p_n_exact,"
            " 'near_dedup', n_near, p_n_near,"
            " 'quality', n_quality, p_n_quality,"
            " 'decontaminated', n_clean, p_n_clean"
            ") as (stage, n_docs, pct)"
        )
    )


def q_corpus_jackknife_ci(spark, sf_dir):
    """Uncertainty quantification for a corpus statistic: the mean
    document length (n_chars) with a delete-one-group jackknife
    standard error over 32 deterministic md5 buckets. Each leave-out
    estimate is closed-form from the per-bucket (sum, count) — ONE
    32-row aggregate leaves the corpus scan, everything after is
    driver-scale arithmetic kept distributed as a second tiny agg.
    The practical answer to 'how sure are we of this corpus metric'
    without any nondeterministic resampling."""
    docs = _docs(spark, sf_dir).select(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
            ).cast("int"),
            F.lit(32),
        ).alias("bucket"),
        F.col("n_chars").cast("double").alias("x"),
    )
    per_bucket = docs.groupBy("bucket").agg(
        F.sum("x").alias("t"), F.count("*").alias("n")
    )
    tot = per_bucket.agg(
        F.sum("t").alias("tt"), F.sum("n").alias("nn"), F.count("*").alias("bb")
    )
    j = per_bucket.crossJoin(F.broadcast(tot))
    # try_divide: a degenerate single-bucket corpus (nn == n) must yield
    # NULL estimates, not raise under ANSI mode
    theta_i = F.try_divide(F.col("tt") - F.col("t"), F.col("nn") - F.col("n"))
    stats = j.agg(
        F.max("nn").cast("bigint").alias("n_docs"),
        F.max("bb").cast("bigint").alias("n_buckets"),
        F.round(F.max(F.try_divide(F.col("tt"), F.col("nn"))), 6).alias(
            "mean_nchars"
        ),
        F.sum(theta_i).alias("_st"),
        F.sum(theta_i * theta_i).alias("_st2"),
    )
    b = F.col("n_buckets")
    var = (b - 1) / b * (F.col("_st2") - F.col("_st") * F.col("_st") / b)
    se = F.sqrt(var)
    return stats.select(
        "n_docs",
        "n_buckets",
        "mean_nchars",
        F.round(se, 6).alias("jackknife_se"),
        F.round(F.col("mean_nchars") - 1.96 * se, 6).alias("ci_lo"),
        F.round(F.col("mean_nchars") + 1.96 * se, 6).alias("ci_hi"),
    )
QUERIES["corpus_health"] = q_corpus_health
QUERIES["corpus_contam_overlap"] = q_corpus_contam_overlap
QUERIES["chunk_packing"] = q_chunk_packing
QUERIES["vocab_top_bigrams"] = q_vocab_top_bigrams
QUERIES["corpus_mixture"] = q_corpus_mixture
QUERIES["corpus_token_budget"] = q_corpus_token_budget
QUERIES["vocab_countmin"] = q_vocab_countmin
QUERIES["retrieval_bm25"] = q_retrieval_bm25
QUERIES["vocab_postings"] = q_vocab_postings
QUERIES["corpus_temperature"] = q_corpus_temperature
QUERIES["corpus_dsir"] = q_corpus_dsir
QUERIES["corpus_gini"] = q_corpus_gini
QUERIES["quality_lr_train"] = q_quality_lr_train
QUERIES["quality_lr_score"] = q_quality_lr_score
ORACLES["chunk_packing"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
c AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t), 12)) AS s FROM d
),
ch AS (
  SELECT doc_id, CAST((s - 1) / 12 AS BIGINT) AS chunk_id,
         CAST(len(list_slice(t, s, s + 15)) AS BIGINT) AS n_tokens
  FROM c
),
b AS (
  SELECT doc_id, chunk_id, n_tokens,
         ('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS bucket
  FROM ch
)
SELECT doc_id, chunk_id, n_tokens, bucket,
       CAST((sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id, chunk_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 64 AS BIGINT) AS bin
FROM b
"""
)
ORACLES["corpus_mixture"] = (
f"""
WITH s AS (
  SELECT source,
         ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS t
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n
FROM s
WHERE t < CASE source
            WHEN 'src0' THEN {int(1.0 * 2**32)}
            WHEN 'src1' THEN {int(0.5 * 2**32)}
            WHEN 'src2' THEN {int(0.1 * 2**32)}
            ELSE {int(0.25 * 2**32)} END
GROUP BY source
"""
)
ORACLES["vocab_top_bigrams"] = (
"""
WITH d AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
g AS (
  SELECT unnest(CASE WHEN len(t) < 2 THEN [COALESCE(array_to_string(t, ' '), '')]
         ELSE list_transform(generate_series(1, len(t) - 1),
                             i -> array_to_string(list_slice(t, i, i + 1), ' '))
         END) AS ngram
  FROM d
)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
"""
)
ORACLES["vocab_countmin"] = (
"""
WITH t AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
counts AS (SELECT token, count(*) AS c FROM t GROUP BY token),
rows_(r) AS (VALUES (0), (1), (2), (3)),
cells AS (
  SELECT r AS row,
         ('0x' || substr(md5(r || ':' || token), 1, 7))::BIGINT % 256 AS col,
         c
  FROM counts CROSS JOIN rows_
)
SELECT CAST(row AS BIGINT) AS row, col, CAST(sum(c) AS BIGINT) AS total
FROM cells GROUP BY 1, 2
"""
)
ORACLES["corpus_token_budget"] = (
"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
         md5('budget:' || CAST(doc_id AS VARCHAR)) AS ticket
  FROM documents
),
s AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY ticket
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM s WHERE cum_tokens <= 600
"""
)
ORACLES["retrieval_bm25"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM t
  WHERE token IN ('table', 'join', 'window') GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         ln(1.0::DOUBLE + (st.nd - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE))
         * (tf.tf * 2.2::DOUBLE)
         / (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + (0.75::DOUBLE * dl.dl) / st.avgdl)) AS contrib
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id), st
)
SELECT doc_id, round(sum(contrib), 6) AS bm25, CAST(count(*) AS BIGINT) AS n_terms_hit
FROM sc GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20
"""
)
ORACLES["vocab_postings"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
tf AS (SELECT token, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
stats AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY 1
),
rk AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rn
  FROM tf
),
top AS (SELECT token, doc_id AS top_doc_id, CAST(tf AS BIGINT) AS top_tf FROM rk WHERE rn = 1)
SELECT s.token, s.df, s.total_tf, top.top_doc_id, top.top_tf
FROM stats s JOIN top USING (token)
ORDER BY s.df DESC, s.token LIMIT 50
"""
)
ORACLES["corpus_temperature"] = (
"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
m AS (SELECT min(n) AS nmin FROM c),
r AS (
  SELECT c.lang,
         CAST(floor(sqrt(m.nmin::DOUBLE / c.n) * 4294967296.0::DOUBLE) AS BIGINT) AS cut
  FROM c, m
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
FROM documents d JOIN r USING (lang)
WHERE ('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < r.cut
GROUP BY 1
"""
)
ORACLES["corpus_dsir"] = (
"""
WITH tk AS (
  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
tb AS (
  SELECT doc_id, lang, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS b FROM tk
),
raw AS (SELECT b, count(*) AS c_raw FROM tb GROUP BY 1),
tgt AS (SELECT b, count(*) AS c_tgt FROM tb WHERE lang = 'en' GROUP BY 1),
n AS (
  SELECT (SELECT count(*) FROM tb) AS n_raw,
         (SELECT count(*) FROM tb WHERE lang = 'en') AS n_tgt
),
dist AS (
  SELECT r.b,
         ln((coalesce(t.c_tgt, 0) + 1) / (n.n_tgt + 64))
         - ln((r.c_raw + 1) / (n.n_raw + 64)) AS logratio
  FROM raw r LEFT JOIN tgt t USING (b), n
)
SELECT tb.doc_id, round(avg(dist.logratio), 6) + 0.0 AS dsir_weight
FROM tb JOIN dist USING (b)
GROUP BY tb.doc_id
"""
)
ORACLES["corpus_gini"] = (
"""
WITH per_src AS (
  SELECT source, sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS w
  FROM documents GROUP BY source
),
ranked AS (
  SELECT source, w, row_number() OVER (ORDER BY w, source) AS i,
         count(*) OVER () AS n
  FROM per_src
)
SELECT CAST(max(n) AS BIGINT) AS n_sources,
       CAST(sum(w) AS BIGINT) AS total_tokens,
       CAST(sum((2 * i - n - 1) * w) AS BIGINT) AS gini_num,
       CAST(max(n) * sum(w) AS BIGINT) AS gini_den,
       CAST((1000000 * CAST(sum((2 * i - n - 1) * w) AS BIGINT))
            // CAST(max(n) * sum(w) AS BIGINT) AS BIGINT) AS gini_ppm
FROM ranked
"""
)
ORACLES["quality_lr_train"] = (
"""
WITH t AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id, y, 1.0 AS x0, len(toks) / 100.0 AS x1,
         CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'for', 'on'], x))) AS DOUBLE) / len(toks) AS x2,
         (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)) / 10.0 AS x3
  FROM t WHERE len(toks) > 0
),
w1 AS (
  SELECT 0.0 - avg(x0 * (0.5 - y)) AS w0,
         0.0 - avg(x1 * (0.5 - y)) AS w1,
         0.0 - avg(x2 * (0.5 - y)) AS w2,
         0.0 - avg(x3 * (0.5 - y)) AS w3
  FROM f
),
w2 AS (
  SELECT w1.w0 - avg(x0 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w0,
         w1.w1 - avg(x1 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w1,
         w1.w2 - avg(x2 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w2,
         w1.w3 - avg(x3 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w3
  FROM f, w1 GROUP BY w1.w0, w1.w1, w1.w2, w1.w3
),
w3 AS (
  SELECT w2.w0 - avg(x0 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w0,
         w2.w1 - avg(x1 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w1,
         w2.w2 - avg(x2 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w2,
         w2.w3 - avg(x3 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w3
  FROM f, w2 GROUP BY w2.w0, w2.w1, w2.w2, w2.w3
)
SELECT round(w0, 6) AS w0, round(w1, 6) AS w1,
       round(w2, 6) AS w2, round(w3, 6) AS w3
FROM w3
"""
)
ORACLES["quality_lr_score"] = (
"""
WITH t AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id, y, 1.0 AS x0, len(toks) / 100.0 AS x1,
         CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'to', 'and', 'in', 'is', 'it', 'for', 'on'], x))) AS DOUBLE) / len(toks) AS x2,
         (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)) / 10.0 AS x3
  FROM t WHERE len(toks) > 0
),
w1 AS (
  SELECT 0.0 - avg(x0 * (0.5 - y)) AS w0,
         0.0 - avg(x1 * (0.5 - y)) AS w1,
         0.0 - avg(x2 * (0.5 - y)) AS w2,
         0.0 - avg(x3 * (0.5 - y)) AS w3
  FROM f
),
w2 AS (
  SELECT w1.w0 - avg(x0 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w0,
         w1.w1 - avg(x1 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w1,
         w1.w2 - avg(x2 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w2,
         w1.w3 - avg(x3 * (1.0/(1.0+exp(-(x0*w1.w0 + x1*w1.w1 + x2*w1.w2 + x3*w1.w3))) - y)) AS w3
  FROM f, w1 GROUP BY w1.w0, w1.w1, w1.w2, w1.w3
),
w3 AS (
  SELECT w2.w0 - avg(x0 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w0,
         w2.w1 - avg(x1 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w1,
         w2.w2 - avg(x2 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w2,
         w2.w3 - avg(x3 * (1.0/(1.0+exp(-(x0*w2.w0 + x1*w2.w1 + x2*w2.w2 + x3*w2.w3))) - y)) AS w3
  FROM f, w2 GROUP BY w2.w0, w2.w1, w2.w2, w2.w3
)
SELECT f.doc_id,
       round(1.0/(1.0+exp(-(f.x0*w3.w0 + f.x1*w3.w1 + f.x2*w3.w2 + f.x3*w3.w3))), 6) AS quality_p
FROM f, (SELECT round(w0, 6) AS w0, round(w1, 6) AS w1,
                round(w2, 6) AS w2, round(w3, 6) AS w3 FROM w3) w3
"""
)
ORACLES["corpus_contam_overlap"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         COALESCE(CASE WHEN len(t) < 4 THEN array_to_string(t, ' ')
              ELSE array_to_string(list_slice(t, i, i + 3), ' ') END, '') AS gram
  FROM d, unnest(generate_series(1, greatest(1, len(t) - 3))) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
shared AS (
  SELECT c.doc_id AS corpus_doc, e.doc_id AS eval_doc, count(*) AS n_shared
  FROM g c JOIN g e ON c.gram = e.gram
  WHERE c.doc_id >= 5 AND e.doc_id < 5
  GROUP BY 1, 2
)
SELECT s.corpus_doc, s.eval_doc, CAST(s.n_shared AS BIGINT) AS n_shared,
       round(s.n_shared / CAST(na.n + nb.n - s.n_shared AS DOUBLE), 4)
         AS gram_jaccard
FROM shared s
JOIN sizes na ON na.doc_id = s.corpus_doc
JOIN sizes nb ON nb.doc_id = s.eval_doc
ORDER BY n_shared DESC, corpus_doc, eval_doc
LIMIT 20
"""
)
ORACLES["corpus_health"] = (
_PAIRS_CTE + """,
base AS (SELECT doc_id, len(t) AS n_tok FROM d),
fpv AS (
  SELECT doc_id, md5(COALESCE(array_to_string(list_sort(list_distinct(t)), ' '), '')) AS fp
  FROM d
),
dup AS (
  SELECT coalesce(sum(n), 0) AS exact_dup_docs
  FROM (SELECT fp, count(*) AS n FROM fpv GROUP BY fp HAVING count(*) >= 2)
),
cand AS (
  SELECT count(*) AS neardup_candidate_docs
  FROM (SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b AS doc_id FROM pairs))
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
ls AS (
  SELECT doc_id,
       sum(CASE WHEN token IN ('the', 'a', 'of', 'to', 'and', 'is', 'in', 'it') THEN 1 ELSE 0 END) AS s_en,
       sum(CASE WHEN token IN ('el', 'la', 'de', 'que', 'y', 'en', 'un', 'es') THEN 1 ELSE 0 END) AS s_es,
       sum(CASE WHEN token IN ('der', 'die', 'das', 'und', 'ist', 'von', 'ein', 'mit') THEN 1 ELSE 0 END) AS s_de,
       sum(CASE WHEN token IN ('le', 'la', 'les', 'et', 'de', 'un', 'est', 'dans') THEN 1 ELSE 0 END) AS s_fr,
       sum(CASE WHEN token IN ('de5', 'shi4', 'le5', 'zai4', 'you3', 'he2', 'wo3', 'ta1') THEN 1 ELSE 0 END) AS s_zh
  FROM tok WHERE token <> '' GROUP BY doc_id
),
und AS (
  SELECT sum(CASE WHEN NOT (
           (s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh)
        OR (s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh)
        OR (s_de > 0 AND s_de >= s_fr AND s_de >= s_zh)
        OR (s_fr > 0 AND s_fr >= s_zh)
        OR (s_zh > 0)
      ) THEN 1 ELSE 0 END) AS n_und
  FROM ls
),
tot AS (
  SELECT count(*) AS n_docs, sum(n_tok) AS n_tokens,
         round(avg(n_tok), 4) AS mean_doc_tokens
  FROM base
)
SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
       CAST(tot.n_tokens AS BIGINT) AS n_tokens,
       tot.mean_doc_tokens,
       CAST(dup.exact_dup_docs AS BIGINT) AS exact_dup_docs,
       round(dup.exact_dup_docs / CAST(greatest(tot.n_docs, 1) AS DOUBLE), 6) AS exact_dup_ratio,
       CAST(cand.neardup_candidate_docs AS BIGINT) AS neardup_candidate_docs,
       round(cand.neardup_candidate_docs / CAST(greatest(tot.n_docs, 1) AS DOUBLE), 6) AS neardup_candidate_ratio,
       CAST(und.n_und AS BIGINT) AS lang_und_docs,
       round(und.n_und / CAST(greatest(tot.n_docs, 1) AS DOUBLE), 6) AS lang_und_ratio
FROM tot, dup, cand, und
"""
)
QUERIES["quality_calibration"] = q_quality_calibration

QUERIES["corpus_funnel"] = q_corpus_funnel
QUERIES["corpus_jackknife_ci"] = q_corpus_jackknife_ci

ORACLES["corpus_jackknife_ci"] = """
WITH d AS (
  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 32 AS bucket,
         CAST(n_chars AS DOUBLE) AS x
  FROM documents
),
pb AS (SELECT bucket, sum(x) AS t, count(*) AS n FROM d GROUP BY bucket),
tot AS (SELECT sum(t) AS tt, sum(n) AS nn, count(*) AS bb FROM pb),
j AS (
  SELECT pb.t, pb.n, tot.tt, tot.nn, tot.bb,
         (tot.tt - pb.t) / (tot.nn - pb.n) AS theta
  FROM pb, tot
),
st AS (
  SELECT CAST(max(nn) AS BIGINT) AS n_docs, CAST(max(bb) AS BIGINT) AS n_buckets,
         round(max(tt / nn), 6) AS mean_nchars,
         sum(theta) AS s1, sum(theta * theta) AS s2
  FROM j
)
SELECT n_docs, n_buckets, mean_nchars,
       round(sqrt((n_buckets - 1) / CAST(n_buckets AS DOUBLE)
                  * (s2 - s1 * s1 / n_buckets)), 6) AS jackknife_se,
       round(mean_nchars - 1.96 * sqrt((n_buckets - 1) / CAST(n_buckets AS DOUBLE)
                  * (s2 - s1 * s1 / n_buckets)), 6) AS ci_lo,
       round(mean_nchars + 1.96 * sqrt((n_buckets - 1) / CAST(n_buckets AS DOUBLE)
                  * (s2 - s1 * s1 / n_buckets)), 6) AS ci_hi
FROM st
"""

ORACLES["corpus_funnel"] = _PAIRS_CTE.replace("WITH", "WITH RECURSIVE", 1) + """,
e AS (
  SELECT doc_a AS s, doc_b AS dd FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
r AS (
  SELECT doc_id AS node, doc_id AS reach FROM documents
  UNION
  SELECT r.node, e.dd FROM r JOIN e ON r.reach = e.s
),
lab AS (SELECT node, min(reach) AS cluster_id FROM r GROUP BY node),
near AS (SELECT node AS doc_id FROM lab WHERE cluster_id = node),
ex AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
tq AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS toks
  FROM documents
),
q AS (
  SELECT doc_id,
         (CAST(len(toks) AS BIGINT) >= 5
          AND round(CAST(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$'))) AS DOUBLE)
                    / greatest(len(toks), 1), 6) <= 0.3
          AND round(CAST(len(list_filter(toks, x -> lower(x) IN (STOPS_PLACEHOLDER))) AS DOUBLE)
                    / greatest(len(toks), 1), 6) >= 0.01) AS keep
  FROM tq
),
g4 AS (
  SELECT doc_id, unnest(CASE WHEN len(t) < 4 THEN [COALESCE(array_to_string(t, ' '), '')]
         ELSE list_transform(generate_series(1, len(t) - 3),
                             i -> array_to_string(list_slice(t, i, i + 3), ' '))
         END) AS gram
  FROM d
),
block AS (SELECT DISTINCT gram FROM g4 WHERE doc_id < 5),
cont AS (
  SELECT DISTINCT g4.doc_id FROM g4 JOIN block USING (gram) WHERE g4.doc_id >= 5
),
fl AS (
  SELECT dd.doc_id,
         (ex.doc_id IS NOT NULL) AS f_exact,
         (near.doc_id IS NOT NULL) AS f_near,
         COALESCE(q.keep, false) AS f_keep,
         (cont.doc_id IS NOT NULL) AS f_cont
  FROM documents dd
  LEFT JOIN ex ON ex.doc_id = dd.doc_id
  LEFT JOIN near ON near.doc_id = dd.doc_id
  LEFT JOIN q ON q.doc_id = dd.doc_id
  LEFT JOIN cont ON cont.doc_id = dd.doc_id
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN f_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN f_exact AND f_near THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
         CAST(sum(CASE WHEN f_exact AND f_near AND f_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(sum(CASE WHEN f_exact AND f_near AND f_keep AND NOT f_cont THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
  FROM fl
)
SELECT 'total' AS stage, total AS n_docs, round(total / CAST(total AS DOUBLE), 6) AS pct FROM a
UNION ALL SELECT 'exact_dedup', n_exact, round(n_exact / CAST(total AS DOUBLE), 6) FROM a
UNION ALL SELECT 'near_dedup', n_near, round(n_near / CAST(total AS DOUBLE), 6) FROM a
UNION ALL SELECT 'quality', n_quality, round(n_quality / CAST(total AS DOUBLE), 6) FROM a
UNION ALL SELECT 'decontaminated', n_clean, round(n_clean / CAST(total AS DOUBLE), 6) FROM a
""".replace("STOPS_PLACEHOLDER", _STOP_SQL)

# calibration composes the already-gated score oracle verbatim, so the
# audited scores can never drift from the gated classifier
ORACLES["quality_calibration"] = f"""
WITH scored AS ({ORACLES["quality_lr_score"].strip()})
SELECT CAST(least(floor(quality_p * 10), 9) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(quality_p), 6) AS mean_p,
       round(avg(CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS pos_rate
FROM scored JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_corpus_js_drift(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-SOURCE token
    distributions over 64 hashed unigram buckets (the DSIR hashing
    discipline) with +0.5 Laplace smoothing (the PSI discipline) — the
    symmetric, bounded [0, ln 2] drift matrix a corpus owner reads
    before mixing crawls. One token-explode scan -> a (source x 64)
    aggregate; everything after the first groupBy is tiny (n_sources x
    64 rows), so the pair join is a broadcast self-join, never a
    corpus shuffle."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        % 64
    )
    counts = (
        docs.select("source", F.explode(tokens_col("text")).alias("token"))
        .withColumn("b", bucket)
        .groupBy("source", "b")
        .agg(F.count("*").alias("c"))
        # barrier: five consumers (sources, grid join, totals, both pair
        # sides) re-derived the corpus explode 8x without it — the
        # (sources x 64)-row result materializes once, EAGERLY, so every
        # consumer plans against the tiny RDD scan (plan-guarded).
        # eager is load-bearing here: with eager=False the unmaterialized
        # blocks sit under broadcast/nested-loop consumers that recompute
        # the corpus explode per reference (measured 1.3s -> 52s)
        .localCheckpoint()
    )
    # densify: every (source, bucket) cell exists so smoothing is uniform
    sources = counts.select("source").distinct()
    grid = sources.crossJoin(
        spark.range(64).select(F.col("id").alias("b"))
    )
    dense = grid.join(counts, ["source", "b"], "left").fillna(0, ["c"])
    tot = dense.groupBy("source").agg(F.sum("c").alias("n_tok"))
    p = dense.join(F.broadcast(tot), "source").select(
        "source", "b",
        ((F.col("c") + F.lit(0.5)) / (F.col("n_tok") + F.lit(32.0))).alias("p"),
    )
    a = p.select(
        F.col("source").alias("source_a"), "b", F.col("p").alias("pa")
    )
    bb = p.select(
        F.col("source").alias("source_b"), "b", F.col("p").alias("pb")
    )
    cells = (
        a.join(F.broadcast(bb), "b")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a", "source_b",
            (
                F.lit(0.5) * F.col("pa")
                * F.log(F.col("pa") / ((F.col("pa") + F.col("pb")) / 2))
                + F.lit(0.5) * F.col("pb")
                * F.log(F.col("pb") / ((F.col("pa") + F.col("pb")) / 2))
            ).alias("term"),
        )
    )
    return cells.groupBy("source_a", "source_b").agg(
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("js_divergence")
    )
QUERIES["corpus_js_drift"] = q_corpus_js_drift

ORACLES["corpus_js_drift"] = """
WITH tok AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
counts AS (
  SELECT source, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS b,
         count(*) AS c
  FROM tok GROUP BY 1, 2
),
grid AS (
  SELECT s.source, g.b
  FROM (SELECT DISTINCT source FROM counts) s,
       (SELECT unnest(generate_series(0, 63)) AS b) g
),
dense AS (
  SELECT grid.source, grid.b, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts USING (source, b)
),
tot AS (SELECT source, sum(c) AS n_tok FROM dense GROUP BY source),
p AS (
  SELECT dense.source, dense.b,
         (dense.c + 0.5) / (tot.n_tok + 32.0) AS p
  FROM dense JOIN tot USING (source)
),
cells AS (
  SELECT a.source AS source_a, b2.source AS source_b,
         0.5 * a.p * ln(a.p / ((a.p + b2.p) / 2))
         + 0.5 * b2.p * ln(b2.p / ((a.p + b2.p) / 2)) AS term
  FROM p a JOIN p b2 ON a.b = b2.b AND a.source < b2.source
)
SELECT source_a, source_b, round(sum(term), 6) + 0.0 AS js_divergence
FROM cells GROUP BY 1, 2
"""


def q_corpus_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language: characters and UTF-8 bytes
    per BPE-ish token — the dial that prices a multilingual corpus in
    compute terms (a language at 6 bytes/token costs 2x the training
    steps per byte of one at 3). One scan, per-doc array counts (no
    explode), a 5-row aggregate; exact integer sums divided once."""
    from ..ops.text import bpe_tokens_col

    docs = _docs(spark, sf_dir)
    per = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("_chars"),
        F.octet_length("text").cast("bigint").alias("_bytes"),
        F.size(bpe_tokens_col("text")).cast("bigint").alias("_toks"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_toks").cast("bigint").alias("n_tokens"),
        F.round(F.expr("try_divide(sum(_chars), sum(_toks))"), 6).alias(
            "chars_per_token"
        ),
        F.round(F.expr("try_divide(sum(_bytes), sum(_toks))"), 6).alias(
            "bytes_per_token"
        ),
    )
QUERIES["corpus_tokenizer_fertility"] = q_corpus_tokenizer_fertility

ORACLES["corpus_tokenizer_fertility"] = r"""
WITH per AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       round(sum(chars) / CAST(NULLIF(sum(toks), 0) AS DOUBLE), 6) AS chars_per_token,
       round(sum(bytes) / CAST(NULLIF(sum(toks), 0) AS DOUBLE), 6) AS bytes_per_token
FROM per GROUP BY lang
"""



def q_corpus_signal_corr(spark, sf_dir):
    """Pearson correlation matrix between per-document INTEGER quality
    signals (n_chars, n_tokens, n_types, LSH dup_degree) — the
    cross-signal audit that answers "is my dedup just re-measuring
    length?" before anyone tunes thresholds. Every moment (sum, sum of
    squares, cross products) is an exact integer aggregate — order-
    independent under any shuffle, the graph_pagerank discipline — and
    the single float expression per pair runs on identical operands in
    both engines. ONE distributed aggregate; the 6-row matrix unpivots
    with stack(). (At 100 TB the BIGINT moments upgrade to decimal
    sums; the shape is unchanged.)"""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    pairs = _minhash_pairs_cached(spark, sf_dir)
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("deg"))
    )
    toks = tokens_col("text")
    sig = (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("s_chars"),
            F.size(toks).cast("bigint").alias("s_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("s_types"),
        )
        .join(F.broadcast(deg), "doc_id", "left")
        .withColumn("s_deg", F.coalesce(F.col("deg"), F.lit(0)).cast("bigint"))
    )
    names = ["s_chars", "s_tokens", "s_types", "s_deg"]
    aggs = [F.count("*").alias("n")]
    for s in names:
        aggs.append(F.sum(s).alias(f"sum_{s}"))
        aggs.append(F.sum(F.col(s) * F.col(s)).alias(f"sq_{s}"))
    combos = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1:]
    ]
    for a, b in combos:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"xy_{a}_{b}"))
    m = sig.agg(*aggs)

    def corr_expr(a, b):
        n = "CAST(n AS DOUBLE)"
        sx, sy = f"CAST(sum_{a} AS DOUBLE)", f"CAST(sum_{b} AS DOUBLE)"
        sx2, sy2 = f"CAST(sq_{a} AS DOUBLE)", f"CAST(sq_{b} AS DOUBLE)"
        sxy = f"CAST(xy_{a}_{b} AS DOUBLE)"
        return (
            f"round(({n} * {sxy} - {sx} * {sy}) / "
            f"(sqrt({n} * {sx2} - {sx} * {sx})"
            f" * sqrt({n} * {sy2} - {sy} * {sy})), 6) + 0.0"
        )

    stack_args = ", ".join(
        f"'{a[2:]}~{b[2:]}', {corr_expr(a, b)}" for a, b in combos
    )
    return m.selectExpr(
        f"stack({len(combos)}, {stack_args}) AS (signal_pair, pearson_r)"
    )


QUERIES["corpus_signal_corr"] = q_corpus_signal_corr

ORACLES["corpus_signal_corr"] = _PAIRS_CTE + """,
deg AS (
  SELECT doc_id, count(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL
    SELECT doc_b AS doc_id FROM pairs
  ) GROUP BY doc_id
),
sg AS (
  SELECT d.doc_id,
         CAST(d.n_chars AS BIGINT) AS s_chars,
         CAST(len(list_filter(string_split(d.text, ' '), t -> t <> '')) AS BIGINT) AS s_tokens,
         CAST(len(list_distinct(list_filter(string_split(d.text, ' '), t -> t <> ''))) AS BIGINT) AS s_types,
         CAST(COALESCE(deg.deg, 0) AS BIGINT) AS s_deg
  FROM documents d LEFT JOIN deg USING (doc_id)
),
m AS (
  SELECT count(*) AS n,
         sum(s_chars) AS sum_chars, sum(s_chars * s_chars) AS sq_chars,
         sum(s_tokens) AS sum_tokens, sum(s_tokens * s_tokens) AS sq_tokens,
         sum(s_types) AS sum_types, sum(s_types * s_types) AS sq_types,
         sum(s_deg) AS sum_deg, sum(s_deg * s_deg) AS sq_deg,
         sum(s_chars * s_tokens) AS xy_chars_tokens,
         sum(s_chars * s_types) AS xy_chars_types,
         sum(s_chars * s_deg) AS xy_chars_deg,
         sum(s_tokens * s_types) AS xy_tokens_types,
         sum(s_tokens * s_deg) AS xy_tokens_deg,
         sum(s_types * s_deg) AS xy_types_deg
  FROM sg
)
SELECT 'chars~tokens' AS signal_pair,
       round((CAST(n AS DOUBLE) * CAST(xy_chars_tokens AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_tokens AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_chars AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_chars AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_tokens AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_tokens AS DOUBLE))), 6) + 0.0 AS pearson_r
FROM m
UNION ALL
SELECT 'chars~types',
       round((CAST(n AS DOUBLE) * CAST(xy_chars_types AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_types AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_chars AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_chars AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_types AS DOUBLE) - CAST(sum_types AS DOUBLE) * CAST(sum_types AS DOUBLE))), 6) + 0.0
FROM m
UNION ALL
SELECT 'chars~deg',
       round((CAST(n AS DOUBLE) * CAST(xy_chars_deg AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_deg AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_chars AS DOUBLE) - CAST(sum_chars AS DOUBLE) * CAST(sum_chars AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_deg AS DOUBLE) - CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE))), 6) + 0.0
FROM m
UNION ALL
SELECT 'tokens~types',
       round((CAST(n AS DOUBLE) * CAST(xy_tokens_types AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_types AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_tokens AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_tokens AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_types AS DOUBLE) - CAST(sum_types AS DOUBLE) * CAST(sum_types AS DOUBLE))), 6) + 0.0
FROM m
UNION ALL
SELECT 'tokens~deg',
       round((CAST(n AS DOUBLE) * CAST(xy_tokens_deg AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_deg AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_tokens AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_tokens AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_deg AS DOUBLE) - CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE))), 6) + 0.0
FROM m
UNION ALL
SELECT 'types~deg',
       round((CAST(n AS DOUBLE) * CAST(xy_types_deg AS DOUBLE) - CAST(sum_types AS DOUBLE) * CAST(sum_deg AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE) * CAST(sq_types AS DOUBLE) - CAST(sum_types AS DOUBLE) * CAST(sum_types AS DOUBLE)) * sqrt(CAST(n AS DOUBLE) * CAST(sq_deg AS DOUBLE) - CAST(sum_deg AS DOUBLE) * CAST(sum_deg AS DOUBLE))), 6) + 0.0
FROM m
"""



def q_retrieval_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion (RRF, Cormack et al.
    2009): fuse the BM25 lexical top-20 with the dense cosine top-10
    (probe vector 0) as score = sum 1/(60 + rank) over the lists each
    doc appears in — the modern lexical+dense search join, composed
    entirely from the two gated rankings. Both inputs are tiny top-k
    frames, so the fusion is driver-light arithmetic on <= 30 rows;
    the heavy lifting stays in the gated tier queries."""
    from pyspark.sql.window import Window

    lex = q_retrieval_bm25(spark, sf_dir).select("doc_id", "bm25")
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lexr = lex.select(
        "doc_id", F.row_number().over(wl).cast("int").alias("lex_rank")
    )
    den = q_ann_cosine(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "sim"
    )
    wd = Window.orderBy(F.desc("sim"), F.asc("doc_id"))
    denr = den.select(
        "doc_id", F.row_number().over(wd).cast("int").alias("dense_rank")
    )
    fused = lexr.join(denr, "doc_id", "full_outer")
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0)) + \
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("dense_rank")), F.lit(0.0))
    return (
        fused.select(
            "doc_id", "lex_rank", "dense_rank",
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


QUERIES["retrieval_hybrid_rrf"] = q_retrieval_hybrid_rrf

# composed verbatim from the two gated ranking oracles
ORACLES["retrieval_hybrid_rrf"] = f"""
WITH lexr AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
  FROM ({ORACLES["retrieval_bm25"].strip().rstrip(';')}) b
),
denr AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS dense_rank
  FROM ({ORACLES["ann_cosine"].strip().rstrip(';')}) a
),
f AS (
  SELECT COALESCE(lexr.doc_id, denr.doc_id) AS doc_id, lex_rank, dense_rank
  FROM lexr FULL OUTER JOIN denr ON lexr.doc_id = denr.doc_id
)
SELECT doc_id, lex_rank, dense_rank,
       round(COALESCE(1.0 / (60 + lex_rank), 0.0)
             + COALESCE(1.0 / (60 + dense_rank), 0.0), 6) AS rrf_score
FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10
"""



def q_corpus_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic on document length
    between every source pair: D = max |ECDF_a - ECDF_b| over the
    union length domain — the nonparametric drift test that catches a
    shifted length DISTRIBUTION even when means agree (completing the
    drift family next to chi-square seasonality, PSI halves and JS
    buckets). One corpus scan aggregates to (source, n_chars) counts
    behind a checkpoint barrier; everything after — cumulative sums,
    the pair join on the length domain, the max — runs on that tiny
    frame. ECDF values are exact integer ratios; D compares on the
    rounded value so engines agree."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    counts = (
        docs.groupBy("source", F.col("n_chars").alias("x"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # five consumers; one corpus scan
    )
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    # dense domain: every source needs an ECDF value at every length in
    # the UNION domain (step function: cumulative count of values <= x)
    dom = counts.select("x").distinct()
    grid = counts.select("source").distinct().crossJoin(dom)
    dense = grid.join(counts, ["source", "x"], "left").fillna(0, ["c"])
    w = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = (
        dense.withColumn("cum", F.sum("c").over(w))
        .join(F.broadcast(tot), "source")
        .select("source", "x", (F.col("cum") / F.col("n")).alias("f"))
    )
    a = ecdf.select(
        F.col("source").alias("source_a"), "x", F.col("f").alias("fa")
    )
    b = ecdf.select(
        F.col("source").alias("source_b"), "x", F.col("f").alias("fb")
    )
    return (
        a.join(b, "x")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d")
        )
    )


QUERIES["corpus_ks_drift"] = q_corpus_ks_drift

ORACLES["corpus_ks_drift"] = """
WITH counts AS (
  SELECT source, n_chars AS x, count(*) AS c FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, sum(c) AS n FROM counts GROUP BY source),
dom AS (SELECT DISTINCT x FROM counts),
grid AS (
  SELECT s.source, dom.x
  FROM (SELECT DISTINCT source FROM counts) s, dom
),
dense AS (
  SELECT grid.source, grid.x, COALESCE(counts.c, 0) AS c
  FROM grid LEFT JOIN counts USING (source, x)
),
ecdf AS (
  SELECT dense.source, dense.x,
         sum(dense.c) OVER (
           PARTITION BY dense.source ORDER BY dense.x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) / CAST(tot.n AS DOUBLE) AS f
  FROM dense JOIN tot ON dense.source = tot.source
)
SELECT a.source AS source_a, b.source AS source_b,
       round(max(abs(a.f - b.f)), 6) AS ks_d
FROM ecdf a JOIN ecdf b ON a.x = b.x AND a.source < b.source
GROUP BY 1, 2
"""


def q_vocab_bpe_merges(spark, sf_dir):
    """First BPE merge round (Sennrich 2016, subword units): the 10
    most frequent adjacent character pairs inside lowercased alphabetic
    words — the candidates the first merge step of a tokenizer train
    would fuse. The pair space is bounded (26^2), so the aggregate is
    tiny; the per-word pair explode is row-local array math off one
    corpus scan."""
    from ..ops.text import bpe_tokens_col

    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.explode(
            F.filter(bpe_tokens_col("text"), lambda t: t.rlike("^[A-Za-z]+$"))
        ).alias("w0")
    ).select(F.lower("w0").alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(10)
    )
QUERIES["vocab_bpe_merges"] = q_vocab_bpe_merges

ORACLES["vocab_bpe_merges"] = r"""
WITH w0 AS (
  SELECT lower(unnest(list_filter(
           regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
           t -> regexp_matches(t, '^[A-Za-z]+$')))) AS w
  FROM documents
),
p AS (
  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                               i -> substr(w, i, 2))) AS pair
  FROM w0 WHERE length(w) >= 2
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair LIMIT 10
"""


def q_pack_efficiency_curve(spark, sf_dir):
    """Context-window packing efficiency vs context length: for each
    candidate context size, the padding a naive one-doc-per-block
    packer wastes (blocks * L - tokens) — the curve a training pipeline
    reads to size its sequence length or justify sequence packing
    (chunk_packing is the packer; this is its design-space view). One
    corpus pass computes per-doc token counts; the tiny counts frame
    fans out 4x over the candidate lengths (row-local explode, no extra
    scan). Headroom: padded_tokens stays under 9.2e12 up to ~1e13
    wasted tokens — beyond any real corpus at the 1e6 ppm factor."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir).select(
        F.size(tokens_col("text")).cast("bigint").alias("n")
    ).filter(F.col("n") > 0)
    per = docs.select(
        "n",
        F.explode(
            F.array(*[F.lit(x).cast("bigint") for x in (64, 128, 256, 512)])
        ).alias("context_tokens"),
    )
    return (
        per.withColumn(
            "blocks", F.expr("(n + context_tokens - 1) div context_tokens")
        )
        .groupBy("context_tokens")
        .agg(
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.sum("blocks").cast("bigint").alias("total_blocks"),
            F.sum(F.expr("blocks * context_tokens - n"))
            .cast("bigint")
            .alias("padded_tokens"),
        )
        .selectExpr(
            "context_tokens", "total_tokens", "total_blocks", "padded_tokens",
            "(1000000 * padded_tokens) div (total_tokens + padded_tokens)"
            " as padding_ppm",
        )
    )


QUERIES["pack_efficiency_curve"] = q_pack_efficiency_curve

ORACLES["pack_efficiency_curve"] = """
WITH d AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n
  FROM documents
),
per AS (
  SELECT n, CAST(l.ct AS BIGINT) AS context_tokens,
         (n + CAST(l.ct AS BIGINT) - 1) // CAST(l.ct AS BIGINT) AS blocks
  FROM d, unnest([64, 128, 256, 512]) AS l(ct)
  WHERE n > 0
)
SELECT context_tokens,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(blocks) AS BIGINT) AS total_blocks,
       CAST(sum(blocks * context_tokens - n) AS BIGINT) AS padded_tokens,
       (1000000 * CAST(sum(blocks * context_tokens - n) AS BIGINT))
         // (CAST(sum(n) AS BIGINT)
             + CAST(sum(blocks * context_tokens - n) AS BIGINT))
         AS padding_ppm
FROM per GROUP BY context_tokens
"""


def q_vocab_pmi(spark, sf_dir):
    """Pointwise mutual information of the corpus's top-20 bigrams —
    collocation strength for vocabulary construction (a high-count
    bigram of two ubiquitous words is not a collocation; PMI separates
    'of the' from 'new york'). Reuses the top-bigram computation
    (partial-agg + TakeOrdered, never a full sort) restricted to true
    2-word windows, joins the two unigram frequencies, and computes
    ln(P(xy) / (P(x)P(y))) from exact integer counts in ONE double
    expression mirrored verbatim in the oracle; round(..., 6) absorbs
    libm ulps (the PSI/NLL discipline). The unigram join is a
    broadcast onto 20 rows."""
    from ..ops.dedup import shingles_col
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    # checkpoint barriers on the AGGREGATED count frames (vocabulary-
    # sized, tiny vs the corpus): uni feeds t1 + two joins and the
    # bigram counts feed t2 + the top-k — without the barriers each
    # consumer re-derives its corpus explode (the duplicate-scan audit
    # class; this query scanned documents 5x in its first cut)
    uni = (
        docs.select(F.explode(tokens_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("nw"))
        .localCheckpoint(eager=False)
    )
    bigc = (
        docs.select(F.explode(shingles_col("text", k=2)).alias("ngram"))
        .filter(F.size(F.split(F.col("ngram"), " ")) == 2)
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    t2 = bigc.groupBy().agg(F.sum("n").alias("t2"))
    top = bigc.orderBy(F.desc("n"), "ngram").limit(20)
    t1 = uni.groupBy().agg(F.sum("nw").alias("t1"))
    x = top.withColumn("wx", F.split("ngram", " ")[0]).withColumn(
        "wy", F.split("ngram", " ")[1]
    )
    j = (
        x.join(F.broadcast(uni.withColumnRenamed("w", "wx").withColumnRenamed("nw", "nx")), "wx")
        .join(F.broadcast(uni.withColumnRenamed("w", "wy").withColumnRenamed("nw", "ny")), "wy")
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
    )
    return j.select(
        "ngram",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.expr(
                "ln((CAST(n AS DOUBLE) * t1 * t1)"
                " / (CAST(t2 AS DOUBLE) * nx * ny))"
            ),
            6,
        ).alias("pmi"),
    )


QUERIES["vocab_pmi"] = q_vocab_pmi

ORACLES["vocab_pmi"] = """
WITH d AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
uni AS (
  SELECT unnest(t) AS w FROM d
),
u AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM uni GROUP BY w),
t1c AS (SELECT CAST(sum(nw) AS BIGINT) AS t1 FROM u),
big AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS ngram
  FROM d WHERE len(t) >= 2
),
t2c AS (SELECT CAST(count(*) AS BIGINT) AS t2 FROM big),
top AS (
  SELECT ngram, CAST(count(*) AS BIGINT) AS n
  FROM big GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
)
SELECT top.ngram, top.n,
       round(ln((CAST(top.n AS DOUBLE) * t1 * t1)
                / (CAST(t2 AS DOUBLE) * ux.nw * uy.nw)), 6) AS pmi
FROM top
JOIN u ux ON ux.w = string_split(top.ngram, ' ')[1]
JOIN u uy ON uy.w = string_split(top.ngram, ' ')[2]
CROSS JOIN t1c CROSS JOIN t2c
"""


def q_corpus_vocab_overlap(spark, sf_dir):
    """Exact pairwise vocabulary Jaccard between sources — the
    provenance-dedup signal next to corpus_js_drift's distributional
    drift (drift reads frequency SHAPE; this reads exact type-set
    overlap, the 'same crawl ingested twice under two names'
    detector). Scale shape is the basket_pairs trick: distinct
    (source, token) once, then tokens collapse to their <= n_sources
    member set and pairs explode ROW-LOCALLY from the sorted set (<=
    C(20,2) per token) into one hash-agg — never a token self-join,
    whose hot tokens (stopwords shared by every source) would each
    fan out |sources|^2 rows through a shuffle. Per-source vocabulary
    sizes broadcast into the final ppm arithmetic. All-BIGINT."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    st = (
        docs.select("source", F.explode(tokens_col("text")).alias("token"))
        .distinct()
        # barrier: vocabulary sizes AND the pair fan-out both consume it
        .localCheckpoint(eager=False)
    )
    sizes = st.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (
        st.groupBy("token")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (a, i) ->"
                    " transform(slice(ss, i + 2, size(ss)),"
                    " b -> struct(a AS sa, b AS sb))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.sa").alias("source_a"), F.col("p.sb").alias("source_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr("(1000000 * n_inter) div (n_a + n_b - n_inter)").alias(
                "jaccard_ppm"
            ),
        )
    )


QUERIES["corpus_vocab_overlap"] = q_corpus_vocab_overlap

# the oracle takes the naive token self-join — row-local pair
# generation is a Spark-side efficiency choice, the census is identical
ORACLES["corpus_vocab_overlap"] = """
WITH tok AS MATERIALIZED (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_inter, na.n AS n_a, nb.n AS n_b,
       (1000000 * i.n_inter) // (na.n + nb.n - i.n_inter) AS jaccard_ppm
FROM i JOIN sz na ON i.source_a = na.source
       JOIN sz nb ON i.source_b = nb.source
"""


def q_corpus_ngram_coverage(spark, sf_dir):
    """Vocabulary coverage curve — the tokenizer-budget dial: what
    fraction of the corpus token MASS do the top-k vocabulary entries
    cover (k = 8/16/32 here; 32k/64k/128k in a real tokenizer build)?
    Shape for 100 TB: one token hash-agg, a 1-row total, and a
    DISTRIBUTED top-k (orderBy+limit = TakeOrdered partial top-k per
    partition, never a global sort of the vocabulary) feeding a
    window over only max(k) rows — so the single-partition cumulative
    window is over 32 rows regardless of corpus size. Ties broken
    totally by (count DESC, token ASC); everything BIGINT."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(32)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    ranked = top.select(
        F.row_number().over(w).alias("rk"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    return (
        ranked.filter(F.col("rk").isin(8, 16, 32))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "CAST(rk AS BIGINT) as k",
            "CAST(cum AS BIGINT) as covered_tokens",
            "total",
            "(1000000 * cum) div total as coverage_ppm",
        )
    )


QUERIES["corpus_ngram_coverage"] = q_corpus_ngram_coverage

ORACLES["corpus_ngram_coverage"] = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, token) AS rk,
         sum(n) OVER (ORDER BY n DESC, token
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
)
SELECT CAST(rk AS BIGINT) AS k, CAST(cum AS BIGINT) AS covered_tokens,
       total.total, (1000000 * CAST(cum AS BIGINT)) // total.total
         AS coverage_ppm
FROM ranked, total WHERE rk IN (8, 16, 32)
"""


def q_chunk_sliding(spark, sf_dir):
    """Sliding-window chunking accounting — the context-window packing
    knob with OVERLAP (stride < size keeps boundary context, the
    standard RAG/pretraining chunker): size 32 tokens, stride 24, so
    consecutive chunks share 8 tokens. Pure row-local integer
    arithmetic (n_chunks = 1 + ceil((L-32)/24) for L > 32, chunk i
    covers min(32, L - 24*i) tokens) fanned out by a sequence explode;
    reports per source the chunk count, emitted token mass, corpus
    token mass and the duplication factor in ppm (emitted/corpus —
    the storage overhead the overlap buys). Scales: explode fan-out is
    ~L/24 per doc, one hash-agg by source."""
    docs = _docs(spark, sf_dir)
    base = docs.select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("L"),
    ).filter(F.col("L") > 0)
    fan = base.select(
        "source",
        "L",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("L") <= 32, F.lit(0)).otherwise(
                    F.expr("(L - 32 + 23) div 24")
                ),
            )
        ).alias("ci"),
    )
    per_chunk = fan.select(
        "source",
        F.least(F.lit(32), F.col("L") - 24 * F.col("ci")).alias("clen"),
    )
    return (
        per_chunk.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("clen").cast("bigint").alias("emitted_tokens"),
        )
        .join(
            base.groupBy("source").agg(
                F.sum("L").cast("bigint").alias("corpus_tokens")
            ),
            "source",
        )
        .selectExpr(
            "source", "n_chunks", "emitted_tokens", "corpus_tokens",
            "(1000000 * emitted_tokens) div corpus_tokens as duplication_ppm",
        )
    )


QUERIES["chunk_sliding"] = q_chunk_sliding

ORACLES["chunk_sliding"] = """
WITH base AS (
  SELECT source, len(list_filter(string_split(text, ' '), x -> x <> '')) AS L
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
),
fan AS (
  SELECT source, L, unnest(generate_series(0,
           CASE WHEN L <= 32 THEN 0 ELSE (L - 32 + 23) // 24 END)) AS ci
  FROM base
),
per_chunk AS (
  SELECT source, least(32, L - 24 * ci) AS clen FROM fan
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(clen) AS BIGINT) AS emitted_tokens
  FROM per_chunk GROUP BY source
),
corp AS (
  SELECT source, CAST(sum(L) AS BIGINT) AS corpus_tokens
  FROM base GROUP BY source
)
SELECT a.source, a.n_chunks, a.emitted_tokens, c.corpus_tokens,
       (1000000 * a.emitted_tokens) // c.corpus_tokens AS duplication_ppm
FROM agg a JOIN corp c USING (source)
"""


def q_corpus_budget_allocation(spark, sf_dir):
    """Training-mixture budget allocation by the largest-remainder
    (Hamilton) method: apportion an exact 1,000,000-token sampling
    budget across (source, lang) strata proportional to their token
    mass, in pure integer arithmetic — base quota (B * t_i) div T, then
    the leftover seats go to the largest remainders with a
    deterministic (remainder DESC, source, lang) tie order. The sum of
    final allocations is EXACTLY B (the property float-proportional
    rounding breaks, and the reason mixture configs drift from their
    spec at rebuild time). Scale: the fact scan reduces to one
    hash-agg; everything after runs on the STRATA frame (sources x
    langs ~ 1e2-1e4 rows even at 100 TB), where the global remainder
    rank is a bounded single-partition window by design."""
    from pyspark.sql.window import Window

    B = 1_000_000
    toks = (
        _docs(spark, sf_dir)
        .select(
            "source", "lang",
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda x: x != "")
            ).alias("_n"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("_n").cast("bigint").alias("tokens"))
    )
    wall = Window.partitionBy()
    q = (
        toks.withColumn("_t", F.sum("tokens").over(wall))
        .withColumn("base_alloc", F.expr(f"({B} * tokens) div _t"))
        .withColumn("_rem", F.expr(f"({B} * tokens) % _t"))
        .withColumn("_left", F.lit(B) - F.sum("base_alloc").over(wall))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(
                    F.col("_rem").desc(), F.col("source").asc(), F.col("lang").asc()
                )
            ),
        )
    )
    return q.select(
        "source", "lang", "tokens",
        F.col("base_alloc").cast("bigint").alias("base_alloc"),
        (F.col("base_alloc") + (F.col("_rk") <= F.col("_left")).cast("bigint"))
        .cast("bigint")
        .alias("final_alloc"),
    )


QUERIES["corpus_budget_allocation"] = q_corpus_budget_allocation

ORACLES["corpus_budget_allocation"] = """
WITH toks AS (
  SELECT source, lang,
         sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS tokens
  FROM documents
  GROUP BY 1, 2
),
q AS (
  SELECT source, lang, tokens,
         (1000000 * tokens) // sum(tokens) OVER () AS base_alloc,
         (1000000 * tokens) % sum(tokens) OVER () AS _rem
  FROM toks
),
r AS (
  SELECT *,
         1000000 - sum(base_alloc) OVER () AS _left,
         row_number() OVER (ORDER BY _rem DESC, source ASC, lang ASC) AS _rk
  FROM q
)
SELECT source, lang, CAST(tokens AS BIGINT) AS tokens,
       CAST(base_alloc AS BIGINT) AS base_alloc,
       CAST(base_alloc + CASE WHEN _rk <= _left THEN 1 ELSE 0 END AS BIGINT)
         AS final_alloc
FROM r
"""
