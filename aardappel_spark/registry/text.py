"""Per-document text analysis: quality, tokens, fingerprints, readability."""


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



def q_text_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    return quality_by_group(_docs(spark, sf_dir), ["lang", "source"])


def q_doc_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def q_doc_zipf_tail(spark, sf_dir):
    """Zipf-law fit over the top-100 token frequencies: least-squares
    slope/intercept of ln(freq) ~ ln(rank). The corpus-scale work is ONE
    token count; the regression runs on 100 rows. A healthy natural
    corpus slopes ~-1; a synthetic or boilerplate-heavy one doesn't —
    a one-row corpus health dial."""
    from pyspark.sql.window import Window

    from ..ops.text import tokenize

    t = tokenize(_docs(spark, sf_dir))
    counts = t.filter(F.col("token") != "").groupBy("token").agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy(F.desc("c"), "token")
    top = counts.select(
        "c", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 100)
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    s = top.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


def q_doc_dup_coverage(spark, sf_dir):
    """Per-document duplication coverage (the Lee et al. 2022 metric
    that motivates span dedup): fraction of a doc's 4-gram positions
    whose gram also appears in ANOTHER doc. Reuses the shared grams4
    explode; the gram->doc-frequency agg shuffles gram keys once."""
    # grams hash to 60-bit keys BEFORE the doc-frequency shuffle (the
    # dedup_span discipline): 8-byte shuffle keys instead of raw 4-gram
    # strings; the oracle hashes identically. The (gh, nd) census is the
    # shared _grams4_census_cached frame — dedup_span runs the identical
    # count-distinct, so the corpus-wide shuffle happens once per session
    g = _grams4_cached(spark, sf_dir).select("doc_id", _gh60().alias("gh"))
    dfg = _grams4_census_cached(spark, sf_dir)
    marked = g.join(dfg, "gh").select(
        "doc_id", (F.col("nd") >= 2).cast("long").alias("dup")
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("dup").alias("n_dup_grams"),
        F.round(F.sum("dup") / F.count("*"), 4).alias("dup_coverage"),
    )


def q_doc_len_profile_by_lang(spark, sf_dir):
    """Corpus length profile keyed by DETECTED language (not the stored
    label): doc counts and token-length stats per predicted lang — the
    post-langid sanity report before per-language sampling decisions."""
    from ..ops.text import language_id, tokens_col

    docs = _docs(spark, sf_dir)
    lang = language_id(docs)
    lens = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    j = lang.join(lens, "doc_id")
    return j.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def q_doc_simhash_hamming_hist(spark, sf_dir):
    """Hamming-distance histogram of the 60-bit simhash over the MinHash
    LSH candidate pairs — the calibration curve that tells you where to
    put the simhash dedup threshold before committing a cut. Both shared
    frames (pairs, simhash64) are reused; the histogram itself is a tiny
    agg over candidate pairs only."""
    pairs = _minhash_pairs_cached(spark, sf_dir)
    sig = _simhash64_cached(spark, sf_dir).select("doc_id", "simhash")
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    d = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("int").alias("hamming")
        )
    )
    return d.groupBy("hamming").agg(F.count("*").alias("n_pairs"))


def q_doc_quality(spark, sf_dir):
    from ..ops.text import doc_quality

    return doc_quality(_docs(spark, sf_dir))


def q_text_bpe_tokens(spark, sf_dir):
    from ..ops.text import bpe_token_stats

    return bpe_token_stats(_docs(spark, sf_dir))


def q_doc_rolling_fp(spark, sf_dir):
    from ..ops.text import rolling_fingerprint

    return rolling_fingerprint(_docs(spark, sf_dir))


def q_doc_repetition(spark, sf_dir):
    """Self-repetition quality signal (Gopher-style): fraction of a
    document's word 3-grams that are duplicates of earlier ones. Pure
    array expressions — no explode, no shuffle at all."""
    from ..ops.dedup import shingles_col

    g = shingles_col("text", k=3)
    total = F.size(g).cast("bigint")
    uniq = F.size(F.array_distinct(g)).cast("bigint")
    return _docs(spark, sf_dir).select(
        "doc_id",
        total.alias("n_grams"),
        uniq.alias("n_uniq_grams"),
        F.round(
            (total - uniq) / F.greatest(total, F.lit(1)).cast("double"), 4
        ).alias("repetition_ratio"),
    )


def q_doc_score(spark, sf_dir):
    """Composite keep decision: heuristics (doc_quality) + repetition +
    decontamination joined into one verdict per document — the actual
    filter a pipeline applies before the train split. Signals compose
    as three doc_id-keyed frames; the contamination side is an outer
    join (absent = clean)."""
    from ..ops.dedup import contamination_check_grams, shingles_col
    from ..ops.text import doc_quality

    docs = _docs(spark, sf_dir)
    q = doc_quality(docs).select("doc_id", "n_tokens", "keep")
    g = shingles_col("text", k=3)
    rep = docs.select(
        "doc_id",
        F.round(
            (F.size(g) - F.size(F.array_distinct(g)))
            / F.greatest(F.size(g), F.lit(1)).cast("double"),
            4,
        ).alias("rep_ratio"),
    )
    g4 = _grams4_cached(spark, sf_dir)
    cont = contamination_check_grams(
        g4.filter(F.col("doc_id") >= 5), g4.filter(F.col("doc_id") < 5)
    )
    j = (
        q.join(rep, "doc_id")
        .join(cont, "doc_id", "left")
        .withColumn("contaminated", F.col("n_contaminated_grams").isNotNull())
    )
    verdict = F.col("keep") & (F.col("rep_ratio") <= 0.2) & ~F.col("contaminated")
    return j.select(
        "doc_id", "n_tokens", "rep_ratio", "contaminated", verdict.alias("train_ok")
    )


def q_doc_normalize(spark, sf_dir):
    """Text normalization — the stage every pipeline runs before dedup:
    lowercase, collapse whitespace runs, strip non-alphanumeric chars
    (keeping spaces). Emitted as (doc_id, md5 digest, before/after
    lengths) so the full normalized text is verified byte-for-byte
    across engines without shipping it. Pure string expressions, one
    pass, no shuffle at all."""
    docs = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_digest"),
        F.length("text").alias("len_before"),
        F.length(norm).alias("len_after"),
    )


def q_text_lm_score(spark, sf_dir):
    from ..ops.text import unigram_nll

    return unigram_nll(_docs(spark, sf_dir))


def q_doc_split_counts(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split (salted-md5 ticket),
    profiled per language — content-stable across runs and engines."""
    from ..ops.sampling import hash_split

    return (
        hash_split(_docs(spark, sf_dir))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
    )


def q_doc_sample(spark, sf_dir):
    """Deterministic ~10% Bernoulli sample of the corpus by doc id."""
    from ..ops.sampling import deterministic_sample

    return deterministic_sample(_docs(spark, sf_dir), 0.1).select(
        "doc_id", "lang", "source"
    )


def q_doc_pii_scrub(spark, sf_dir):
    """PII redaction check: deterministic synthetic emails/phones are
    injected into every 5th document (the corpus has none), then
    scrubbed; output is counts + a digest of the scrubbed text so the
    oracle verifies the exact redacted bytes."""
    from ..ops.text import pii_scrub

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or 555-123-4567"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    s = pii_scrub(injected)
    return s.select(
        "doc_id", "n_emails", "n_phones", F.md5("scrubbed").alias("digest")
    )


def q_doc_chunks(spark, sf_dir):
    """Fixed-size token chunking (16 tokens, overlap 4) — the window
    split before tokenizer/packing in a training pipeline."""
    from ..ops.chunking import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=16, overlap=4)


def q_text_langid(spark, sf_dir):
    return language_id(_docs(spark, sf_dir))


def q_doc_search(spark, sf_dir):
    """Retrieval join: ANN top-k against the embedding corpus, enriched
    with the matching documents' metadata (vec_id aligns with doc_id in
    the testdata). The top-k side is tiny, so it broadcasts into the
    documents join."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    topk = brute_force_topk(emb, query_id=0, k=10)
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return (
        docs.join(F.broadcast(topk), docs["doc_id"] == topk["vec_id"])
        .select("doc_id", "lang", "source", "sim")
    )


def q_doc_shards(spark, sf_dir):
    """Deterministic training-output sharding: every doc gets a stable
    (shard, within-shard index) from content-independent md5 hashing —
    the write-side step of a training pipeline (N shard files, stable
    order inside each, reproducible across runs/engines/partitionings).
    One window shuffle keyed on the shard."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).select("doc_id")
    ticket = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(ticket, 1, 7), 16, 10).cast("long") % 8
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(ticket, "doc_id")
    return (
        docs.select("doc_id", shard)
        .withColumn("idx", F.row_number().over(w).cast("bigint"))
    )


def q_text_tfidf(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (rounded-score ranking with a
    token tie-break — deterministic across engines)."""
    from ..ops.text import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=3)


def q_doc_boilerplate(spark, sf_dir):
    """Per-doc fraction of word 5-grams shared with >= 3 documents — the
    template/boilerplate signal."""
    from ..ops.text import boilerplate_stats

    return boilerplate_stats(_docs(spark, sf_dir), ngram_words=5, min_docs=3)


def q_doc_stratified(spark, sf_dir):
    """Exact-allocation stratified sample: 10 docs per language in
    deterministic md5-ticket order."""
    from ..ops.sampling import stratified_take

    return stratified_take(_docs(spark, sf_dir), 10, stratum_col="lang").select(
        "doc_id", "lang", "pick_order"
    )


def q_doc_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (A-ES keys on
    md5 tickets), weight = n_chars: top-25 one-pass selection."""
    from ..ops.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), 25, weight_col="n_chars").select(
        "doc_id", "n_chars", "wkey"
    )


def q_langid_eval(spark, sf_dir):
    """Language-ID confusion matrix: predicted vs labeled language with
    per-cell counts — the evaluation join a pipeline runs to calibrate
    its classifier before filtering by it."""
    from ..ops.text import language_id

    docs = _docs(spark, sf_dir)
    pred = language_id(docs)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def q_doc_ppl_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing: docs split into head/middle/
    tail terciles of the corpus-unigram NLL (rounded, doc-id
    tie-broken ordering — engine-exact), with per-bucket stats. The
    quality-stratification step before mixture sampling."""
    from pyspark.sql.window import Window

    from ..ops.text import unigram_nll

    nll = unigram_nll(_docs(spark, sf_dir))
    w = Window.partitionBy().orderBy("nll", "doc_id")
    bucketed = nll.withColumn(
        "bucket",
        F.when(F.ntile(3).over(w) == 1, "head")
        .when(F.ntile(3).over(w) == 2, "middle")
        .otherwise("tail"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("nll"), 4).alias("avg_nll"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


def q_text_bigram_nll(spark, sf_dir):
    """Bigram language-model score: per-document average negative
    log-likelihood of each bigram under the corpus's own conditional
    bigram distribution, avg(ln c(w1) - ln c(w1,w2)) — one step up
    from the unigram text_lm_score, and the same shape a KenLM-style
    filter takes at scale: two count frames joined back onto the
    bigram stream (Zipf skew absorbed by AQE), one per-doc agg. Docs
    with fewer than 2 tokens have no bigrams and drop out."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    # materialize the token array behind a projection boundary, then
    # build bigrams with zip_with over the array and its shifted self —
    # each input array evaluates ONCE per row (an element_at(toks, i)
    # lambda would re-run the split per element: O(tokens^2) per doc,
    # measured 4s -> 0.5s at sf0.1)
    t = docs.select("doc_id", tokens_col("text").alias("_t"))
    n = F.size("_t")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_t", 1, n - 1),
            F.slice(F.col("_t"), 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array())
    bg = t.select("doc_id", F.explode(bigrams).alias("bg")).withColumn(
        "w1", F.split(F.col("bg"), " ").getItem(0)
    )
    # one (doc, bigram) aggregation feeds the c12 count, the c1 count,
    # AND the scoring join; the localCheckpoint barrier materializes it
    # once for all three consumers (per-consumer column pruning makes
    # the exchanges non-identical, so ReuseExchange alone can't help);
    # per-doc NLL becomes the occurrence-weighted mean
    occ = (
        bg.groupBy("doc_id", "bg", "w1")
        .agg(F.count("*").alias("_o"))
        .localCheckpoint(eager=False)
    )
    c12 = occ.groupBy("bg").agg(F.sum("_o").alias("_c12"))
    c1 = occ.groupBy("w1").agg(F.sum("_o").alias("_c1"))
    scored = occ.join(c12, "bg").join(c1, "w1")
    diff = F.log("_c1") - F.log("_c12")
    return scored.groupBy("doc_id").agg(
        F.sum("_o").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("_o") * diff) / F.sum("_o"), 4).alias("bigram_nll"),
    )


def q_doc_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth: scanning docs in doc_id order, how
    many NEW distinct tokens each doc contributes and the cumulative
    vocabulary size after it. Computed by first-occurrence attribution
    (min doc_id per token, one hash-agg) + a running sum — not a
    running count-distinct, which would re-shuffle the whole token
    stream per step. Integer-exact across engines."""
    from pyspark.sql.window import Window

    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("doc_id"))
    per_doc = first_seen.groupBy("doc_id").agg(F.count("*").alias("n_new_tokens"))
    all_docs = docs.select("doc_id").join(per_doc, "doc_id", "left").fillna(
        0, ["n_new_tokens"]
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return all_docs.select(
        "doc_id",
        "n_new_tokens",
        F.sum("n_new_tokens").over(w).alias("vocab_size"),
    )


def q_doc_ngram_novelty(spark, sf_dir):
    """Per-source novelty: the fraction of a source's distinct word
    3-gram keys that occur in NO other source — the signal that says
    which feeds contribute genuinely new text vs mirrored content.
    Grams are md5-hashed to 60-bit integer keys BEFORE the shuffle
    (the dedup_span discipline: 8-byte exchange keys instead of raw
    gram strings), and the oracle hashes identically so collisions —
    astronomically unlikely but possible — cannot split the engines.
    Shape: explode -> distinct (source, key) -> per-key source count
    -> per-source ratio; every stage is a hash-agg on bounded keys."""
    from ..ops.dedup import shingles_col

    g = _docs(spark, sf_dir).select(
        "source",
        F.explode(F.array_distinct(shingles_col("text", k=3))).alias("gram"),
    )
    keyed = g.select(
        "source",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        .alias("gk"),
    ).distinct().localCheckpoint(eager=False)
    # barrier: `keyed` feeds BOTH the per-key source census and the
    # per-source tally join below; without it the explode+md5+distinct
    # subtree ran twice (the two consumers shuffle on different keys,
    # so ReuseExchange cannot merge them)
    spread = keyed.groupBy("gk").agg(
        F.countDistinct("source").alias("n_sources")
    )
    return (
        keyed.join(spread, "gk")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("n_sources") == 1).cast("int"))
            .cast("bigint")
            .alias("n_unique"),
            F.round(
                F.sum((F.col("n_sources") == 1).cast("int"))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty_ratio"),
        )
    )
QUERIES["text_token_stats"] = q_text_token_stats
QUERIES["text_quality"] = q_text_quality
QUERIES["doc_fingerprint"] = q_doc_fingerprint
QUERIES["doc_zipf_tail"] = q_doc_zipf_tail
QUERIES["doc_dup_coverage"] = q_doc_dup_coverage
QUERIES["doc_len_profile_by_lang"] = q_doc_len_profile_by_lang
QUERIES["doc_simhash_hamming_hist"] = q_doc_simhash_hamming_hist
QUERIES["text_bpe_tokens"] = q_text_bpe_tokens
QUERIES["doc_rolling_fp"] = q_doc_rolling_fp
QUERIES["doc_quality"] = q_doc_quality
QUERIES["doc_repetition"] = q_doc_repetition
QUERIES["doc_score"] = q_doc_score
QUERIES["text_langid"] = q_text_langid
QUERIES["text_lm_score"] = q_text_lm_score
QUERIES["doc_chunks"] = q_doc_chunks
QUERIES["doc_split_counts"] = q_doc_split_counts
QUERIES["doc_sample"] = q_doc_sample
QUERIES["doc_pii_scrub"] = q_doc_pii_scrub
QUERIES["doc_search"] = q_doc_search
QUERIES["doc_shards"] = q_doc_shards
QUERIES["text_tfidf"] = q_text_tfidf
QUERIES["doc_boilerplate"] = q_doc_boilerplate
QUERIES["doc_stratified"] = q_doc_stratified
QUERIES["doc_weighted_sample"] = q_doc_weighted_sample
QUERIES["langid_eval"] = q_langid_eval
QUERIES["doc_ppl_buckets"] = q_doc_ppl_buckets
QUERIES["text_bigram_nll"] = q_text_bigram_nll
QUERIES["doc_vocab_growth"] = q_doc_vocab_growth
QUERIES["doc_normalize"] = q_doc_normalize
ORACLES["text_token_stats"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT doc_id, count(*) AS n_tokens, count(DISTINCT token) AS n_uniq_tokens,
       round(avg(length(token)), 4) AS avg_token_len
FROM t WHERE token <> '' GROUP BY doc_id
"""
)
ORACLES["text_quality"] = (
f"""
WITH t AS (
  SELECT lang, source, doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
)
SELECT lang, source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
       round(count(*) / CAST(count(DISTINCT doc_id) AS DOUBLE), 4) AS avg_doc_tokens,
       round(sum(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS stopword_ratio
FROM t WHERE token <> '' GROUP BY lang, source
"""
)
ORACLES["doc_fingerprint"] = (
"""
SELECT doc_id,
       md5(COALESCE(array_to_string(list_sort(list_distinct(
           list_filter(string_split(text, ' '), t -> t <> ''))), ' '), '')) AS fp
FROM documents
"""
)
ORACLES["text_bpe_tokens"] = (
r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$'))) AS BIGINT) AS n_alpha,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$'))) AS BIGINT) AS n_num,
       CAST(len(list_filter(toks, t -> regexp_matches(t, '^[^A-Za-z0-9]$'))) AS BIGINT) AS n_punct
FROM t
"""
)
ORACLES["doc_rolling_fp"] = (
r"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
             t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
         (acc, h) -> (acc * 31 + h) % 1000000007) AS roll_fp
FROM documents
"""
)
ORACLES["doc_quality"] = (
r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$'))) AS BIGINT) AS n_punct,
         CAST(len(list_filter(toks, x -> lower(x) IN (STOPS_PLACEHOLDER))) AS BIGINT) AS n_stop
  FROM t
),
r AS (
  SELECT doc_id, n_tokens,
         round(CAST(n_punct AS DOUBLE) / greatest(n_tokens, 1), 6) AS punct_ratio,
         round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 6) AS stopword_ratio
  FROM m
)
SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
       (n_tokens >= 5 AND punct_ratio <= 0.3 AND stopword_ratio >= 0.01) AS keep
FROM r
""".replace("STOPS_PLACEHOLDER", _STOP_SQL)
)
ORACLES["doc_score"] = (
r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$'))) AS BIGINT) AS n_punct,
         CAST(len(list_filter(toks, x -> lower(x) IN (STOPS_PLACEHOLDER))) AS BIGINT) AS n_stop
  FROM t
),
q AS (
  SELECT doc_id, n_tokens,
         (n_tokens >= 5
          AND round(CAST(n_punct AS DOUBLE) / greatest(n_tokens, 1), 6) <= 0.3
          AND round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 6) >= 0.01) AS keep
  FROM m
),
d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
rep AS (
  SELECT doc_id,
         round((len(g) - len(list_distinct(g))) / CAST(greatest(len(g), 1) AS DOUBLE), 4) AS rep_ratio
  FROM (
    SELECT doc_id, CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
           ELSE list_transform(generate_series(1, len(t) - 2),
                               i -> array_to_string(list_slice(t, i, i + 2), ' '))
           END AS g
    FROM d
  )
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
)
SELECT q.doc_id, q.n_tokens, rep.rep_ratio,
       (cont.doc_id IS NOT NULL) AS contaminated,
       (q.keep AND rep.rep_ratio <= 0.2 AND cont.doc_id IS NULL) AS train_ok
FROM q JOIN rep ON q.doc_id = rep.doc_id
LEFT JOIN cont ON q.doc_id = cont.doc_id
""".replace("STOPS_PLACEHOLDER", _STOP_SQL)
)
ORACLES["doc_repetition"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
g AS (
  SELECT doc_id, CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         ELSE list_transform(generate_series(1, len(t) - 2),
                             i -> array_to_string(list_slice(t, i, i + 2), ' '))
         END AS grams
  FROM d
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_uniq_grams,
       round((len(grams) - len(list_distinct(grams)))
             / CAST(greatest(len(grams), 1) AS DOUBLE), 4) AS repetition_ratio
FROM g
"""
)
ORACLES["text_langid"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
s AS (
  SELECT doc_id,
       sum(CASE WHEN token IN ('the', 'a', 'of', 'to', 'and', 'is', 'in', 'it') THEN 1 ELSE 0 END) AS s_en,\n       sum(CASE WHEN token IN ('el', 'la', 'de', 'que', 'y', 'en', 'un', 'es') THEN 1 ELSE 0 END) AS s_es,\n       sum(CASE WHEN token IN ('der', 'die', 'das', 'und', 'ist', 'von', 'ein', 'mit') THEN 1 ELSE 0 END) AS s_de,\n       sum(CASE WHEN token IN ('le', 'la', 'les', 'et', 'de', 'un', 'est', 'dans') THEN 1 ELSE 0 END) AS s_fr,\n       sum(CASE WHEN token IN ('de5', 'shi4', 'le5', 'zai4', 'you3', 'he2', 'wo3', 'ta1') THEN 1 ELSE 0 END) AS s_zh
  FROM t WHERE token <> '' GROUP BY doc_id
)
SELECT doc_id, CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en' WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es' WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de' WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr' WHEN s_zh > 0 THEN 'zh' ELSE 'und' END AS pred_lang FROM s
"""
)
ORACLES["text_lm_score"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
f AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
n AS (SELECT count(*) AS nn FROM tk)
SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(n.nn) - ln(f.c)), 4) AS nll
FROM tk JOIN f USING (token), n
GROUP BY tk.doc_id
"""
)
ORACLES["doc_chunks"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
c AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t), 12)) AS s FROM d
)
SELECT doc_id, CAST((s - 1) / 12 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(t, s, s + 15), ' ') AS chunk_text,
       CAST(len(list_slice(t, s, s + 15)) AS BIGINT) AS n_tokens
FROM c
"""
)
ORACLES["doc_split_counts"] = (
f"""
WITH s AS (
  SELECT lang,
         ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS t
  FROM documents
)
SELECT CASE WHEN t < {int(0.8 * 2**32)} THEN 'train'
            WHEN t < {int(0.9 * 2**32)} THEN 'val'
            ELSE 'test' END AS split,
       lang, CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY 1, 2
"""
)
ORACLES["doc_sample"] = (
f"""
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5('sample' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < {int(0.1 * 2**32)}
"""
)
ORACLES["doc_pii_scrub"] = (
r"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567'
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS digest
FROM inj
"""
)
ORACLES["doc_search"] = (
"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS qv
  FROM embeddings WHERE vec_id = 0
),
v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings WHERE vec_id <> 0
),
d AS (
  SELECT v.vec_id, sum(v.x * q.qv) AS dot, sum(v.x * v.x) AS n2
  FROM v JOIN q USING (i) GROUP BY v.vec_id
),
qn AS (SELECT sum(qv * qv) AS qn2 FROM q),
topk AS (
  SELECT vec_id, round(dot / (sqrt(n2) * sqrt(qn2)), 4) AS sim
  FROM d, qn ORDER BY sim DESC, vec_id LIMIT 10
)
SELECT doc.doc_id, doc.lang, doc.source, t.sim
FROM documents doc JOIN topk t ON doc.doc_id = t.vec_id
"""
)
ORACLES["doc_shards"] = (
"""
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ticket,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 8 AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ticket, doc_id) AS BIGINT) AS idx
FROM t
"""
)
ORACLES["text_tfidf"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2),
df AS (SELECT token, count(*) AS d FROM tf GROUP BY 1),
n AS (SELECT count(*) AS nd FROM documents),
s AS (
  SELECT tf.doc_id, tf.token, tf.c,
         round(tf.c * (ln(n.nd) - ln(df.d)), 6) AS score
  FROM tf JOIN df USING (token), n
),
r AS (
  SELECT doc_id, token, c, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
  FROM s
)
SELECT doc_id, token, CAST(c AS BIGINT) AS tf, score, CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= 3
"""
)
ORACLES["doc_boilerplate"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         ('0x' || substr(md5(unnest(CASE WHEN len(t) < 5 THEN [COALESCE(array_to_string(t, ' '), '')]
         ELSE list_transform(generate_series(1, len(t) - 4),
                             i -> array_to_string(list_slice(t, i, i + 4), ' '))
         END)), 1, 15))::BIGINT AS gh
  FROM d
),
dfg AS (
  SELECT gh, count(*) AS gdf FROM (SELECT DISTINCT doc_id, gh FROM g) GROUP BY 1
),
common AS (SELECT gh FROM dfg WHERE gdf >= 3)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN c.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       round(sum(CASE WHEN c.gh IS NOT NULL THEN 1 ELSE 0 END) / count(*), 6) AS boiler_ratio
FROM g LEFT JOIN common c ON g.gh = c.gh
GROUP BY g.doc_id
"""
)
ORACLES["doc_stratified"] = (
"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS pick_order FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 10
"""
)
ORACLES["doc_weighted_sample"] = (
"""
WITH t AS (
  SELECT doc_id, n_chars,
         round(ln((('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                  / 4294967296.0::DOUBLE) / n_chars, 6) + 0.0::DOUBLE AS wkey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, wkey FROM t ORDER BY wkey DESC, doc_id LIMIT 25
"""
)
ORACLES["langid_eval"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
s AS (
  SELECT doc_id,
       sum(CASE WHEN token IN ('the', 'a', 'of', 'to', 'and', 'is', 'in', 'it') THEN 1 ELSE 0 END) AS s_en,
       sum(CASE WHEN token IN ('el', 'la', 'de', 'que', 'y', 'en', 'un', 'es') THEN 1 ELSE 0 END) AS s_es,
       sum(CASE WHEN token IN ('der', 'die', 'das', 'und', 'ist', 'von', 'ein', 'mit') THEN 1 ELSE 0 END) AS s_de,
       sum(CASE WHEN token IN ('le', 'la', 'les', 'et', 'de', 'un', 'est', 'dans') THEN 1 ELSE 0 END) AS s_fr,
       sum(CASE WHEN token IN ('de5', 'shi4', 'le5', 'zai4', 'you3', 'he2', 'wo3', 'ta1') THEN 1 ELSE 0 END) AS s_zh
  FROM t WHERE token <> '' GROUP BY doc_id
),
p AS (
  SELECT doc_id,
         CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
              WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
              WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
              WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
              WHEN s_zh > 0 THEN 'zh'
              ELSE 'und' END AS pred_lang
  FROM s
)
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN p USING (doc_id)
GROUP BY 1, 2
"""
)
ORACLES["doc_ppl_buckets"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
f AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
n AS (SELECT count(*) AS nn FROM tk),
nll AS (
  SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(avg(ln(n.nn) - ln(f.c)), 4) AS nll
  FROM tk JOIN f USING (token), n
  GROUP BY tk.doc_id
),
b AS (
  SELECT doc_id, n_tokens, nll, ntile(3) OVER (ORDER BY nll, doc_id) AS q
  FROM nll
)
SELECT CASE q WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(nll), 4) AS avg_nll,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM b GROUP BY 1
"""
)
ORACLES["text_bigram_nll"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM d WHERE len(t) >= 2
),
occ AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1, count(*) AS o
  FROM bg GROUP BY 1, 2, 3
),
c12 AS (SELECT bg, sum(o) AS c12 FROM occ GROUP BY 1),
c1 AS (SELECT w1, sum(o) AS c1 FROM occ GROUP BY 1)
SELECT occ.doc_id, CAST(sum(occ.o) AS BIGINT) AS n_bigrams,
       round(sum(occ.o * (ln(c1.c1) - ln(c12.c12))) / sum(occ.o), 4) AS bigram_nll
FROM occ JOIN c12 USING (bg) JOIN c1 USING (w1)
GROUP BY occ.doc_id
"""
)
ORACLES["doc_normalize"] = (
"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_digest,
       CAST(length(text) AS INT) AS len_before,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS INT) AS len_after
FROM documents
"""
)
ORACLES["doc_vocab_growth"] = (
"""
WITH tk AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
fs AS (SELECT token, min(doc_id) AS doc_id FROM tk GROUP BY 1),
pd AS (SELECT doc_id, count(*) AS n_new_tokens FROM fs GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(pd.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
       CAST(sum(coalesce(pd.n_new_tokens, 0))
            OVER (ORDER BY d.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS vocab_size
FROM documents d LEFT JOIN pd USING (doc_id)
"""
)
ORACLES["doc_zipf_tail"] = (
"""
WITH tk AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
f AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank FROM f
),
s AS (
  SELECT count(*) AS n, sum(ln(rank)) AS sx, sum(ln(c)) AS sy,
         sum(ln(rank) * ln(rank)) AS sxx, sum(ln(rank) * ln(c)) AS sxy
  FROM r WHERE rank <= 100
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS zipf_intercept
FROM s
"""
)
ORACLES["doc_dup_coverage"] = (
"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT doc_id,
         ('0x' || substr(md5(COALESCE(CASE WHEN len(t) < 4 THEN array_to_string(t, ' ')
              ELSE array_to_string(list_slice(t, i, i + 3), ' ') END, '')), 1, 15))::BIGINT AS gh
  FROM d, unnest(generate_series(1, greatest(1, len(t) - 3))) AS u(i)
),
dfg AS (SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN dfg.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       round(sum(CASE WHEN dfg.nd >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
         AS dup_coverage
FROM g JOIN dfg USING (gh)
GROUP BY g.doc_id
"""
)
ORACLES["doc_len_profile_by_lang"] = (
"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
s AS (
  SELECT doc_id,
       sum(CASE WHEN token IN ('the', 'a', 'of', 'to', 'and', 'is', 'in', 'it') THEN 1 ELSE 0 END) AS s_en,
       sum(CASE WHEN token IN ('el', 'la', 'de', 'que', 'y', 'en', 'un', 'es') THEN 1 ELSE 0 END) AS s_es,
       sum(CASE WHEN token IN ('der', 'die', 'das', 'und', 'ist', 'von', 'ein', 'mit') THEN 1 ELSE 0 END) AS s_de,
       sum(CASE WHEN token IN ('le', 'la', 'les', 'et', 'de', 'un', 'est', 'dans') THEN 1 ELSE 0 END) AS s_fr,
       sum(CASE WHEN token IN ('de5', 'shi4', 'le5', 'zai4', 'you3', 'he2', 'wo3', 'ta1') THEN 1 ELSE 0 END) AS s_zh
  FROM t WHERE token <> '' GROUP BY doc_id
),
lang AS (
  SELECT doc_id, CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en' WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es' WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de' WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr' WHEN s_zh > 0 THEN 'zh' ELSE 'und' END AS pred_lang
  FROM s
),
lens AS (
  SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT lang.pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(lens.n_tokens) AS BIGINT) AS total_tokens,
       round(avg(lens.n_tokens), 4) AS avg_tokens,
       CAST(min(lens.n_tokens) AS BIGINT) AS min_tokens,
       CAST(max(lens.n_tokens) AS BIGINT) AS max_tokens
FROM lang JOIN lens USING (doc_id)
GROUP BY lang.pred_lang
"""
)
ORACLES["doc_simhash_hamming_hist"] = (
_PAIRS_CTE + """,
sh AS (
  SELECT doc_id, ('0x' || substr(md5(token0), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token0 FROM documents)
  WHERE token0 <> ''
),
sv AS (
  SELECT doc_id, g.b AS b,
         CASE WHEN (h >> g.b) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM sh, generate_series(0, 59) AS g(b)
),
ss AS (SELECT doc_id, b, sum(vote) AS v FROM sv GROUP BY doc_id, b),
ssig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM ss GROUP BY doc_id
)
SELECT CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN ssig sa ON p.doc_a = sa.doc_id
JOIN ssig sb ON p.doc_b = sb.doc_id
GROUP BY 1
"""
)
QUERIES["doc_ngram_novelty"] = q_doc_ngram_novelty

ORACLES["doc_ngram_novelty"] = """
WITH d AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT source, unnest(CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
         ELSE list_transform(generate_series(1, len(t) - 2),
                             i -> array_to_string(list_slice(t, i, i + 2), ' '))
         END) AS gram
  FROM d
),
k AS (
  SELECT DISTINCT source, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gk
  FROM g
),
s AS (SELECT gk, count(DISTINCT source) AS n_sources FROM k GROUP BY gk)
SELECT k.source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       round(sum(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty_ratio
FROM k JOIN s USING (gk)
GROUP BY k.source
"""


def q_doc_token_entropy(spark, sf_dir):
    """Per-document unigram Shannon entropy (nats) + type-token ratio
    — the repetition/diversity quality signal next to doc_repetition's
    ratio counts: H = ln(n) - (1/n) * sum(c_i * ln(c_i)) over the
    doc's token counts, computed in that closed form so ONE pass over
    the (doc_id, token) counts suffices (no p_i division per row).
    Empty docs emit H = 0 over 0 types. Rounded once at the end; terms
    are O(ln n)-sized so double summation noise is far below the 6dp
    gate."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    tc = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    per_doc = (
        tc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.col("c") * F.log("c")).alias("_clogc"),
        )
        # barrier: the scored rows AND the empty-doc anti-join both
        # consume this; without it the corpus token explode runs twice
        .localCheckpoint(eager=False)
    )
    ent = (
        F.log("n_tokens") - F.col("_clogc") / F.col("n_tokens")
    )
    scored = per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
    )
    empties = docs.join(per_doc.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.lit(0).cast("bigint").alias("n_tokens"),
        F.lit(0).cast("bigint").alias("n_types"),
        F.lit(0.0).alias("entropy"),
        F.lit(None).cast("double").alias("ttr"),
    )
    return scored.unionByName(empties)
QUERIES["doc_token_entropy"] = q_doc_token_entropy

ORACLES["doc_token_entropy"] = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
pd AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_types,
         sum(c * ln(c)) AS clogc
  FROM tc GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       round(ln(n_tokens) - clogc / n_tokens, 6) + 0.0 AS entropy,
       round(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr
FROM pd
UNION ALL
SELECT d.doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0, NULL
FROM documents d
WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM tc)
"""


def q_doc_gopher_rules(spark, sf_dir):
    """Gopher-style quality rules (Rae et al. 2021) as named per-rule
    flags — the policy-audit face of doc_quality's single keep bit:
    word count in [50, 100k], mean word length in [3, 10], >80% words
    containing a letter, <30% words ending in an ellipsis, and >= 2
    distinct common stopwords present. Everything is array HOFs over
    the space-split words — one scan, no explode, no shuffle; the
    flags are plain conjunctions so a `.filter` on any of them pushes
    toward the scan."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    words = tokens_col("text")
    n = F.size(words).cast("bigint")
    n1 = F.greatest(n, F.lit(1))
    mean_len = F.round(
        F.aggregate(
            F.transform(words, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        / n1,
        6,
    )
    alpha_ratio = F.round(
        F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]"))) / n1, 6
    )
    ellipsis_ratio = F.round(
        F.size(F.filter(words, lambda t: t.endswith("..."))) / n1, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
        )
    ).cast("bigint")
    p_wc = (n >= 50) & (n <= 100000)
    p_ml = (mean_len >= 3.0) & (mean_len <= 10.0)
    p_al = alpha_ratio > 0.8
    p_el = ellipsis_ratio < 0.3
    p_st = stop_hits >= 2
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        stop_hits.alias("stop_hits"),
        p_wc.alias("pass_word_count"),
        p_ml.alias("pass_mean_len"),
        p_al.alias("pass_alpha"),
        p_el.alias("pass_ellipsis"),
        p_st.alias("pass_stopwords"),
        (p_wc & p_ml & p_al & p_el & p_st).alias("gopher_pass"),
    )
QUERIES["doc_gopher_rules"] = q_doc_gopher_rules

ORACLES["doc_gopher_rules"] = r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
  FROM documents
),
s AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(ws), 1) AS n1,
         list_sum(list_transform(ws, t -> CAST(length(t) AS BIGINT))) AS sumlen,
         len(list_filter(ws, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
         len(list_filter(ws, t -> t LIKE '%...')) AS n_ell,
         len(list_intersect(
               list_distinct(list_transform(ws, t -> lower(t))),
               ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS stop_hits
  FROM w
),
r AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         round(COALESCE(sumlen, 0) / CAST(n1 AS DOUBLE), 6) AS mean_word_len,
         round(n_alpha / CAST(n1 AS DOUBLE), 6) AS alpha_word_ratio,
         round(n_ell / CAST(n1 AS DOUBLE), 6) AS ellipsis_ratio,
         CAST(stop_hits AS BIGINT) AS stop_hits
  FROM s
)
SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, ellipsis_ratio,
       stop_hits,
       (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_mean_len,
       (alpha_word_ratio > 0.8) AS pass_alpha,
       (ellipsis_ratio < 0.3) AS pass_ellipsis,
       (stop_hits >= 2) AS pass_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (alpha_word_ratio > 0.8)
        AND (ellipsis_ratio < 0.3)
        AND (stop_hits >= 2)) AS gopher_pass
FROM r
"""



def q_text_heldout_nll(spark, sf_dir):
    """Held-out language-model evaluation — the leakage-honest version
    of text_bigram_nll: bigram counts come from the TRAIN split only
    (the standard salted-md5 80/10/10 ticket), and every VAL document
    is scored under Laplace-smoothed conditionals
    -ln((c12 + 1) / (c1 + V + 1)), plus its unseen-bigram occurrence
    rate. Scoring a corpus with counts from the same corpus (what the
    in-corpus query does, by design) understates perplexity; this is
    the eval a pipeline trusts before using NLL as a filter. Same
    shuffle shape as the in-corpus query: one (doc, bigram) aggregate
    behind a localCheckpoint barrier feeds the two train-count frames
    AND the val scoring join."""
    from ..ops.sampling import sample_ticket
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    t = sample_ticket("doc_id", "split")
    lab = (
        F.when(t < F.lit(3435973836), F.lit("train"))
        .when(t < F.lit(3865470566), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # barrier: the tokenized split frame feeds BOTH the bigram
    # occurrence build and the train-vocab distinct count below —
    # without it the corpus is tokenized twice per run
    d = (
        docs.select(
            "doc_id", lab.alias("_split"), tokens_col("text").alias("_t")
        )
        .filter(F.col("_split").isin("train", "val"))
        .localCheckpoint(eager=False)
    )
    n = F.size("_t")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_t", 1, n - 1),
            F.slice(F.col("_t"), 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array())
    bg = d.select(
        "doc_id", "_split", F.explode(bigrams).alias("bg")
    ).withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
    occ = (
        bg.groupBy("_split", "doc_id", "bg", "w1")
        .agg(F.count("*").alias("_o"))
        .localCheckpoint(eager=False)
    )
    train_occ = occ.filter(F.col("_split") == "train")
    c12 = train_occ.groupBy("bg").agg(F.sum("_o").alias("_c12"))
    c1 = train_occ.groupBy("w1").agg(F.sum("_o").alias("_c1"))
    vocab = (
        d.filter(F.col("_split") == "train")
        .select(F.explode("_t").alias("tok"))
        .distinct()
        .count()
    )
    val = occ.filter(F.col("_split") == "val")
    scored = (
        val.join(c12, "bg", "left")
        .join(c1, "w1", "left")
        .fillna(0, ["_c12", "_c1"])
    )
    term = F.log(F.col("_c1") + F.lit(float(vocab + 1))) - F.log(
        F.col("_c12") + F.lit(1.0)
    )
    unseen = F.when(F.col("_c12") == 0, F.col("_o")).otherwise(F.lit(0))
    return scored.groupBy("doc_id").agg(
        F.sum("_o").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("_o") * term) / F.sum("_o"), 4).alias("heldout_nll"),
        F.round(F.sum(unseen) / F.sum("_o"), 6).alias("oov_rate"),
    )


QUERIES["text_heldout_nll"] = q_text_heldout_nll

ORACLES["text_heldout_nll"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < 3435973836 THEN 'train'
              WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < 3865470566 THEN 'val'
              ELSE 'test' END AS sp,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bgs AS (
  SELECT doc_id, sp,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM d WHERE len(t) >= 2 AND sp IN ('train', 'val')
),
occ AS (
  SELECT sp, doc_id, bg, string_split(bg, ' ')[1] AS w1, count(*) AS o
  FROM bgs GROUP BY 1, 2, 3, 4
),
c12 AS (SELECT bg, sum(o) AS c12 FROM occ WHERE sp = 'train' GROUP BY 1),
c1 AS (SELECT w1, sum(o) AS c1 FROM occ WHERE sp = 'train' GROUP BY 1),
v AS (
  SELECT count(DISTINCT tok) AS vocab FROM (
    SELECT unnest(t) AS tok FROM d WHERE sp = 'train'
  )
),
val AS (
  SELECT occ.doc_id, occ.o,
         COALESCE(c12.c12, 0) AS c12, COALESCE(c1.c1, 0) AS c1
  FROM occ LEFT JOIN c12 USING (bg) LEFT JOIN c1 USING (w1)
  WHERE occ.sp = 'val'
)
SELECT doc_id, CAST(sum(o) AS BIGINT) AS n_bigrams,
       round(sum(o * (ln(c1 + (v.vocab + 1.0)) - ln(c12 + 1.0))) / sum(o), 4) AS heldout_nll,
       round(sum(CASE WHEN c12 = 0 THEN o ELSE 0 END) / CAST(sum(o) AS DOUBLE), 6) AS oov_rate
FROM val, v GROUP BY doc_id, v.vocab
"""


def q_doc_chunk_dupmass(spark, sf_dir):
    """Chunk-level duplication mass per source (the CCNet/RefinedWeb
    paragraph-dedup signal adapted to newline-free corpora): each
    document splits into NON-overlapping 8-word chunks, a chunk value
    is 'duplicated' iff it appears in >= 2 distinct documents
    corpus-wide, and each source reports how much of its chunk mass is
    duplicated (fixed-point ppm — no float crosses the hash). Distinct
    from dedup_span (overlapping grams over doc PAIRS) and
    doc_repetition (within-doc): this is the corpus-frequency view a
    pipeline uses to strip boilerplate paragraphs before training.

    Plan: chunking is a pure array expression (transform over an index
    sequence + slice — no shuffle until the explode), then ONE corpus
    explode aggregated to (chunk_hash, source) counts and
    localCheckpointed; the corpus-wide duplicate decision and both
    per-source totals read that barrier, never the corpus again
    (duplicate-scan audit discipline). Chunk values leave the explode
    as md5 hashes, so the shuffle carries 32-byte keys, not text. At
    100 TB: everything is hash-agg on chunk-hash keys — linear, no
    pairwise anything; the (hash, source) frame is the corpus's
    vocabulary of chunks, orders of magnitude smaller than the corpus.
    """
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        "source",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("t"),
    ).filter(F.size("t") > 0)
    chunks = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, (size(t) + 7) div 8 - 1),"
                " i -> md5(concat_ws(' ', slice(t, i * 8 + 1, 8))))"
            )
        ).alias("h"),
    )
    per = (
        chunks.groupBy("h", "source")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("doc_id").alias("nd"),
        )
        .localCheckpoint(eager=False)
    )
    # corpus-wide distinct-doc count per chunk value: a doc belongs to
    # exactly one source, so summing per-source distinct counts is exact
    dup_keys = (
        per.groupBy("h")
        .agg(F.sum("nd").alias("nd_all"))
        .filter(F.col("nd_all") >= 2)
        .select("h")
    )
    base = per.groupBy("source").agg(F.sum("n").alias("n_chunks"))
    dup = (
        per.join(dup_keys, "h", "left_semi")
        .groupBy("source")
        .agg(F.sum("n").alias("n_dup_chunks"))
    )
    return (
        base.join(dup, "source", "left")
        .select(
            "source",
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.expr(
                "(1000000 * CAST(coalesce(n_dup_chunks, 0) AS BIGINT))"
                " div CAST(n_chunks AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


QUERIES["doc_chunk_dupmass"] = q_doc_chunk_dupmass

ORACLES["doc_chunk_dupmass"] = """
WITH d AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
c AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(0, (len(t) + 7) // 8 - 1),
                i -> md5(array_to_string(list_slice(t, i * 8 + 1, i * 8 + 8), ' ')))) AS h
  FROM d WHERE len(t) > 0
),
per AS (
  SELECT h, source, count(*) AS n, count(DISTINCT doc_id) AS nd
  FROM c GROUP BY h, source
),
dup_keys AS (
  SELECT h FROM per GROUP BY h HAVING CAST(sum(nd) AS BIGINT) >= 2
),
base AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_chunks FROM per GROUP BY source
),
dup AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_dup_chunks
  FROM per WHERE h IN (SELECT h FROM dup_keys) GROUP BY source
)
SELECT base.source, n_chunks,
       CAST(COALESCE(n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       (1000000 * CAST(COALESCE(n_dup_chunks, 0) AS BIGINT)) // n_chunks AS dup_ppm
FROM base LEFT JOIN dup ON base.source = dup.source
"""


def q_text_kn_nll(spark, sf_dir):
    """Interpolated Kneser-Ney bigram NLL (Kneser & Ney 1995, the
    smoothing Chen & Goodman 1999 measured best-in-class; KenLM's
    default): p(w2|w1) = max(c12 - D, 0)/c1 + D*N1+(w1,*)/c1 *
    N1+(*,w2)/N1+(*,*) with D = 0.75. One step up from the add-nothing
    conditional of text_bigram_nll: unseen-context mass goes to words
    by how many DISTINCT contexts they follow (continuation count),
    not raw frequency — the correction that stops 'Francisco' (frequent
    but only after 'San') from soaking up smoothing mass.

    Same scale shape as text_bigram_nll: one (doc, bigram) aggregation
    behind a checkpoint barrier fans into the global type-count frame,
    which itself (second barrier) feeds the c1/continuation/total
    aggregates; everything rejoins on bigram/word keys (Zipf skew
    absorbed by AQE), one per-doc weighted mean at the end. Docs with
    fewer than 2 tokens drop out."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    t = docs.select("doc_id", tokens_col("text").alias("_t"))
    n = F.size("_t")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_t", 1, n - 1),
            F.slice(F.col("_t"), 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array())
    bg = (
        t.select("doc_id", F.explode(bigrams).alias("bg"))
        .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bg"), " ").getItem(1))
    )
    occ = (
        bg.groupBy("doc_id", "bg", "w1", "w2")
        .agg(F.count("*").alias("_o"))
        .localCheckpoint(eager=False)
    )
    # global bigram TYPE frame: one row per distinct bigram — the
    # second barrier feeds four consumers (c12 join-back, the w1
    # aggregate, the w2 continuation aggregate, and the type total)
    cnt = (
        occ.groupBy("bg", "w1", "w2")
        .agg(F.sum("_o").alias("_c12"))
        .localCheckpoint(eager=False)
    )
    c1 = cnt.groupBy("w1").agg(
        F.sum("_c12").alias("_c1"), F.count("*").alias("_n1post")
    )
    pre = cnt.groupBy("w2").agg(F.count("*").alias("_n1pre"))
    tt = cnt.agg(F.count("*").alias("_T"))
    scored = (
        occ.join(cnt.select("bg", "_c12"), "bg")
        .join(c1, "w1")
        .join(pre, "w2")
        .crossJoin(F.broadcast(tt))
    )
    p = (
        F.greatest(F.col("_c12") - F.lit(0.75), F.lit(0.0))
        + F.lit(0.75) * F.col("_n1post") * F.col("_n1pre") / F.col("_T")
    ) / F.col("_c1")
    return scored.groupBy("doc_id").agg(
        F.sum("_o").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("_o") * -F.log(p)) / F.sum("_o"), 4)
        .alias("kn_nll"),
    )


QUERIES["text_kn_nll"] = q_text_kn_nll

ORACLES["text_kn_nll"] = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM d WHERE len(t) >= 2
),
occ AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2, count(*) AS o
  FROM bg GROUP BY 1, 2, 3, 4
),
cnt AS (SELECT bg, w1, w2, sum(o) AS c12 FROM occ GROUP BY 1, 2, 3),
c1 AS (
  SELECT w1, sum(c12) AS c1v, count(*) AS n1post FROM cnt GROUP BY 1
),
pre AS (SELECT w2, count(*) AS n1pre FROM cnt GROUP BY 1),
tt AS (SELECT count(*) AS T FROM cnt)
SELECT occ.doc_id, CAST(sum(occ.o) AS BIGINT) AS n_bigrams,
       round(sum(occ.o * -ln(
         (greatest(cc.c12 - 0.75, 0.0)
          + 0.75 * c1.n1post * pre.n1pre / tt.T) / c1.c1v
       )) / sum(occ.o), 4) AS kn_nll
FROM occ
JOIN (SELECT bg, c12 FROM cnt) cc USING (bg)
JOIN c1 USING (w1)
JOIN pre USING (w2)
CROSS JOIN tt
GROUP BY occ.doc_id
"""


def q_doc_hapax_ratio(spark, sf_dir):
    """Per-source hapax legomena profile — the lexical-diversity
    signal next to doc_token_entropy's per-doc view and
    doc_vocab_growth's Heaps curve: within each source's own
    vocabulary, what share of types (and of token mass) occurs exactly
    once. Template-generated or heavily boilerplate sources show LOW
    hapax share; OCR noise or unsegmented text shows pathologically
    HIGH. Same whitespace tokenizer every gated text query uses
    (ops.text.tokens_col == string_split on ' '); one token explode,
    two integer hash-aggs, all-BIGINT fixed-point output."""
    from ..ops.text import tokens_col

    docs = _docs(spark, sf_dir)
    tc = (
        docs.select("source", F.explode(tokens_col("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("(1000000 * n_hapax) div n_types").alias("hapax_type_ppm"),
            F.expr("(1000000 * n_hapax) div n_tokens").alias("hapax_token_ppm"),
        )
    )


QUERIES["doc_hapax_ratio"] = q_doc_hapax_ratio

ORACLES["doc_hapax_ratio"] = """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
tc AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
g AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(COALESCE(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_hapax
  FROM tc GROUP BY source
)
SELECT source, n_tokens, n_types, n_hapax,
       (1000000 * n_hapax) // n_types AS hapax_type_ppm,
       (1000000 * n_hapax) // n_tokens AS hapax_token_ppm
FROM g
"""


def q_doc_simhash_bit_balance(spark, sf_dir):
    """Per-bit ones-share of the corpus 60-bit simhash signatures —
    the index-health diagnostic for the simhash dedup tier (the
    pq_code_balance twin for Hamming space): a bit stuck near 0 or
    1e6 ppm carries no information, compressing real Hamming
    distances and inflating the band-collision rate
    dedup_simhash_pairs pays. Rides the session-shared signature
    frame (_simhash64_cached); the x60 fan-out is one broadcast range
    join (row-local bit probes, never a shuffle of the corpus), then
    one integer hash-agg. All-BIGINT fixed-point output."""
    sig = _simhash64_cached(spark, sf_dir)
    bits = spark.range(60).select(F.col("id").cast("int").alias("b"))
    probed = sig.crossJoin(F.broadcast(bits)).select(
        "b", F.expr("shiftright(simhash, b) & 1").alias("bit")
    )
    return (
        probed.groupBy("b")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("bit").cast("bigint").alias("n_ones"),
        )
        .select(
            F.col("b").cast("int").alias("b"),
            "n_docs",
            "n_ones",
            F.expr("(1000000 * n_ones) div n_docs").alias("ones_ppm"),
        )
    )


QUERIES["doc_simhash_bit_balance"] = q_doc_simhash_bit_balance

# composed on the gated dedup_simhash64 oracle's signature chain so the
# bit census can never drift from the signatures the dedup tier hashes
ORACLES["doc_simhash_bit_balance"] = f"""
WITH sig AS MATERIALIZED ({ORACLES["dedup_simhash64"].strip()}),
pb AS (
  SELECT g.b AS b, (sig.simhash >> g.b) & 1 AS bit
  FROM sig, generate_series(0, 59) AS g(b)
),
g AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(sum(bit), 0) AS BIGINT) AS n_ones
  FROM pb GROUP BY b
)
SELECT CAST(b AS INTEGER) AS b, n_docs, n_ones,
       (1000000 * n_ones) // n_docs AS ones_ppm
FROM g
"""


def q_text_readability(spark, sf_dir):
    """Per-source Flesch reading-ease profile — the readability leg of
    the quality suite (doc_quality counts token classes; this reads
    sentence and syllable structure): words = the shared whitespace
    tokenizer's count, sentences = terminal-punctuation runs
    (min 1/doc), syllables ~ vowel-group runs (the standard heuristic).
    All three cross the hash as exact per-source BIGINT sums; the mean
    Flesch score 206.835 - 1.015*(W/S) - 84.6*(Sy/W) is ONE double
    expression over those sums, identical in both engines. Everything
    is row-local regexp counting into two hash-aggs — no explode, the
    corpus is scanned once."""
    docs = _docs(spark, sf_dir)
    per_doc = docs.select(
        "source",
        F.size(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("w"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("s"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("sy"),
    ).filter(F.col("w") > 0)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
            F.sum("sy").cast("bigint").alias("n_syllables"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "round(206.835 - 1.015 * (n_words / n_sentences)"
                " - 84.6 * (n_syllables / n_words), 4)"
            ).alias("flesch"),
        )
    )


QUERIES["text_readability"] = q_text_readability

ORACLES["text_readability"] = """
WITH pd AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
  FROM documents
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         CAST(sum(s) AS BIGINT) AS n_sentences,
         CAST(sum(sy) AS BIGINT) AS n_syllables
  FROM pd WHERE w > 0 GROUP BY source
)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (n_words / n_sentences)
             - 84.6 * (n_syllables / n_words), 4) AS flesch
FROM g
"""


def q_doc_winnowing(spark, sf_dir):
    """Winnowing fingerprint density (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    word-4-gram, slide a w=4 window over consecutive gram hashes, keep
    the window MINIMUM as the fingerprint (guarantee: any shared run of
    w+k-1 tokens shares >= 1 fingerprint), and report per source the
    gram mass, selected-fingerprint mass and selection density in ppm.
    Rides the SHARED persisted 4-gram frame (_grams4_cached — same
    build decontamination uses); the window min is a per-doc ordered
    window (partition-local, no global sort) and everything crossing
    the hash is BIGINT. Scale: fingerprint density ~ 2/(w+1) regardless
    of corpus size — the observable that says the fingerprint index
    stays a fixed fraction of the gram mass at 100 TB."""
    from pyspark.sql.window import Window

    g4 = _grams4_cached(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("bigint")
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    fp = (
        g4.select("doc_id", "pos", h.alias("h"))
        .withColumn("wmin", F.min("h").over(w))
        .filter(F.col("pos") >= 3)  # full windows only
    )
    per_doc = fp.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.countDistinct("wmin").alias("n_fp"),
    )
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_windows").cast("bigint").alias("n_windows"),
            F.sum("n_fp").cast("bigint").alias("n_fingerprints"),
        )
        .selectExpr(
            "source", "n_docs", "n_windows", "n_fingerprints",
            "(1000000 * n_fingerprints) div n_windows as density_ppm",
        )
    )


QUERIES["doc_winnowing"] = q_doc_winnowing

ORACLES["doc_winnowing"] = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(CASE WHEN len(t) < 4 THEN array_to_string(t, ' ')
                 ELSE array_to_string(list_slice(t, i, i + 3), ' ') END),
                 1, 15))::BIGINT AS h
  FROM d, unnest(generate_series(1, greatest(1, len(t) - 3))) AS u(i)
),
wm AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
  FROM grams
),
per_doc AS (
  SELECT doc_id, count(*) AS n_windows, count(DISTINCT wmin) AS n_fp
  FROM wm WHERE pos >= 3 GROUP BY doc_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_windows) AS BIGINT) AS n_windows,
       CAST(sum(p.n_fp) AS BIGINT) AS n_fingerprints,
       (1000000 * CAST(sum(p.n_fp) AS BIGINT))
         // CAST(sum(p.n_windows) AS BIGINT) AS density_ppm
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def q_text_code_detect(spark, sf_dir):
    """Code-vs-prose detector census — the pretraining-pipeline router
    that decides which quality/dedup stack a document enters. The
    synthetic corpus has no code, so the query INJECTS deterministic
    code documents (every doc_id % 11 == 0 gets a python-shaped twin:
    def line, 4-space-indented body, braces and semicolons), the same
    overlay pattern decontamination uses for planted contamination —
    then the detector (symbol census via regexp_replace subtraction +
    indent heuristic, all JVM expressions) must separate the classes:
    per (label, flagged) cell counts, where injected rows flag ~1e6 ppm
    and organic rows ~0. Detection is row-local; scales trivially."""
    docs = _docs(spark, sf_dir)
    organic = docs.select(
        F.lit(0).alias("label"), F.col("text").alias("t")
    )
    injected = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.lit(1).alias("label"),
        F.concat(
            F.lit("def f_"), F.col("doc_id").cast("string"), F.lit("(x):"),
            F.lit("\n    return x + "), (F.col("doc_id") % 97).cast("string"),
            F.lit(";"), F.lit("\n    y = {"), (F.col("doc_id") % 7).cast("string"),
            F.lit("};"),
        ).alias("t"),
    )
    ev = organic.unionByName(injected)
    sym = F.length("t") - F.length(F.regexp_replace("t", "[{}();=]", ""))
    indent = F.col("t").contains("\n    ")
    flagged = ((sym >= F.lit(3)) | indent).cast("int")
    return (
        ev.select("label", flagged.alias("flagged"))
        .groupBy("label", "flagged")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("flagged").cast("bigint").alias("flagged"),
            "n_docs",
        )
    )


QUERIES["text_code_detect"] = q_text_code_detect

ORACLES["text_code_detect"] = """
WITH ev AS (
  SELECT 0 AS label, text AS t FROM documents
  UNION ALL
  SELECT 1, 'def f_' || CAST(doc_id AS VARCHAR) || '(x):' || chr(10)
         || '    return x + ' || CAST(doc_id % 97 AS VARCHAR) || ';'
         || chr(10) || '    y = {' || CAST(doc_id % 7 AS VARCHAR) || '};'
  FROM documents WHERE doc_id % 11 = 0
),
f AS (
  SELECT label,
         CASE WHEN (length(t) - length(regexp_replace(t, '[{}();=]', '', 'g')))
                   >= 3
               OR contains(t, chr(10) || '    ')
              THEN 1 ELSE 0 END AS flagged
  FROM ev
)
SELECT CAST(label AS BIGINT) AS label, CAST(flagged AS BIGINT) AS flagged,
       CAST(count(*) AS BIGINT) AS n_docs
FROM f GROUP BY label, flagged
"""


def q_doc_domain_stats(spark, sf_dir):
    """URL/domain provenance census — the C4-style 'which domains feed
    the corpus' accounting every web-scale pretraining set publishes.
    The synthetic corpus carries no URLs, so the query injects a
    deterministic URL into every doc_id % 7 == 0 document (5 rotating
    domains), then the extractor — one regexp_extract_all + explode,
    row-local — must recover exactly those domains: per domain, URL
    count, distinct doc count, and share of URL-bearing docs in ppm.
    At 100 TB this is a scan + one small hash-agg keyed by domain
    (domain cardinality ~1e7: fine)."""
    docs = _docs(spark, sf_dir)
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"), F.lit(" visit http://d"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            F.lit(" now"),
        ),
    ).otherwise(F.col("text"))
    urls = (
        docs.select("doc_id", aug.alias("aug"))
        .select(
            "doc_id",
            F.explode(
                F.expr(r"regexp_extract_all(aug, 'https?://([a-z0-9.-]+)/', 1)")
            ).alias("domain"),
        )
    )
    tot = urls.agg(F.countDistinct("doc_id").alias("t"))
    return (
        urls.groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "domain", "n_urls", "n_docs",
            "(1000000 * n_docs) div t as doc_share_ppm",
        )
    )


QUERIES["doc_domain_stats"] = q_doc_domain_stats

ORACLES["doc_domain_stats"] = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' visit http://d' || CAST(doc_id % 5 AS VARCHAR)
                   || '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' now'
              ELSE text END AS t
  FROM documents
),
urls AS (
  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://([a-z0-9.-]+)/', 1))
           AS domain
  FROM aug
),
tot AS (SELECT count(DISTINCT doc_id) AS t FROM urls)
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       (1000000 * CAST(count(DISTINCT doc_id) AS BIGINT)) // tot.t
         AS doc_share_ppm
FROM urls, tot GROUP BY domain, tot.t
"""


def q_doc_url_canonical(spark, sf_dir):
    """URL canonicalization dedup census — the CommonCrawl-style
    pipeline stage that collapses scheme/www/tracking-param variants of
    the same page before fetch-dedup. The synthetic corpus carries no
    URLs, so the query injects a deterministic variant into every
    doc_id % 7 == 0 document (4 rotating surface forms — http/https,
    www., trailing /?utm_source — over 5 domains x 50 paths, so many
    docs share a canonical target); the canonicalizer — a row-local
    regexp_replace chain: strip scheme, strip leading www., strip the
    query string, strip the trailing slash — must collapse exactly the
    variant mass: per domain, URL count, distinct canonical count and
    collapse share in ppm. At 100 TB this is a scan + one hash-agg
    keyed by domain."""
    docs = _docs(spark, sf_dir)
    v = F.col("doc_id") % 4
    url = F.concat(
        F.when(v == 1, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(v == 2, F.lit("www.")).otherwise(F.lit("")),
        F.lit("d"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/p/"),
        ((F.col("doc_id") / 7).cast("bigint") % 50).cast("string"),
        F.when(v == 3, F.lit("/?utm_source=feed")).otherwise(F.lit("")),
    )
    aug = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" visit "), url)
    ).otherwise(F.col("text"))
    urls = docs.select(F.col("doc_id"), aug.alias("aug")).select(
        F.explode(
            F.expr(r"regexp_extract_all(aug, 'https?://[^ ]+', 0)")
        ).alias("u")
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("u"), r"^https?://", ""),
                r"^www\.", "",
            ),
            r"\?.*$", "",
        ),
        "/$", "",
    )
    return (
        urls.select(canon.alias("canon"))
        .select(F.substring_index("canon", "/", 1).alias("domain"), "canon")
        .groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.countDistinct("canon").cast("bigint").alias("n_canonical"),
        )
        .selectExpr(
            "domain", "n_urls", "n_canonical",
            "(1000000 * (n_urls - n_canonical)) div n_urls as collapse_ppm",
        )
    )


QUERIES["doc_url_canonical"] = q_doc_url_canonical

ORACLES["doc_url_canonical"] = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN
           text || ' visit ' ||
           (CASE WHEN doc_id % 4 = 1 THEN 'https://' ELSE 'http://' END) ||
           (CASE WHEN doc_id % 4 = 2 THEN 'www.' ELSE '' END) ||
           'd' || CAST(doc_id % 5 AS VARCHAR) || '.example.com/p/' ||
           CAST((doc_id // 7) % 50 AS VARCHAR) ||
           (CASE WHEN doc_id % 4 = 3 THEN '/?utm_source=feed' ELSE '' END)
         ELSE text END AS aug
  FROM documents
),
urls AS (
  SELECT unnest(regexp_extract_all(aug, 'https?://[^ ]+')) AS u FROM aug
),
canon AS (
  SELECT regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(u, '^https?://', ''),
               '^www\\.', ''),
             '\\?.*$', ''),
           '/$', '') AS c
  FROM urls
)
SELECT split_part(c, '/', 1) AS domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT c) AS BIGINT) AS n_canonical,
       (1000000 * (count(*) - count(DISTINCT c))) // count(*) AS collapse_ppm
FROM canon
GROUP BY 1
"""


def q_text_top_terms(spark, sf_dir):
    """Per-document keyword extraction census — every doc's top-3 terms
    by (term frequency DESC, document frequency ASC, term ASC): most
    repeated first, global rarity as the informativeness tie-break —
    the integer-exact core of tf-idf ranking with NO floating-point
    score crossing an engine boundary (ln() is the one expression libms
    may round differently). Stopwords are excluded up front. The rank
    is a per-doc window (partition-local, never a global sort) over the
    token-count frame; the census then reports every term that is some
    doc's #1 keyword, with how many docs it leads and its global df.
    Scale: one tokenize shuffle to (doc, term) counts, one broadcast-
    able df join (vocab-sized), one per-doc window — corpus-parallel
    end to end."""
    from pyspark.sql.window import Window

    tf = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda x: x != "")
            ).alias("term"),
        )
        .filter(~F.col("term").isin(*STOPWORDS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        # barrier: feeds both the df census and the rank join
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    ranked = tf.join(dfreq, "term").withColumn("rank", F.row_number().over(w))
    return (
        ranked.filter(F.col("rank") == 1)
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("n_docs_lead"),
            F.max("df").cast("bigint").alias("df"),
            F.max("tf").cast("bigint").alias("max_tf"),
        )
        .filter(F.col("n_docs_lead") >= 2)
    )


QUERIES["text_top_terms"] = q_text_top_terms

ORACLES["text_top_terms"] = f"""
WITH tf AS MATERIALIZED (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
    FROM documents
  )
  WHERE term NOT IN ({{stops}})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, d.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, d.df ASC, tf.term ASC) AS rank
  FROM tf JOIN dfreq d USING (term)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_docs_lead,
       CAST(max(df) AS BIGINT) AS df,
       CAST(max(tf) AS BIGINT) AS max_tf
FROM ranked
WHERE rank = 1
GROUP BY term
HAVING count(*) >= 2
""".format(stops=_STOP_SQL)


def q_text_shingle_saturation(spark, sf_dir):
    """Shingle-space saturation census for w = 1..5 — the diagnostic
    that drives the near-dup shingle dial: per width, the per-doc
    distinct posting count, the corpus-distinct shingle count, and the
    mean document frequency (ppm, integer div). When mean_df stops
    falling as w grows the space has a rare tail and prefix-filter /
    MinHash joins stay bounded; when it stays high the token space is
    saturated and the setsim/containment kernels' degenerate-regime
    guard WILL refuse — this query is the cheap census a pipeline runs
    to pick w before launching the join (the r8 unigram degeneration,
    measured as an observable instead of discovered at 24s). One docs
    scan: each width's distinct shingles are tagged (w, shingle) and
    concatenated row-locally, then ONE explode + one hash-agg per
    group — never five corpus passes."""
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    wdf = docs.select(words.alias("_w"))
    arrays = []
    for w in range(1, 6):
        if w == 1:
            sh = F.col("_w")
        else:
            n = F.size(F.col("_w"))
            cnt = n - (w - 1)
            sh = F.slice(F.col("_w"), 1, cnt)
            for i in range(1, w):
                sh = F.zip_with(
                    sh,
                    F.slice(F.col("_w"), i + 1, cnt),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            sh = F.when(n >= w, sh).otherwise(F.array().cast("array<string>"))
        def _tagger(width):
            # factory, not a default arg: a 2-arg lambda would make
            # transform() pass the ARRAY INDEX as the second parameter
            return lambda s: F.struct(
                F.lit(width).cast("bigint").alias("w"), s.alias("sh")
            )

        arrays.append(F.transform(F.array_distinct(sh), _tagger(w)))
    tagged = wdf.select(
        F.explode(F.concat(*arrays)).alias("t")
    ).select(F.col("t.w").alias("w"), F.col("t.sh").alias("sh"))
    return (
        tagged.groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("n_postings"),
            F.countDistinct("sh").cast("bigint").alias("n_distinct"),
        )
        .selectExpr(
            "w",
            "n_postings",
            "n_distinct",
            "CAST((1000000 * n_postings) div n_distinct AS BIGINT) AS mean_df_ppm",
        )
    )


QUERIES["text_shingle_saturation"] = q_text_shingle_saturation

ORACLES["text_shingle_saturation"] = """
WITH words AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
tagged AS (
  SELECT 1 AS w, unnest(list_distinct(l)) AS sh FROM words
  UNION ALL
  SELECT 2, unnest(list_distinct(list_transform(range(1, len(l)),
    i -> l[i] || ' ' || l[i+1]))) FROM words WHERE len(l) >= 2
  UNION ALL
  SELECT 3, unnest(list_distinct(list_transform(range(1, len(l) - 1),
    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) FROM words
  WHERE len(l) >= 3
  UNION ALL
  SELECT 4, unnest(list_distinct(list_transform(range(1, len(l) - 2),
    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3])))
  FROM words WHERE len(l) >= 4
  UNION ALL
  SELECT 5, unnest(list_distinct(list_transform(range(1, len(l) - 3),
    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4])))
  FROM words WHERE len(l) >= 5
)
SELECT CAST(w AS BIGINT) AS w,
       CAST(count(*) AS BIGINT) AS n_postings,
       CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct,
       CAST((1000000 * count(*)) // count(DISTINCT sh) AS BIGINT) AS mean_df_ppm
FROM tagged
GROUP BY w
"""


def _langid_margin_exprs() -> tuple[str, str]:
    """(pred_case, margin) SQL expression texts over the score columns
    s_<lang> — ONE string serves both engines, so the tie-break chain
    and the sorted-score margin can never drift between the Spark query
    and the DuckDB oracle."""
    langs = list(LANG_PROFILES)
    arms = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        ]
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    pred_case = f"CASE {' '.join(arms)} ELSE 'und' END"
    cols = ", ".join(f"s_{lang}" for lang in langs)
    n = len(langs)
    margin = (
        f"(list_sort([{cols}])[{n}] - list_sort([{cols}])[{n - 1}])"
    )
    return pred_case, margin


def q_text_langid_margin(spark, sf_dir):
    """Language-ID confidence margin census: for every document, the
    marker-hit score gap between the winning language and the runner-up
    (two exact integers off one token explode — margin 0 means the call
    was a coin flip, and a pipeline routing docs by language would send
    low-margin docs to a heavier classifier). Reported as
    (pred_lang, margin, n_docs); prediction uses the IDENTICAL
    tie-break chain as text_langid (same generated CASE text), and the
    margin is element -1 minus element -2 of the sorted score array —
    integer end-to-end, engine-exact."""
    from ..ops.text import tokenize

    t = tokenize(_docs(spark, sf_dir))
    aggs = [
        F.sum(F.col("token").isin(words).cast("long")).alias(f"s_{lang}")
        for lang, words in LANG_PROFILES.items()
    ]
    s = t.groupBy("doc_id").agg(*aggs)
    pred_case, margin = _langid_margin_exprs()
    # Spark spells list_sort/[] as array_sort/element_at
    n = len(LANG_PROFILES)
    cols = ", ".join(f"s_{lang}" for lang in LANG_PROFILES)
    margin_spark = (
        f"(element_at(array_sort(array({cols})), {n})"
        f" - element_at(array_sort(array({cols})), {n - 1}))"
    )
    return (
        s.selectExpr(
            f"{pred_case} AS pred_lang",
            f"CAST({margin_spark} AS BIGINT) AS margin",
        )
        .groupBy("pred_lang", "margin")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


QUERIES["text_langid_margin"] = q_text_langid_margin


def _langid_margin_oracle() -> str:
    pred_case, margin = _langid_margin_exprs()
    scores = ",\n       ".join(
        "sum(CASE WHEN token IN ({}) THEN 1 ELSE 0 END) AS s_{}".format(
            ", ".join(f"'{w}'" for w in words), lang
        )
        for lang, words in LANG_PROFILES.items()
    )
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
s AS (
  SELECT doc_id,
       {scores}
  FROM t WHERE token <> '' GROUP BY doc_id
)
SELECT {pred_case} AS pred_lang,
       CAST({margin} AS BIGINT) AS margin,
       CAST(count(*) AS BIGINT) AS n_docs
FROM s GROUP BY pred_lang, margin
"""


ORACLES["text_langid_margin"] = _langid_margin_oracle()
