"""Text analysis operators over a document table: tokenization, stats,
quality scoring, language ID heuristic, fingerprinting.

Design: all pure JVM expressions (split/explode/aggregate) — no Python
UDFs — so they run inside whole-stage codegen and scale linearly. Each
operator takes/returns DataFrames and is oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small closed-class stopword list used by quality scoring; deterministic
# and replicated verbatim in the SQL oracles.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def tokens_col(text_col: str | Column = "text") -> Column:
    """Whitespace tokens, empty strings dropped."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Long-format (id, token) — one shuffle-free explode."""
    return docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: n_tokens, n_uniq_tokens, avg_token_len."""
    t = tokenize(docs, id_col, text_col)
    return t.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("token").alias("n_uniq_tokens"),
        F.round(F.avg(F.length("token")), 4).alias("avg_token_len"),
    )


def quality_by_group(
    docs: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus quality profile per group: doc count, avg tokens/doc,
    stopword ratio (high ratio ~ natural prose, low ~ keyword spam)."""
    t = docs.select(
        *group_cols, F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
    )
    stop = F.col("token").isin(STOPWORDS).cast("long")
    return (
        t.groupBy(*group_cols)
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_tokens"),
            F.round(F.count("*") / F.countDistinct(id_col), 4).alias("avg_doc_tokens"),
            F.round(F.sum(stop) / F.count("*"), 6).alias("stopword_ratio"),
        )
    )


# Marker-word profiles for the language-ID heuristic. Deterministic and
# replicated in the SQL oracle; tie-break order is the dict order below.
LANG_PROFILES = {
    "en": ["the", "a", "of", "to", "and", "is", "in", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "de", "un", "est", "dans"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "he2", "wo3", "ta1"],
}


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """n-gram/marker-word language ID heuristic: score each language by
    marker-token hits; highest score wins (ties resolve in profile
    order); no hits -> 'und'. One explode + one aggregation."""
    t = tokenize(docs, id_col, text_col)
    aggs = [
        F.sum(F.col("token").isin(words).cast("long")).alias(f"_s_{lang}")
        for lang, words in LANG_PROFILES.items()
    ]
    scored = t.groupBy(id_col).agg(*aggs)

    langs = list(LANG_PROFILES)
    pred = F.lit("und")
    # build the when-chain backwards so earlier langs win ties
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        later = [F.col(f"_s_{l}") for l in langs[i + 1 :]]
        cond = F.col(f"_s_{lang}") > 0
        for lcol in later:
            cond = cond & (F.col(f"_s_{lang}") >= lcol)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint: md5 over the sorted distinct token
    set — invariant to word order and duplication (bag-of-words identity).
    """
    toks = F.array_sort(F.array_distinct(tokens_col(text_col)))
    return docs.select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fp"),
    )


# GPT-2-style approximation: word | number | single punctuation rune.
# Same RE2/Java-compatible pattern string is used verbatim in the SQL
# oracle, so both engines tokenize identically.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens_col(text_col: str | Column = "text") -> Column:
    """BPE-ish pre-tokenization: contiguous letter runs, digit runs, and
    individual punctuation — the coarse split BPE vocabularies refine.
    Pure JVM regexp, order-preserving, no explode needed for counting."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc BPE-ish token counts split by class (alpha/number/punct).
    All counts come from one regexp pass + array HOFs — no shuffle at
    all until the caller aggregates."""
    toks = bpe_tokens_col(text_col)

    def n_matching(pat: str) -> Column:
        return F.size(F.filter(toks, lambda t: t.rlike(pat))).cast("bigint")

    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        n_matching("^[A-Za-z]+$").alias("n_alpha"),
        n_matching("^[0-9]+$").alias("n_num"),
        n_matching("^[^A-Za-z0-9]$").alias("n_punct"),
    )


ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def rolling_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-SENSITIVE document fingerprint: polynomial rolling hash over
    the BPE-ish token sequence, h = fold(h * 31 + md5_28(token) mod p).
    Complements ``fingerprint`` (bag-of-words, order-invariant): two docs
    with the same words in different order fingerprint equal there but
    differ here. Token hash is the first 28 bits (7 hex digits) of md5 so
    the fold stays within int64 (max acc*31 + h < 2^35 * 31 + 2^28 << 2^63)."""
    toks = bpe_tokens_col(text_col)
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")
    )
    roll = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLL_BASE) + h) % F.lit(ROLL_MOD),
    )
    return docs.select(F.col(id_col), roll.alias("roll_fp"))


def doc_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Per-document quality signals + keep flag — the row-level filter a
    training-data pipeline runs before dedup (length, punctuation and
    stopword ratios; heuristics in the C4/Gopher style). All ratios are
    computed from one BPE-ish regexp pass per document (array HOFs, no
    explode, no shuffle); the keep flag is a plain conjunction so
    downstream `.filter("keep")` pushes to the scan."""
    toks = bpe_tokens_col(text_col)
    n = F.size(toks).cast("bigint")

    def n_matching(pat: str) -> Column:
        return F.size(F.filter(toks, lambda t: t.rlike(pat))).cast("bigint")

    n_punct = n_matching("^[^A-Za-z0-9]$")
    stop_list = [s for s in STOPWORDS]
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(stop_list))
    ).cast("bigint")
    punct_ratio = F.round(n_punct / F.greatest(n, F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n, F.lit(1)), 6)
    keep = (
        (n >= min_tokens)
        & (punct_ratio <= max_punct_ratio)
        & (stop_ratio >= min_stopword_ratio)
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        keep.alias("keep"),
    )


def unigram_nll(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram language-model score: per-document mean negative
    log-likelihood under the corpus's own unigram distribution,
    avg(-ln(count(token)/N)). The LM-perplexity-style quality filter a
    training pipeline runs after heuristics: gibberish and boilerplate
    sit far from the corpus distribution (high NLL = rare-token soup,
    very low NLL = repeated-token spam).

    Shape: one explode, one token-count agg, one join of tokens against
    that frequency table (shuffle keyed on token — the Zipf head is
    skewed, which AQE's skew-join splitting absorbs), one per-doc agg.
    The corpus total rides along as a broadcast 1-row frame, not a
    driver collect.
    """
    t = tokenize(docs, id_col, text_col)
    freq = t.groupBy("token").agg(F.count("*").alias("_c"))
    total = t.agg(F.count("*").alias("_n"))
    scored = t.join(freq, "token").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(F.avg(F.log(F.col("_n")) - F.log(F.col("_c"))), 4).alias("nll"),
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document — the keyword-extraction pass a
    training pipeline uses for topic tagging and retrieval indexing.
    score = tf * ln(N/df); ranking is on the ROUNDED score (6 dp) with a
    token tie-break, so the cut is deterministic and engine-portable.

    Shape: one explode, a (doc, token) hash-agg for tf, a token-keyed agg
    for df (over the already-distinct tf frame, so df is one count, not a
    countDistinct), a 1-row broadcast for N, and one per-doc window for
    the top-k. The window partitions by doc id — even partition spread,
    no global sort.
    """
    t = tokenize(docs, id_col, text_col)
    tf = t.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = tf.join(df_, "token").crossJoin(F.broadcast(n))
    score = F.round(
        F.col("tf") * (F.log(F.col("n_docs")) - F.log(F.col("df"))), 6
    ).alias("score")
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.select(F.col(id_col), "token", F.col("tf").cast("bigint").alias("tf"), score)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# Fixed retrieval query for the BM25 demo query; replicated in the oracle.
BM25_QUERY_TERMS = ["table", "join", "window"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval of the top-k documents for a bag-of-words
    query — the classic lexical scorer behind search/retrieval joins.
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson-Sparck Jones),
    tf norm = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)).

    Shape: the corpus explodes ONCE; doc lengths and per-(doc, term) tfs
    come from that one long frame; df and avgdl are tiny aggregates that
    broadcast. Only docs containing >= 1 query term reach the scorer
    (inner join on the term list), so the final ranking operates on a
    small candidate set — a TakeOrdered, not a full sort.
    """
    terms = list(query_terms or BM25_QUERY_TERMS)
    t = tokenize(docs, id_col, text_col)
    # checkpoint the small aggregates so their two consumers don't each
    # re-run the corpus tokenize (dl feeds the scorer AND the stats;
    # tf feeds the scorer AND the df count): 2 corpus passes, not 4
    dl = t.groupBy(id_col).agg(F.count("*").alias("dl")).localCheckpoint(
        eager=False
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = t.filter(F.col("token").isin(terms))
    tf = (
        qt.groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.sum(idf * tfn), 6).alias("bm25"),
        F.count("*").cast("bigint").alias("n_terms_hit"),
    )
    return per_doc.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def boilerplate_stats(
    docs: DataFrame,
    ngram_words: int = 5,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-span detection: the fraction of each document's word
    n-grams that are 'common' (appear in >= min_docs distinct documents)
    — headers, footers, and licence blocks repeat verbatim across a
    corpus, and a high ratio marks a template-heavy page (the
    RefinedWeb/CCNet-style line-dedup signal re-expressed over grams).

    Shape: one explode to grams, a distinct (doc, gram) projection into a
    gram-keyed df count, a left join of the gram stream against the
    common-gram set (semi-join shape — Catalyst broadcasts it when
    small), one per-doc agg. Integer counts + one division: engine-exact.

    Grams are hashed to their first 60 md5 bits BEFORE any shuffle: the
    repeated-shuffle keys become 8 bytes instead of ~n_words*avg_word
    strings (the dedup_exact trick). Hash-gram semantics (collisions
    deterministically merge) are replicated in the oracle, so the output
    stays engine-exact.
    """
    from .dedup import shingles_col

    gh = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long")
    g = docs.select(
        F.col(id_col), F.explode(shingles_col(text_col, k=ngram_words)).alias("gram")
    ).select(F.col(id_col), gh.alias("gh"))
    # single (doc, gh) aggregation feeds BOTH the df count and the
    # per-doc totals. ReuseExchange does NOT merge the two consumers
    # (the df-count side re-keys on gh, so its exchange differs and the
    # whole explode + md5 subtree planned twice — two full document
    # scans in the r13 before-plan); a lazy localCheckpoint pins the
    # (doc, gh, occ) blocks so both consumers read one materialization.
    occ = (
        g.groupBy(id_col, "gh")
        .agg(F.count("*").alias("occ"))
        .localCheckpoint(eager=False)
    )
    docs_per_gram = occ.groupBy("gh").agg(F.count("*").alias("gdf"))
    common = docs_per_gram.filter(F.col("gdf") >= min_docs).select(
        "gh", F.lit(1).alias("_common")
    )
    flagged = occ.join(common, "gh", "left").withColumn(
        "_nc", F.col("occ") * F.coalesce(F.col("_common"), F.lit(0))
    )
    return flagged.groupBy(id_col).agg(
        F.sum("occ").cast("bigint").alias("n_grams"),
        F.sum("_nc").cast("bigint").alias("n_common"),
        F.round(F.sum("_nc") / F.sum("occ"), 6).alias("boiler_ratio"),
    )


# PII patterns: RE2/Java-common syntax so Spark and SQL oracles agree.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and phone numbers, reporting per-document counts —
    the safety pass a training pipeline runs before publishing a corpus.
    Row-local regexp expressions only (count via regexp_extract_all,
    redact via regexp_replace): no shuffle, pipelines into the scan."""
    t = F.col(text_col)
    n_emails = F.size(
        F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), F.lit(0))
    ).cast("bigint")
    n_phones = F.size(
        F.regexp_extract_all(t, F.lit(PHONE_PATTERN), F.lit(0))
    ).cast("bigint")
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), PHONE_PATTERN, "<PHONE>"
    )
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def postings(
    docs: DataFrame,
    top_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index summary: for the ``top_tokens`` highest-df tokens,
    the posting-list profile (document frequency, total term frequency,
    and the top-scoring document). The index-build step of lexical
    retrieval, shaped for scale: one explode, one (doc, token) hash-agg
    — posting lists are never materialized as arrays, the top document
    comes from a token-partitioned window (rank-1 row), and the top-N
    token cut is a TakeOrdered. Ties are total-ordered everywhere
    (df desc then token; tf desc then doc id)."""
    from pyspark.sql.window import Window

    t = tokenize(docs, id_col, text_col)
    tf = t.groupBy("token", id_col).agg(F.count("*").alias("tf"))
    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc(id_col))
    ranked = tf.withColumn("_rn", F.row_number().over(w))
    stats = tf.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    top = ranked.filter(F.col("_rn") == 1).select(
        "token",
        F.col(id_col).alias("top_doc_id"),
        F.col("tf").cast("bigint").alias("top_tf"),
    )
    return (
        stats.join(top, "token")
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(top_tokens)
    )
