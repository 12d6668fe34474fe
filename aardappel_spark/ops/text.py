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
