"""Document chunking and sequence packing — the prep steps between a
cleaned corpus and a training dataloader.

Chunking splits each document's token sequence into fixed-size windows
(with optional overlap) entirely with array expressions: one sequence()
of chunk starts, one slice per start, one posexplode. Row-local until
the explode, no UDFs, linear at any corpus size.

Packing assigns chunks to fixed-capacity context windows ("bins"). A
single global greedy pack is inherently sequential, so the scalable
formulation shards the corpus into hash buckets and packs within each
bucket by running token count: bin boundaries fall wherever the
exclusive cumulative sum crosses a capacity multiple (chunks may
straddle — standard for pretraining packing). One window shuffle keyed
on the bucket; bucket count scales the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import sample_ticket
from .text import tokens_col


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 16,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into chunks of ``chunk_tokens`` whitespace
    tokens, consecutive chunks sharing ``overlap`` tokens. The final
    chunk may be shorter. Empty documents produce no chunks.

    Output: (id, chunk_id, chunk_text, n_tokens), chunk_id 0-based in
    document order.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.expr("array()").cast("array<int>")
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join("_c", " ").alias("chunk_text"),
        F.size("_c").cast("bigint").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    context_tokens: int = 64,
    n_buckets: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every chunk a (bucket, bin) context-window slot.

    Deterministic: bucket = salted-md5 ticket of the doc id mod
    ``n_buckets``; within a bucket, chunks ordered by (doc, chunk_id)
    fill bins of ``context_tokens`` capacity by exclusive running token
    count. Globally unique window id = (bucket, bin).
    """
    bucket = (sample_ticket(id_col, "pack") % n_buckets).alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    cum_excl = (cum - F.col("n_tokens")).cast("long")
    return chunks.select(
        F.col(id_col), "chunk_id", "n_tokens", bucket
    ).withColumn("bin", (cum_excl / F.lit(context_tokens)).cast("long"))
