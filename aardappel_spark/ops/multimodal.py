"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not available in this container, so
the DECODE STEP IS STUBBED (deterministic fake based on the payload
bytes) — but the Spark-side plumbing is real and tested: schema, Arrow
batch shape, ``mapInPandas`` signature, partition behavior. Swapping the
fake for PIL/ffmpeg is a one-function change.

Scale notes: payloads stay in executor memory as Arrow binary columns;
``mapInPandas`` streams record batches so a partition never materializes
all payloads at once. Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
modest (e.g. 1024) when payloads are MBs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode. REAL IMPLEMENTATION WOULD USE
    PIL/soundfile/av — unavailable here (see module docstring)."""
    if payload is None:
        raise NotImplementedError("decode of empty payload")
    d = hashlib.md5(payload).digest()
    return {
        "width": 16 + d[0] if kind == "image" else None,
        "height": 16 + d[1] if kind == "image" else None,
        "n_frames": 1 + d[2] if kind == "video" else None,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Column-at-a-time inside the Arrow batch: one pass builds the payload
    list, one md5 per payload (hashing is inherently per-payload), and
    the output columns assemble as whole arrays — no ``iterrows`` Series
    construction per row. Nullable ints use pandas ``Int32`` so absent
    dimensions stay NULL, matching FEATURE_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            digests = [hashlib.md5(p) for p in payloads]
            kinds = pdf["kind"].tolist()
            raw = [d.digest() for d in digests]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": kinds,
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [d.hexdigest() for d in digests],
                    "width": pd.array(
                        [16 + b[0] if k == "image" else None for b, k in zip(raw, kinds)],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [16 + b[1] if k == "image" else None for b, k in zip(raw, kinds)],
                        dtype="Int32",
                    ),
                    "n_frames": pd.array(
                        [1 + b[2] if k == "video" else None for b, k in zip(raw, kinds)],
                        dtype="Int32",
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: the UTF-8
    text bytes stand in for an opaque payload (the container has no real
    image/audio corpora), kind cycles by doc_id. Lets the multimodal
    plumbing run oracle-gated on driver testdata — n_bytes and digest
    are engine-independent facts about the payload bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            "CASE pmod(doc_id, 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
        ).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_no, frame_bytes) rows. Decode stubbed; fan-out shape is real."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, p in zip(pdf["media_id"].tolist(), pdf["payload"]):
                payload = bytes(p) if p is not None else b""
                n = _decode_stub(payload, "video")["n_frames"]
                nos = range(0, n, every_n)
                ids.extend([mid] * len(nos))
                frame_nos.extend(nos)
                # stub "frame": digest-derived bytes; real impl decodes.
                # The counter suffix is ASCII (":N") so an engine whose
                # md5 only takes VARCHAR can replay the exact digest.
                frames.extend(
                    hashlib.md5(payload + f":{f_no}".encode()).digest()
                    for f_no in nos
                )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames},
                columns=["media_id", "frame_no", "frame"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, out_schema)
