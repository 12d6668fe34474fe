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
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                meta = _decode_stub(payload, r["kind"])
                out.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "digest": hashlib.md5(payload).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, FEATURE_SCHEMA)


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
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                n = _decode_stub(payload, "video")["n_frames"]
                for f_no in range(0, n, every_n):
                    # stub "frame": digest-derived bytes; real impl decodes
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_no": f_no,
                            "frame": hashlib.md5(payload + f_no.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.filter(F.col("kind") == "video").mapInPandas(run, out_schema)
