"""Blocked-key filter and binary key serialization.

Behavioral spec:
  * serialization layout [fmt=0x01][table_path][raw key fragments...] —
    /root/reference/internal/util/key_serializer/key_serializer.go:9-35
    (byte-level expectations in key_serializer_test.go:8-31);
  * filter semantics: membership of the serialized key in a per-instance
    blocked set, loaded from a table at startup —
    /root/reference/internal/processor/key_filter_ydb.go:26-135;
  * filtering happens during batch routing (isSkippedByFilterAction,
    processor.go:476-481).

Spark-first: the blocked-key set is a DataFrame; filtering is a
broadcast LEFT ANTI join on the serialized key — no driver-side set, no
shuffle of the data side. The reference's test exercises ~1M keys
(key_filter_test.go:22-28): 1M × ~50B ≈ 50 MB, comfortably
broadcastable; beyond that, drop the broadcast hint and let AQE pick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .localrel import local_df

FMT_RAW = 1


def serialize_key_col(
    key_col: str | Column = "key", table_path: str | Column = "", fmt: int = FMT_RAW
) -> Column:
    """Binary key: [fmt byte][table path][key fragments concatenated].

    Key fragments are the raw JSON token texts (what parse.py keeps), so
    the bytes match the reference's json.RawMessage concatenation for
    scalar keys.
    """
    if fmt != FMT_RAW:
        raise ValueError(f"unexpected key serialization format: {fmt}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    path = F.lit(table_path) if isinstance(table_path, str) else table_path
    return F.concat(
        F.lit(bytes([FMT_RAW])),
        path.cast("binary"),
        F.array_join(key, "").cast("binary"),
    )


def filter_blocked_keys(
    events: DataFrame,
    blocked: DataFrame,
    table_path: str | Column = "",
    key_col: str = "key",
    blocked_key_col: str = "key",
    broadcast: bool = True,
) -> DataFrame:
    """F3/J1: drop events whose serialized key is blocked.

    ``blocked`` carries BINARY serialized keys (FIXTURES.md §6). The
    anti-join is broadcast by default (small dimension); pass
    broadcast=False at very large filter sizes.
    """
    b = blocked.select(F.col(blocked_key_col).alias("_blocked_key")).distinct()
    if broadcast:
        b = F.broadcast(b)
    ev = events.withColumn(
        "_filter_key", serialize_key_col(key_col, table_path)
    )
    return (
        ev.join(b, ev["_filter_key"] == b["_blocked_key"], "left_anti")
        .drop("_filter_key")
    )


def blocked_keys_from_table(
    blocked_table: DataFrame, instance_id: str
) -> DataFrame:
    """Load this instance's blocked keys (readKeys,
    key_filter_ydb.go:51-85): table (instance_id, key binary)."""
    return blocked_table.filter(F.col("instance_id") == instance_id).select("key")


STORE_BATCH_SIZE = 100  # storeBatchSz, key_filter_ydb.go:24


def store_blocked_keys(
    spark,
    table_path: str,
    instance_id: str,
    keys: list[bytes],
    batch_size: int = STORE_BATCH_SIZE,
) -> int:
    """S13 store path (AddKeysToBlock + storeKeys,
    key_filter_ydb.go:87-131): persist newly blocked keys for this
    instance in batches of at most ``batch_size`` rows — each batch one
    append commit, the file-table parallel of the reference's <=100-row
    UPSERT transactions. Returns the number of batches written.

    Keys are driver-side ``bytes`` (they arrive via the operator command
    path, not a data pipeline), so the per-batch DataFrames are tiny;
    the reload side (``blocked_keys_from_table``) stays a distributed
    scan + broadcast."""
    n_batches = 0
    for i in range(0, len(keys), batch_size):
        chunk = keys[i : i + batch_size]
        df = local_df(
            spark,
            [(instance_id, bytearray(k)) for k in chunk],
            "instance_id string, key binary",
        )
        df.coalesce(1).write.mode("append").parquet(table_path)
        n_batches += 1
    return n_batches
