"""Custom stateful streaming operators via ``applyInPandasWithState``.

The quorum engine (streaming.py) is the faithful replication path; this
module is the Spark-native *stateful operator* surface for analytics
over change streams — running last-writer-wins state, per-key counters
— where strict cross-stream quorum is not required (SURVEY.md W6: the
reference has no such operators; Spark gives them natively).

State is managed by Spark's state store (checkpointed, recoverable);
the user function sees Arrow batches per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LWW_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("value", StringType(), True),
        StructField("step", LongType(), False),
        StructField("tx_id", LongType(), False),
        StructField("n_changes", LongType(), False),
    ]
)

LWW_STATE_SCHEMA = StructType(
    [
        StructField("value", StringType(), True),
        StructField("step", LongType(), False),
        StructField("tx_id", LongType(), False),
        StructField("n_changes", LongType(), False),
    ]
)


def _lww_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        value, step, tx_id, n = state.get
    else:
        value, step, tx_id, n = None, -1, -1, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        # winner of THIS batch = last row in (step, tx_id) order; it
        # replaces the carried state iff its position is >= (LWW ties go
        # to the newer arrival, matching the reference's arrival-order
        # tie-break). One vectorized sort per Arrow batch, no row loop.
        win = pdf.sort_values(["step", "tx_id"]).iloc[-1]
        if (int(win["step"]), int(win["tx_id"])) >= (step, tx_id):
            value, step, tx_id = win["value"], int(win["step"]), int(win["tx_id"])
    state.update((value, step, tx_id, n))
    yield pd.DataFrame(
        [{"key": key[0], "value": value, "step": step, "tx_id": tx_id, "n_changes": n}]
    )


def streaming_lww(
    events: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    step_col: str = "step",
    txid_col: str = "tx_id",
) -> DataFrame:
    """Running last-writer-wins value per key over a stream.

    Emits, per trigger, one row per key seen in the batch with the
    current (post-batch) state — a continuously-maintained compaction
    view. State survives restarts via the streaming checkpoint.
    """
    from pyspark.sql import functions as F

    shaped = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
        F.col(step_col).cast("long").alias("step"),
        F.col(txid_col).cast("long").alias("tx_id"),
    )
    return shaped.groupBy("key").applyInPandasWithState(
        _lww_fn,
        outputStructType=LWW_OUTPUT_SCHEMA,
        stateStructType=LWW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
