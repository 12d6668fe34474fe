"""Heartbeat tracking and quorum (safe watermark) computation.

Behavioral spec: /root/reference/internal/hb_tracker/hb_tracker.go:
  * AddHb keeps the newest heartbeat per (reader, partition)   (:128-194)
  * GetQuorum = min over the complete set — only when EVERY partition of
    EVERY stream has reported                                  (:196-219)
  * GetMaxHb = max over the first complete set (initial scan)  (:221-237)
  * GetQuorumAfter = quorum only if strictly greater           (:239-250)
  * findMissed = partitions with no heartbeat yet              (:62-74)
The quorum cut over data is STRICTLY-LESS: an event equal to the quorum
belongs to the next batch (tx_queue.go:26-33, README.md:140-143).

Spark's built-in watermark is a per-query heuristic, not a strict
multi-stream quorum, so this is explicit aggregation (SURVEY.md W1) — the
one genuinely custom piece of streaming logic. All of it is tiny metadata
(one row per partition), so these aggregations are negligible at any scale.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .types import pos, pos_lit


def latest_heartbeats(heartbeats: DataFrame) -> DataFrame:
    """A1: newest heartbeat per (table_id, partition)."""
    return heartbeats.groupBy("table_id", "partition").agg(
        F.max(pos()).alias("hb")
    )


def get_quorum(
    heartbeats: DataFrame, expected_partitions: int
) -> tuple[Decimal, Decimal] | None:
    """A2/W1: min over per-partition max heartbeats, gated on completeness.

    Returns None until every one of ``expected_partitions`` (table_id,
    partition) pairs has reported — progress is hostage to the slowest
    partition by design (README.md:694-695).
    """
    row = (
        latest_heartbeats(heartbeats)
        .agg(F.min("hb").alias("q"), F.count("*").alias("n"))
        .collect()[0]
    )
    if row.n < expected_partitions or row.q is None:
        return None
    return (row.q.step, row.q.tx_id)


def get_max_hb(heartbeats: DataFrame) -> tuple[Decimal, Decimal] | None:
    """A3: max over latest heartbeats (initial-scan sync point)."""
    row = latest_heartbeats(heartbeats).agg(F.max("hb").alias("m")).collect()[0]
    if row.m is None:
        return None
    return (row.m.step, row.m.tx_id)


def get_quorum_after(
    heartbeats: DataFrame,
    expected_partitions: int,
    after: tuple[int | Decimal, int | Decimal],
) -> tuple[Decimal, Decimal] | None:
    """A4: quorum only if strictly greater than ``after``."""
    q = get_quorum(heartbeats, expected_partitions)
    if q is None:
        return None
    if (Decimal(q[0]), Decimal(q[1])) <= (Decimal(after[0]), Decimal(after[1])):
        return None
    return q


def missing_partitions(heartbeats: DataFrame, layout: DataFrame) -> DataFrame:
    """A5: expected-layout rows with no heartbeat yet, counted per stream.

    ``layout`` has one row per expected (table_id, partition) — from config
    / topic discovery (doDescribeTopics, main.go:119-138).
    """
    seen = latest_heartbeats(heartbeats).select("table_id", "partition")
    return (
        layout.join(seen, ["table_id", "partition"], "left_anti")
        .groupBy("table_id")
        .agg(F.count("*").alias("missing_partitions"))
    )


def cut_below_quorum(
    events: DataFrame, quorum: tuple[int | Decimal, int | Decimal]
) -> DataFrame:
    """F5: exactly the events with position strictly below the quorum;
    equal positions go to the NEXT batch (README.md:140-143)."""
    return events.filter(pos() < pos_lit(quorum[0], quorum[1]))


def out_of_order_events(events: DataFrame, heartbeats: DataFrame) -> DataFrame:
    """F4/W3: changes older than their own partition's latest heartbeat —
    problem messages to route (cmd-queue / DLQ / stop).

    Broadcast the (tiny) per-partition heartbeat table so detection adds no
    shuffle to the data path (verifyStream, reader.go:150-207).
    """
    hb = F.broadcast(latest_heartbeats(heartbeats))
    return (
        events.join(hb, ["table_id", "partition"], "left")
        .filter(F.col("hb").isNotNull() & (pos() < F.col("hb")))
        .drop("hb")
    )
