"""Quorum/heartbeat tests — scenarios from
/root/reference/tests/hb_tracker/hb_tracker_test.go:10-88 and
/root/reference/internal/tx_queue/tx_queue_test.go:68-107 (FIXTURES.md §4)."""

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from aardappel_spark.quorum import (
    cut_below_quorum,
    get_max_hb,
    get_quorum,
    get_quorum_after,
    latest_heartbeats,
    missing_partitions,
    out_of_order_events,
)
from aardappel_spark.types import CDC_EVENT_SCHEMA

HB_SCHEMA = StructType(
    [
        StructField("table_id", IntegerType()),
        StructField("partition", IntegerType()),
        StructField("step", DecimalType(20, 0)),
        StructField("tx_id", DecimalType(20, 0)),
    ]
)

# layout from hb_tracker_test.go:10-20 — streams {1,1,2} partitions => 4 units
LAYOUT = [(0, 0), (1, 0), (2, 0), (2, 1)]


def hb(table_id, partition, step, tx_id=0):
    return (table_id, partition, Decimal(step), Decimal(tx_id))


def hbdf(spark, rows):
    return spark.createDataFrame(rows, HB_SCHEMA)


def test_no_quorum_until_all_partitions_report(spark):
    # hb_tracker_test.go: readiness requires every partition
    rows = [hb(0, 0, 6), hb(1, 0, 7), hb(2, 0, 4)]  # 2/1 missing
    assert get_quorum(hbdf(spark, rows), expected_partitions=4) is None


def test_quorum_is_min_over_latest(spark):
    # steps {6,7,4,5} -> quorum 4
    rows = [
        hb(0, 0, 2),
        hb(0, 0, 6),  # newer supersedes
        hb(1, 0, 7),
        hb(2, 0, 4),
        hb(2, 1, 5),
    ]
    q = get_quorum(hbdf(spark, rows), 4)
    assert q == (Decimal(4), Decimal(0))


def test_latest_heartbeat_per_partition(spark):
    rows = [hb(0, 0, 2), hb(0, 0, 6), hb(0, 0, 3)]  # regress ignored via max
    [r] = latest_heartbeats(hbdf(spark, rows)).collect()
    assert r.hb.step == Decimal(6)


def test_max_hb_initial_scan(spark):
    rows = [hb(0, 0, 6), hb(1, 0, 7), hb(2, 0, 4), hb(2, 1, 5)]
    assert get_max_hb(hbdf(spark, rows)) == (Decimal(7), Decimal(0))


def test_quorum_after(spark):
    rows = [hb(0, 0, 6), hb(1, 0, 7), hb(2, 0, 4), hb(2, 1, 5)]
    df = hbdf(spark, rows)
    assert get_quorum_after(df, 4, (4, 0)) is None  # equal -> not after
    assert get_quorum_after(df, 4, (3, 9)) == (Decimal(4), Decimal(0))


def test_missing_partition_census(spark):
    layout = spark.createDataFrame(LAYOUT, ["table_id", "partition"])
    rows = [hb(0, 0, 6), hb(2, 0, 4)]
    out = {
        r.table_id: r.missing_partitions
        for r in missing_partitions(hbdf(spark, rows), layout).collect()
    }
    assert out == {1: 1, 2: 1}


def ev(step, tx_id, seq, op="update", partition=0):
    return (
        0,
        partition,
        seq,
        op,
        ["1"],
        {},
        Decimal(step),
        Decimal(tx_id),
        seq,
    )


def test_strictly_less_cut(spark):
    # tx_queue_test.go:68-107 boundary: pop everything < (2,1); the (2,1)
    # rows and above stay for the next batch.
    rows = [
        ev(1, 1, 0),
        ev(1, 2, 1),
        ev(2, 1, 2),
        ev(2, 1, 3),
        ev(3, 1, 4),
        ev(8, 2, 5),
    ]
    df = spark.createDataFrame(rows, CDC_EVENT_SCHEMA)
    got = sorted(
        (int(r.step), int(r.tx_id)) for r in cut_below_quorum(df, (2, 1)).collect()
    )
    assert got == [(1, 1), (1, 2)]


def test_out_of_order_detection(spark):
    # F4: event older than its partition's latest hb is a problem message;
    # other partitions unaffected.
    events = spark.createDataFrame(
        [ev(3, 0, 0, partition=0), ev(9, 0, 1, partition=0), ev(3, 0, 2, partition=1)],
        CDC_EVENT_SCHEMA,
    )
    hbs = hbdf(spark, [hb(0, 0, 5)])  # partition 0 saw hb at step 5
    bad = out_of_order_events(events, hbs).collect()
    assert len(bad) == 1
    assert bad[0].seq == 0
