"""Casting + apply-kernel tests against the dst_basic golden fixture
(FIXTURES.md §1, reference gen_query_test.go:15-29)."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DecimalType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from aardappel_spark.apply import apply_batch, merge_mutations
from aardappel_spark.casting import TableMeta, cast_fragment, typed_mutations
from aardappel_spark.compact import compact_changes
from aardappel_spark.types import CDC_EVENT_SCHEMA

U64 = 2**64 - 1

META = TableMeta(
    "dst_basic",
    primary_key=["key1", "key2"],
    columns={
        "key1": "Int32",
        "key2": "String",
        "value1": "String",
        "value2": "Uint64",
        "value3": "Optional<Double>",
        "value4": "Optional<String>",
        "value5": "Optional<Timestamp>",
    },
)

DST_SCHEMA = StructType(
    [
        StructField("key1", IntegerType()),
        StructField("key2", BinaryType()),
        StructField("value1", BinaryType()),
        StructField("value2", DecimalType(20, 0)),
        StructField("value3", DoubleType()),
        StructField("value4", BinaryType()),
        StructField("value5", TimestampType()),
    ]
)


def ev(op, key, cols, step, tx_id, seq):
    return (
        0,
        0,
        seq,
        op,
        [str(k) for k in key],
        {k: (None if v is None else str(v)) for k, v in (cols or {}).items()},
        Decimal(step),
        Decimal(tx_id),
        seq,
    )


def events_df(spark, rows):
    return spark.createDataFrame(rows, CDC_EVENT_SCHEMA)


def test_full_type_table(spark):
    # gen_query_test.go:59-70: uint64-max, base64 bytes, double, explicit
    # null Optional<String>, micros timestamp.
    rows = [
        ev(
            "update",
            [15, "MTU="],
            {
                "value1": "MTU=",
                "value2": str(U64),
                "value3": "1.00000009",
                "value4": None,
                "value5": "1970-01-01T00:00:01.000001Z",
            },
            1,
            1,
            0,
        )
    ]
    typed = typed_mutations(compact_changes(events_df(spark, rows)), META)
    [r] = typed.collect()
    assert r.key1 == 15
    assert bytes(r.key2) == b"15"
    assert bytes(r.value1) == b"15"
    assert r.value2 == Decimal(U64)
    assert r.value3 == pytest.approx(1.00000009)
    assert r.value4 is None
    assert r.value5 == datetime.datetime(1970, 1, 1, 0, 0, 1, 1)


def test_pk_arity_error(spark):
    # gen_query.go:295-300 / gen_query_test.go:39-46
    rows = [ev("update", [15], {"value1": "MTU="}, 1, 1, 0)]
    with pytest.raises(Exception, match="CheckPrimaryKeySize"):
        typed_mutations(compact_changes(events_df(spark, rows)), META).collect()


def test_unknown_column_error(spark):
    # gen_query.go:323-325 / gen_query_test.go:48-55
    rows = [ev("update", [15, "MTU="], {"nope": "1"}, 1, 1, 0)]
    with pytest.raises(Exception, match="not in dst table scheme"):
        typed_mutations(compact_changes(events_df(spark, rows)), META).collect()


def test_date_cast(spark):
    df = spark.createDataFrame([("19723",)], ["v"])
    [r] = df.select(cast_fragment(F.col("v"), "Date").alias("d")).collect()
    assert r.d == datetime.date(2024, 1, 1)


def _dst(spark, rows):
    return spark.createDataFrame(rows, DST_SCHEMA)


BASE_ROW = (
    15,
    b"15",
    b"old",
    Decimal(1),
    0.5,
    b"keepme",
    datetime.datetime(2020, 1, 1),
)


def test_merge_partial_update_keeps_absent_columns(spark):
    # Column-set semantics: update carrying only value1 must not clobber
    # value3/value4/value5 (gen_query.go:88-108 column-set grouping).
    dst = _dst(spark, [BASE_ROW])
    rows = [ev("update", [15, "MTU="], {"value1": "bmV3", "value2": "7"}, 1, 1, 0)]
    out = apply_batch(dst, events_df(spark, rows), META).collect()
    [r] = out
    assert bytes(r.value1) == b"new"
    assert r.value2 == Decimal(7)
    assert r.value3 == 0.5  # absent -> kept
    assert bytes(r.value4) == b"keepme"  # absent -> kept


def test_merge_explicit_null_overwrites(spark):
    dst = _dst(spark, [BASE_ROW])
    rows = [ev("update", [15, "MTU="], {"value4": None}, 1, 1, 0)]
    [r] = apply_batch(dst, events_df(spark, rows), META).collect()
    assert r.value4 is None  # explicit null -> NULL
    assert bytes(r.value1) == b"old"


def test_merge_insert_new_key(spark):
    dst = _dst(spark, [BASE_ROW])
    rows = [ev("update", [16, "MTY="], {"value1": "bmV3", "value2": "2"}, 1, 1, 0)]
    out = apply_batch(dst, events_df(spark, rows), META)
    assert out.count() == 2
    [r] = out.filter(F.col("key1") == 16).collect()
    assert bytes(r.key2) == b"16"
    assert r.value3 is None


def test_merge_erase_deletes_row(spark):
    dst = _dst(spark, [BASE_ROW])
    rows = [ev("erase", [15, "MTU="], {}, 1, 1, 0)]
    assert apply_batch(dst, events_df(spark, rows), META).count() == 0


def test_erase_of_missing_key_is_noop(spark):
    dst = _dst(spark, [BASE_ROW])
    rows = [ev("erase", [99, "OTk="], {}, 1, 1, 0)]
    assert apply_batch(dst, events_df(spark, rows), META).count() == 1


def test_replay_guard_checkpoint(spark):
    # F1 boundary: drop pos < checkpoint, KEEP pos == checkpoint
    # (LessThan in processor.go:435-445; strictly-less quorum cut).
    dst = _dst(spark, [BASE_ROW])
    rows = [
        ev("update", [15, "MTU="], {"value1": "b2xkZXI="}, 1, 1, 0),  # replayed
        ev("update", [15, "MTU="], {"value1": "YXRjaGs="}, 2, 2, 1),  # == ckpt
    ]
    [r] = apply_batch(dst, events_df(spark, rows), META, checkpoint=(2, 2)).collect()
    assert bytes(r.value1) == b"atchk"


def test_idempotent_replay(spark):
    # §4.3: applying the same batch twice converges to the same state.
    dst = _dst(spark, [BASE_ROW])
    rows = [
        ev("update", [15, "MTU="], {"value1": "bmV3"}, 3, 1, 0),
        ev("erase", [16, "MTY="], {}, 3, 2, 1),
        ev("update", [17, "MTc="], {"value1": "bmV3", "value2": "9"}, 3, 3, 2),
    ]
    once = apply_batch(dst, events_df(spark, rows), META)
    twice = apply_batch(once, events_df(spark, rows), META)
    a = sorted([tuple(r) for r in once.collect()])
    b = sorted([tuple(r) for r in twice.collect()])
    assert a == b


def test_erase_cancelled_by_update_keeps_existing_columns(spark):
    # Reference UPSERT semantics: [erase k, update k {c}] in ONE batch
    # cancels the delete entirely (gen_query.go:407-410), so a
    # pre-existing row keeps its other columns — the erase does NOT wipe
    # them. (Batch-boundary-dependent by design; see apply.q_apply note.)
    dst = _dst(spark, [BASE_ROW])
    rows = [
        ev("erase", [15, "MTU="], {}, 5, 1, 0),
        ev("update", [15, "MTU="], {"value2": "9"}, 5, 2, 1),
    ]
    [r] = apply_batch(dst, events_df(spark, rows), META).collect()
    assert r.value2 == Decimal(9)  # updated
    assert bytes(r.value1) == b"old"  # survived the cancelled erase
    assert r.value3 == 0.5
