"""Parse-rule tests — semantics from /root/reference/internal/util/reader/parse.go."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from aardappel_spark.parse import (
    ERR_NOT_JSON,
    ERR_TS_ARITY,
    ERR_UNKNOWN_KIND,
    parse_messages,
    split_events,
    split_heartbeats,
    split_problems,
    strict,
)

U64 = 2**64 - 1


def parse(spark, msgs):
    df = spark.createDataFrame(
        [(i % 2, i, m) for i, m in enumerate(msgs)], ["partition", "offset", "value"]
    )
    return parse_messages(df, table_id_col=None).collect()


def test_update_message(spark):
    # gen_query_test fixture message with uint64-max everywhere
    [r] = parse(
        spark,
        [
            '{"update":{"value1":"MTU=","value2":18446744073709551615,"value4":null},'
            '"key":[15,"MTU="],"ts":[18446744073709551615,1]}'
        ],
    )
    assert r.error is None
    assert r.op == "update"
    assert r.key == ["15", "MTU="]
    assert r.columns == {"value1": "MTU=", "value2": str(U64), "value4": None}
    assert r.step == Decimal(U64)
    assert r.tx_id == Decimal(1)


def test_erase_has_empty_columns(spark):
    # parse.go:47-50
    [r] = parse(spark, ['{"erase":{},"key":[16],"ts":[2,7]}'])
    assert r.op == "erase" and r.columns == {} and r.error is None


def test_new_image_wins_when_nonempty(spark):
    # parse.go:40-44
    [a, b] = parse(
        spark,
        [
            '{"update":{"a":"1"},"newImage":{"b":"2"},"key":[1],"ts":[1,2]}',
            '{"update":{"a":"1"},"newImage":{},"key":[1],"ts":[1,2]}',
        ],
    )
    assert a.columns == {"b": "2"}
    assert b.columns == {"a": "1"}


def test_resolved_heartbeat(spark):
    [r] = parse(spark, ['{"resolved":[1718408057082,0]}'])
    assert r.op == "resolved"
    assert r.step == Decimal(1718408057082) and r.tx_id == Decimal(0)
    assert r.error is None


def test_update_and_erase_both_present_is_error(spark):
    # parse.go:33-36 exclusivity
    [r] = parse(spark, ['{"update":{"a":"1"},"erase":{},"key":[1],"ts":[1,2]}'])
    assert r.error == ERR_UNKNOWN_KIND


def test_neither_kind_is_error(spark):
    [r] = parse(spark, ['{"key":[1],"ts":[1,2]}'])
    assert r.error == ERR_UNKNOWN_KIND


def test_ts_arity_error(spark):
    # parse.go:54-60
    [a, b] = parse(
        spark,
        [
            '{"update":{"a":"1"},"key":[1],"ts":[1,2,3]}',
            '{"update":{"a":"1"},"key":[1]}',
        ],
    )
    assert a.error == ERR_TS_ARITY
    assert b.error == ERR_TS_ARITY


def test_garbage_is_error(spark):
    [r] = parse(spark, ["not json at all"])
    assert r.error == ERR_NOT_JSON


def test_splits(spark):
    msgs = [
        '{"update":{"a":"1"},"key":[1],"ts":[1,2]}',
        '{"erase":{},"key":[2],"ts":[3,4]}',
        '{"resolved":[5,0]}',
        "garbage",
    ]
    df = spark.createDataFrame(
        [(0, i, m) for i, m in enumerate(msgs)], ["partition", "offset", "value"]
    )
    parsed = parse_messages(df, table_id_col=None)
    assert split_events(parsed).count() == 2
    assert split_heartbeats(parsed).count() == 1
    assert split_problems(parsed).count() == 1


def test_strict_raises(spark):
    df = spark.createDataFrame([(0, 0, "garbage")], ["partition", "offset", "value"])
    with pytest.raises(Exception, match="parse"):
        strict(parse_messages(df, table_id_col=None)).collect()


def test_seq_uses_offset(spark):
    [r] = parse(spark, ['{"update":{"a":"1"},"key":[1],"ts":[1,2]}'])
    assert r.seq == r.offset
