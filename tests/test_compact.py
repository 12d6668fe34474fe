"""Golden compaction scenarios, re-expressed as final-mutation assertions.

Scenario sources (behavior only): the reference's golden tests
/root/reference/internal/dst_table/gen_query_test.go:89-203 and FIXTURES.md §3.
"""

from decimal import Decimal

import pytest

from aardappel_spark.compact import compact_changes
from aardappel_spark.types import CDC_EVENT_SCHEMA


def ev(op, key, cols, step, tx_id, seq, table_id=0, partition=0, offset=None):
    return (
        table_id,
        partition,
        offset if offset is not None else seq,
        op,
        [str(k) for k in key],
        {k: (None if v is None else str(v)) for k, v in (cols or {}).items()},
        Decimal(step),
        Decimal(tx_id),
        seq,
    )


def run(spark, rows):
    df = spark.createDataFrame(rows, CDC_EVENT_SCHEMA)
    out = compact_changes(df).collect()
    return {(r.table_id, r.key_json): r for r in out}


def test_update_then_erase_yields_delete_only(spark):
    # gen_query_test.go TestGenQuery txData2/4 cancellation
    res = run(
        spark,
        [
            ev("update", [15, "MTU="], {"value1": "a"}, 1, 1, 0),
            ev("erase", [15, "MTU="], {}, 2, 1, 1),
        ],
    )
    r = res[(0, '["15","MTU="]')]
    assert r.op == "erase"
    assert r.columns == {}


def test_erase_then_update_yields_upsert_only(spark):
    res = run(
        spark,
        [
            ev("erase", [15, "MTU="], {}, 1, 1, 0),
            ev("update", [15, "MTU="], {"value1": "a"}, 2, 1, 1),
        ],
    )
    r = res[(0, '["15","MTU="]')]
    assert r.op == "update"
    assert r.columns == {"value1": "a"}


def test_column_set_merge_later_value_wins(spark):
    # TestCheckUpdatingDataWithTheSamePrimaryKey:151-172 — merged column
    # set != last row's column set; later value wins per column.
    res = run(
        spark,
        [
            ev("update", [1], {"value1": "old", "value2": "1"}, 1, 1, 0),
            ev("update", [1], {"value2": "2", "value3": "3.5"}, 2, 1, 1),
        ],
    )
    r = res[(0, '["1"]')]
    assert r.op == "update"
    assert r.columns == {"value1": "old", "value2": "2", "value3": "3.5"}


def test_erase_resets_accumulated_columns(spark):
    # gen_query.go:403-418 — update after erase starts fresh.
    res = run(
        spark,
        [
            ev("update", [1], {"value1": "a", "value2": "b"}, 1, 1, 0),
            ev("erase", [1], {}, 2, 1, 1),
            ev("update", [1], {"value3": "c"}, 3, 1, 2),
        ],
    )
    r = res[(0, '["1"]')]
    assert r.op == "update"
    assert r.columns == {"value3": "c"}


def test_duplicate_erases_collapse(spark):
    # TestGenOnlyEraseQuery:174-189
    res = run(
        spark,
        [
            ev("erase", [16, "MTY="], {}, 1, 1, 0),
            ev("erase", [16, "MTY="], {}, 2, 1, 1),
        ],
    )
    assert len(res) == 1
    assert res[(0, '["16","MTY="]')].op == "erase"


def test_equal_position_arrival_order_wins(spark):
    # priority_queue.go:11-15: equal (step, tx_id) keeps arrival order,
    # so the later-arriving value wins.
    res = run(
        spark,
        [
            ev("update", [1], {"v": "first"}, 5, 5, 10),
            ev("update", [1], {"v": "second"}, 5, 5, 11),
        ],
    )
    assert res[(0, '["1"]')].columns == {"v": "second"}


def test_uint64_max_positions(spark):
    # gen_query_test.go:59 exercises 2**64-1 positions.
    m = 2**64 - 1
    res = run(
        spark,
        [
            ev("update", [15], {"v": "lo"}, m - 1, m, 0),
            ev("update", [15], {"v": "hi"}, m, m, 1),
        ],
    )
    r = res[(0, '["15"]')]
    assert r.columns == {"v": "hi"}
    assert r.step == Decimal(m)


def test_multiple_tables_and_keys_routed(spark):
    # assignTxsToDstTables: batch routed per table (processor.go:483-512)
    res = run(
        spark,
        [
            ev("update", [1], {"a": "1"}, 1, 1, 0, table_id=0),
            ev("update", [1], {"a": "2"}, 1, 2, 1, table_id=1),
            ev("erase", [2], {}, 1, 3, 2, table_id=0),
        ],
    )
    assert len(res) == 3
    assert res[(0, '["1"]')].columns == {"a": "1"}
    assert res[(1, '["1"]')].columns == {"a": "2"}
    assert res[(0, '["2"]')].op == "erase"


def test_explicit_null_column_is_preserved(spark):
    # Nothing(Optional<T>) — explicit null differs from absent
    # (gen_query_test.go Just/Nothing params).
    res = run(
        spark,
        [
            ev("update", [1], {"value4": None, "value1": "x"}, 1, 1, 0),
        ],
    )
    cols = res[(0, '["1"]')].columns
    assert "value4" in cols and cols["value4"] is None
    assert cols["value1"] == "x"


def test_single_shuffle_plan(spark):
    """The kernel must be exactly one exchange (scale guard)."""
    df = spark.createDataFrame(
        [ev("update", [1], {"a": "1"}, 1, 1, 0)], CDC_EVENT_SCHEMA
    )
    plan = compact_changes(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_unknown_op_raises(spark):
    # gen_query.go:424 "unknown tx operation type" — heartbeats must not
    # reach the data path.
    from decimal import Decimal as D

    rows = [
        ev("update", [1], {"a": "1"}, 1, 1, 0),
        (0, 0, 2, "resolved", None, None, D(9), D(0), 2),
    ]
    df = spark.createDataFrame(rows, CDC_EVENT_SCHEMA)
    with pytest.raises(Exception, match="unknown tx operation type"):
        compact_changes(df).collect()
