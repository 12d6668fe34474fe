"""localrel: JVM-native local frames must be drop-in equivalents of
``spark.createDataFrame`` — same schema (names, types, nullability),
same values — while never evaluating through Python workers."""

import pytest

from aardappel_spark.localrel import empty_df, local_df


@pytest.mark.parametrize(
    "ddl",
    [
        "n long, bid long",
        "id long, toks array<string>, n long, bucket int",
        "user_id bigint, value double, props string",
        "instance_id string, key binary",
        "threshold double",
    ],
)
def test_empty_df_schema_matches_createDataFrame(spark, ddl):
    assert empty_df(spark, ddl).schema == spark.createDataFrame([], ddl).schema
    assert empty_df(spark, ddl).count() == 0


def test_local_df_values_and_schema_match_createDataFrame(spark):
    ddl = "id long, toks array<string>, n long, w double, s string"
    rows = [
        (1, ["a", "b"], 2, 0.5, "x"),
        (2, [], 0, -1.25, None),
        (3, None, 7, 0.0, ""),
    ]
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_local_df_empty_rows_falls_back_to_empty_df(spark):
    ddl = "a int, b string"
    got = local_df(spark, [], ddl)
    assert got.schema == spark.createDataFrame([], ddl).schema
    assert got.count() == 0


def test_local_df_one_row_counts_sidecar_shape(spark, tmp_path):
    # the exact shape the streaming kernels write per batch
    df = local_df(spark, [(19, 0)], "n long, bid long")
    path = str(tmp_path / "counts" / "batch=0")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(str(tmp_path / "counts"))
    assert [(r.n, r.bid, r.batch) for r in back.collect()] == [(19, 0, 0)]


def test_local_df_binary_values(spark):
    rows = [("i1", bytearray(b"\x01ab")), ("i2", bytearray(b"\xff"))]
    ddl = "instance_id string, key binary"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_empty_df_accepts_structtype(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType([StructField("a", LongType(), True)])
    assert empty_df(spark, st).schema == st
