"""ops.layout: clustered writes + zone-map pruned reads — the OPTIMIZE
CLUSTER BY operator. Pruned reads must equal full-scan filters exactly
(zone maps may only skip files that cannot match), and the file-skip
stats must show real pruning on box predicates."""

import pytest

from aardappel_spark.ops.layout import read_pruned, write_clustered


def _table(spark):
    # 200 users x 50 days, deterministic values
    return spark.range(0, 10_000).selectExpr(
        "id as row_id",
        "id % 200 as user_id",
        "id % 50 as day",
        "CAST(id % 997 AS DOUBLE) as value",
    )


@pytest.mark.parametrize("curve", ["hilbert", "zorder"])
def test_pruned_read_equals_full_filter(spark, tmp_path, curve):
    df = _table(spark)
    path = str(tmp_path / curve)
    sidecar = write_clustered(df, path, dims=["user_id", "day"], curve=curve)
    assert sum(z["n_rows"] for z in sidecar["files"].values()) == 10_000

    ranges = {"user_id": (50, 149), "day": (10, 19)}
    got, stats = read_pruned(spark, path, ranges)
    expect = df.filter(
        "user_id between 50 and 149 and day between 10 and 19"
    )
    assert sorted(r.row_id for r in got.collect()) == sorted(
        r.row_id for r in expect.collect()
    )
    # the box is 1/10th of the grid: pruning must be real, not a no-op
    assert stats["files_skipped"] > 0 and stats["files_read"] < stats["n_files"]


def test_full_scan_and_empty_box(spark, tmp_path):
    df = _table(spark)
    path = str(tmp_path / "t")
    write_clustered(df, path, dims=["user_id", "day"], curve="hilbert")

    full, stats = read_pruned(spark, path, None)
    assert full.count() == 10_000 and stats["files_read"] == stats["n_files"]

    # a box outside every zone: zero files read, empty result, schema kept
    none, stats = read_pruned(spark, path, {"user_id": (900, 950)})
    assert stats["files_read"] == 0
    assert none.count() == 0
    assert "row_id" in none.columns


def test_hilbert_key_matches_registry_walk(spark):
    """The operator's key must equal the gated layout_hilbert_skip
    walk: spot-check a handful of grid points against the pure-python
    Hilbert xy2d reference."""
    from pyspark.sql import functions as F

    from aardappel_spark.ops.layout import _with_curve_key

    def xy2d(x, y, n=256):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = [(0, 0), (255, 255), (1, 2), (128, 127), (200, 33), (96, 159)]
    df = spark.createDataFrame(pts, "a int, b int").selectExpr(
        "a", "b", "CAST(a AS BIGINT) as _g0", "CAST(b AS BIGINT) as _g1"
    )
    got = {
        (r.a, r.b): r._ck
        for r in _with_curve_key(df, "hilbert", 8).collect()
    }
    assert got == {(a, b): xy2d(a, b) for a, b in pts}


def test_write_clustered_rejects_empty_and_nonintegral(spark, tmp_path):
    """Empty input has no value range to lay out, and float dims would
    silently skew the truncating-div grid — both must refuse loudly
    (r7 ADVICE)."""
    empty = _table(spark).limit(0)
    with pytest.raises(ValueError, match="empty"):
        write_clustered(empty, str(tmp_path / "e"), dims=["user_id", "day"])
    with pytest.raises(ValueError, match="integral"):
        write_clustered(
            _table(spark), str(tmp_path / "f"), dims=["user_id", "value"]
        )
