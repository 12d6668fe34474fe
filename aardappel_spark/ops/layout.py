"""Space-filling-curve clustered writes + zone-map pruned reads — the
OPTIMIZE ZORDER BY / CLUSTER BY operator as an API, not just the
layout_zorder_skip / layout_hilbert_skip diagnostics.

``write_clustered`` lays a table out so multi-dimensional range
predicates prune files: each row's clustering dimensions normalize to a
fixed grid, interleave into a Morton or Hilbert key, and the key's top
bits become the file id — value-range partitioning, so the write is one
row-local projection + one partitioned write, never a global sort. A
zone-map sidecar (per-file min/max of every clustering dimension —
what parquet footers hold, materialized table-level so pruning needs
ZERO file opens) is computed by the SAME pass's aggregate.

``read_pruned`` is the other half: given a conjunction of per-dimension
ranges it intersects the query box against the sidecar and reads ONLY
the surviving files' directories. At 100 TB this is the difference
between listing+reading every file and touching the 4/64 whose boxes
overlap — and with the Hilbert curve the survivors are (measured, see
layout_hilbert_skip) ~3x fewer contiguous runs, i.e. sequential range
requests instead of scattered seeks.

Everything is deterministic arithmetic shared with the gated layout
queries (registry._zorder_terms / _hilbert_level are the same
formulas); no RNG, no UDFs, no driver-side data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ZONEMAP = "_zonemaps.json"


def _grid_cols(df: DataFrame, dims: list[str], bits: int):
    """Normalize each clustering dimension to [0, 2^bits) against its
    observed min/max (one tiny stats pass — table stats at scale), and
    return (projected df with g0..gk grid columns, bounds dict).

    Clustering dimensions must be integral columns: the grid mapping
    uses truncating integer ``div`` on ``(value - lo) * cells``, which
    is only the intended [0, 2^bits) binning for integer values —
    validated here so a float/string dim fails loudly at the API
    boundary instead of producing a silently skewed layout."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    for d in dims:
        dt = df.schema[d].dataType
        if not isinstance(dt, integral):
            raise ValueError(
                f"clustering dimension {d!r} must be an integral column, "
                f"got {dt.simpleString()}"
            )
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"_lo_{d}"), F.max(d).alias(f"_hi_{d}")]
    row = df.agg(*aggs).first()
    if any(row[f"_lo_{d}"] is None for d in dims):
        raise ValueError(
            "write_clustered: input table is empty (or a clustering "
            "dimension is all-NULL) — no value range to lay out"
        )
    bounds = {d: (row[f"_lo_{d}"], row[f"_hi_{d}"]) for d in dims}
    cells = 1 << bits
    out = df
    for i, d in enumerate(dims):
        lo, hi = bounds[d]
        span = int(hi) - int(lo) + 1 if hi is not None else 1
        out = out.withColumn(
            f"_g{i}",
            F.expr(f"(({d} - {int(lo) if lo is not None else 0}) * {cells}) "
                   f"div {span}").cast("bigint"),
        )
    return out, bounds


def _with_curve_key(df: DataFrame, curve: str, bits: int) -> DataFrame:
    """Add the interleaved ``_ck`` key over the _g0/_g1 grid columns —
    the same arithmetic as the gated layout queries (registry
    _zorder_terms / _hilbert_level), so the operator and its
    diagnostics can never disagree. The Hilbert walk is per-level
    chained projections (all row-local, one codegen stage), never one
    exponentially-substituted expression."""
    from ..registry import _hilbert_level, _zorder_terms

    keep = [c for c in df.columns]
    if curve == "zorder":
        return df.withColumn(
            "_ck", F.expr(f"({_zorder_terms('_g0', '_g1', bits, 'div')})")
        )
    if curve != "hilbert":
        raise ValueError(f"unknown curve {curve!r} (zorder|hilbert)")
    if bits != 8:
        raise ValueError("hilbert clustering is built for bits=8 (256x256)")
    h = df.selectExpr(
        *keep, "_g0 as hx", "_g1 as hy", "CAST(0 AS BIGINT) as hd"
    )
    for s in (128, 64, 32, 16, 8, 4, 2, 1):
        d_e, x_e, y_e = _hilbert_level(s, "div")
        h = h.selectExpr(
            *keep, f"({x_e}) as hx", f"({y_e}) as hy", f"({d_e}) as hd"
        )
    return h.selectExpr(*keep, "hd as _ck")


def write_clustered(
    df: DataFrame,
    path: str,
    dims: list[str],
    curve: str = "hilbert",
    bits: int = 8,
    n_files: int = 64,
) -> dict:
    """Cluster ``df`` on two dimensions along a space-filling curve and
    write it as ``n_files`` value-range files with a zone-map sidecar.
    Returns the sidecar dict. The whole write is one stats pass + one
    row-local projection + one partitioned write."""
    if len(dims) != 2:
        raise ValueError("clustered writes take exactly 2 dimensions")
    cells_per_file = ((1 << bits) ** 2) // n_files
    g, bounds = _grid_cols(df, dims, bits)
    keyed = _with_curve_key(g, curve, bits).withColumn(
        "_cfile", F.expr(f"_ck div {cells_per_file}")
    )
    (
        keyed.drop("_g0", "_g1", "_ck")
        .write.mode("overwrite")
        .partitionBy("_cfile")
        .parquet(path)
    )
    zones = (
        keyed.groupBy("_cfile")
        .agg(
            F.count("*").alias("n_rows"),
            *[
                x
                for d in dims
                for x in (
                    F.min(d).alias(f"min_{d}"),
                    F.max(d).alias(f"max_{d}"),
                )
            ],
        )
        .collect()
    )
    sidecar = {
        "curve": curve,
        "bits": bits,
        "dims": dims,
        "bounds": {d: [int(bounds[d][0]), int(bounds[d][1])] for d in dims},
        "files": {
            str(r["_cfile"]): {
                "n_rows": r["n_rows"],
                **{
                    f"{m}_{d}": int(r[f"{m}_{d}"])
                    for d in dims
                    for m in ("min", "max")
                },
            }
            for r in zones
        },
    }
    with open(os.path.join(path, _ZONEMAP), "w") as f:
        json.dump(sidecar, f)
    return sidecar


def read_pruned(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple] | None = None,
) -> tuple[DataFrame, dict]:
    """Read a clustered table, pruning files whose zone-map box misses
    the query ranges (``{dim: (lo, hi)}``, inclusive; None = full
    scan). Returns (DataFrame, stats) where stats reports files
    touched/skipped — the observable a scan dashboard graphs. The
    predicate is ALSO applied to the surviving rows (zone maps prune
    files, they don't filter rows), so the result equals a full scan +
    filter."""
    with open(os.path.join(path, _ZONEMAP)) as f:
        sidecar = json.load(f)
    dims = sidecar["dims"]
    files = sidecar["files"]
    keep = []
    for fid, z in files.items():
        ok = True
        for d, (lo, hi) in (ranges or {}).items():
            if z[f"min_{d}"] > hi or z[f"max_{d}"] < lo:
                ok = False
                break
        if ok:
            keep.append(fid)
    stats = {
        "n_files": len(files),
        "files_read": len(keep),
        "files_skipped": len(files) - len(keep),
    }
    if not keep:
        empty = spark.read.parquet(path).limit(0).drop("_cfile")
        return empty, stats
    sel = [os.path.join(path, f"_cfile={fid}") for fid in sorted(keep, key=int)]
    df = spark.read.parquet(*sel)
    for d, (lo, hi) in (ranges or {}).items():
        df = df.filter((F.col(d) >= lo) & (F.col(d) <= hi))
    return df, stats
