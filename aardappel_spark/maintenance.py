"""Table maintenance: small-file compaction for streaming sinks.

Micro-batch sinks (VersionedTable, any foreachBatch parquet writer)
accrete many small files; at 100 TB the scan-planning and NameNode/
object-store metadata cost of millions of tiny files dominates. Table
formats solve this with OPTIMIZE/rewrite-data-files; this module is the
same operation for plain parquet directories: coalesce a directory to
~``target_bytes`` output files, atomically.

The swap protocol mirrors VersionedTable.commit (stage to a temp dir,
rename into place): readers either see the old file set or the new one,
and a crash mid-compaction leaves the original intact plus a stale temp
dir that the next run clears.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

_TMP_SUFFIX = ".compact_tmp"
_OLD_SUFFIX = ".compact_old"


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files. Returns the number of
    output files, or the current count unchanged if the directory is
    already at or below that target (or has fewer than ``min_files``).

    The rewrite is one repartition-by-nothing pass: a full read +
    shuffle-free round-robin coalesce + write — linear, no skew
    concerns. On a real deployment run this per partition directory so
    the unit of work stays bounded.
    """
    tmp = path + _TMP_SUFFIX
    old = path + _OLD_SUFFIX
    # Leftover recovery. A crash in the two-rename swap window (after
    # `path` -> `.compact_old`, before `.compact_tmp` -> `path`) leaves
    # `path` missing and the ONLY original data in `.compact_old`; restore
    # it, never delete it. Staging dirs are dead copies (safe to clear)
    # only while `path` itself exists.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    if os.path.exists(path):
        for leftover in (tmp, old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)

    n_files, total = parquet_file_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_files < min_files or n_files <= n_out:
        return n_files

    df = spark.read.parquet(path)
    # coalesce avoids a shuffle: it merges input splits driver-side
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    out, _ = parquet_file_stats(path)
    return out
