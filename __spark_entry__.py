"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: the full CDC apply kernel (wire JSON -> parse ->
               compact -> cast -> merge) on sf0.001.
queries()    — one entry per implemented operator (SURVEY.md §2 + the
               pipeline operators from BASELINE.json's north star).
oracle_sql() — DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def _prepare(spark: SparkSession) -> SparkSession:
    from aardappel_spark.session import apply_required_confs

    return apply_required_confs(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aardappel_spark.cdc_queries import q_apply

    return q_apply(_prepare(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aardappel_spark.registry import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_prepare(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from aardappel_spark.registry import ORACLES

    return dict(ORACLES)
