"""Benchmark: run the full query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (collect) so the number includes
the full scan/shuffle/aggregation, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from aardappel_spark.registry import QUERIES
    from aardappel_spark.session import get_spark

    spark = get_spark("aardappel-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session and the Python worker pool so the first query
    # (and the first mapInPandas query) doesn't pay startup cost
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").collect()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        n = len(rows)
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "notes": {
                    "cdc_parse_stats": (
                        "includes the one-time wire-JSON parse materialization "
                        "(localCheckpoint) shared by every cdc_* query in this run"
                    ),
                    "dedup_minhash_pairs": (
                        "first materialization of the LSH band joins, reused "
                        "by dedup_jaccard/dedup_ngram_jaccard/dedup_clusters "
                        "via a shared persisted pairs frame"
                    ),
                    "dedup_clusters": (
                        "iterative connected-components loop: 2-4 join+agg "
                        "rounds until the labels converge"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
