"""Dump `.explain("formatted")` for registry queries to plans/<dir>/.

Usage: python tools/dump_plans.py <out_subdir> <tag> [query ...]

Writes plans/<out_subdir>/<query>_<tag>.txt for each named query (all
registry queries when none are named). The plan is captured from the
DataFrame the registry function returns, over $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1). Shared cached frames are built on
demand exactly as in the bench, so the captured plan is the steady-state
one (InMemoryTableScan over the persisted shared frames, not their
builds).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_subdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aardappel_spark.registry import QUERIES
    from aardappel_spark.session import get_spark

    spark = get_spark("aardappel-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        out_subdir,
    )
    os.makedirs(out_dir, exist_ok=True)

    import contextlib
    import io

    if not names:
        names = list(QUERIES)
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
