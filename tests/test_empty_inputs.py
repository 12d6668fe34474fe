"""Empty-input sweep: every registry query must run (not crash) over
empty tables with the production schemas.

At 100 TB, empty inputs are routine — an empty partition after a
filter, a new tenant with no data yet, a stream's first trigger. A
kernel that NPEs or IndexErrors on zero rows (the numpy 1-D trap found
in round 2's block near-dup) is a pager at 3am. Queries are allowed to
return zero rows or sentinel aggregates; they are not allowed to raise.
"""

import os

import pytest

from aardappel_spark import registry

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).write.parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("qname", sorted(registry.QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, qname):
    df = registry.QUERIES[qname](spark, empty_sf_dir)
    rows = df.collect()
    assert isinstance(rows, list)
