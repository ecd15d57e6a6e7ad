"""Empty-input robustness: every driver-contract query must run (and
return 0 rows) on empty copies of all tables. Caught two real r5 bugs:
knn_cosine/ann_ivf crashed normalizing an empty query matrix (axis-1 on a
1-D array). Empty partitions/batches/groups are routine at 100 TB —
partition pruning or a selective filter can empty any input."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_survives_empty_tables(spark, empty_dir, name):
    n = entrymod.queries()[name](spark, empty_dir).count()
    from varpulis_spark.operators.dedup import release_caches

    release_caches()
    assert n == 0
