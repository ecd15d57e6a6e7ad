"""Null-payload robustness: null text / embeddings / event payload values
are routine in real corpora. Caught three real r5 bugs: all three vector
ops crashed building an inhomogeneous numpy matrix from null embeddings.
Contract: null vectors/texts are SKIPPED (filtered JVM-side at operator
entry), never crash.

Scoped to the queries that consume nullable payload columns — the full
driver sweep runs in test_empty_inputs.py for the empty case."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

NULLABLE_CONSUMERS = [
    "knn_cosine", "embedding_near_dup", "ann_ivf",
    "minhash_near_dup", "simhash_near_dup", "minshingle_near_dup",
    "near_dup_clusters", "exact_dedup_docs", "text_stats",
    "lang_distribution", "multimodal_meta", "audio_meta", "score_mlp",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT event_id, ts, event_type, user_id, "
        f"CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value, props "
        f"FROM '{src}/events.parquet') TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text, "
        f"lang, source FROM '{src}/documents.parquet') TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT vec_id, CASE WHEN vec_id % 11 = 0 THEN NULL ELSE embedding END AS embedding "
        f"FROM '{src}/embeddings.parquet') TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("name", NULLABLE_CONSUMERS)
def test_query_survives_null_payloads(spark, null_dir, name):
    n = entrymod.queries()[name](spark, null_dir).count()
    from varpulis_spark.operators.dedup import release_caches

    release_caches()
    assert n >= 0


def test_null_vectors_are_skipped_not_scored(spark, null_dir):
    """Null embeddings must neither appear as queries nor as neighbors."""
    out = entrymod.queries()["knn_cosine"](spark, null_dir).collect()
    ids = {r.query_id for r in out} | {r.neighbor_id for r in out}
    assert all(i % 11 != 0 for i in ids)
