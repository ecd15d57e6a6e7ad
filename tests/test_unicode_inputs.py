"""Unicode differential sweep: the text/dedup/multimodal oracle queries
must hash-match DuckDB on multibyte corpora (CJK, Cyrillic, emoji,
accents) — exercising char-vs-byte semantics everywhere they diverge:
substring shingling (chars), md5 (utf-8 bytes), octet_length closed forms
(bytes), regex tokenization, lower() casing."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from varpulis_spark.engine import TABLE_NAMES  # noqa: E402

TEXTS = [
    "héllo wörld ünïcode tëst çafé rêve naïve",
    "日本語のテキスト データ処理 エンジン テスト 形態素",
    "mixed ascii と 日本語 and émojis 🚀🔥 data pipeline",
    "ПРИВЕТ МИР обработка данных тест проверка",
    "héllo wörld ünïcode tëst çafé rêve naïve",  # exact dup of row 0
    "héllo wörld ünïcode tëst çafé rêve naïf",  # near-dup of row 0
] * 10

QUERIES = [
    "text_stats", "exact_dedup_docs", "minshingle_near_dup",
    "near_dup_clusters", "multimodal_meta", "audio_meta",
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_unicode")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT row_number() OVER () - 1 AS doc_id, "
        "x AS text, 'xx' AS lang, 'syn' AS source FROM (SELECT unnest(?) x)",
        [TEXTS],
    )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    src = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def _norm(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
    return v


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_matches_on_unicode_corpus(spark, unicode_dir, name):
    sdf = entrymod.queries()[name](spark, unicode_dir)
    cols = sdf.columns
    srows = sorted(tuple(_norm(x) for x in r) for r in sdf.collect())
    from varpulis_spark.operators.dedup import release_caches

    release_caches()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{unicode_dir}/{t}.parquet'")
    res = con.execute(entrymod.oracle_sql()[name])
    ocols = [c[0] for c in res.description]
    order = [ocols.index(c) for c in cols]
    orows = sorted(tuple(_norm(r[i]) for i in order) for r in res.fetchall())
    assert srows == orows
    assert len(srows) > 0
