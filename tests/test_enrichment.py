"""Live enrichment providers: TTL cache, batch key-dedup, fallback,
enrich_status — reference runtime/src/enrichment/ (provider trait,
EnrichmentCache, HTTP provider)."""

import os

import pytest
from pyspark.sql import functions as F

from varpulis_spark import Stream
from varpulis_spark.engine import load_table
from varpulis_spark.enrichment import (
    CallableProvider,
    StaticProvider,
    TTLCache,
    enrich_with_provider,
)


def test_ttl_cache_expiry_and_bound():
    c = TTLCache(ttl_s=0.05, max_entries=10)
    c.put("a", {"x": 1})
    assert c.get("a") == ({"x": 1}, True)
    import time

    time.sleep(0.06)
    assert c.get("a") == (None, False)  # expired
    for i in range(12):
        c.put(f"k{i}", {"x": i})
    assert len(c._d) <= 10  # capacity bound (cache.rs MAX_ENTRIES)


def test_enrich_with_provider_basic(spark, sf_dir):
    orders = Stream.from_df(load_table(spark, sf_dir, "orders").limit(200), ts_col="o_orderdate")
    prov = StaticProvider({1: {"tier": "gold"}, 2: {"tier": "silver"}}, name="tiers")
    out = enrich_with_provider(
        orders, prov, key="o_custkey", fields=["tier"], fallback={"tier": "none"}
    )
    rows = out.df.select("o_custkey", "tier", "enrich_status").collect()
    assert len(rows) == 200
    for r in rows:
        if r.o_custkey in (1, 2):
            assert r.tier in ("gold", "silver") and r.enrich_status in ("ok", "cached")
        else:
            assert r.tier == "none" and r.enrich_status == "fallback"


def test_enrich_provider_dedupes_lookups(spark, tmp_path):
    """Per-batch key dedup + TTL cache: the provider must be called at most
    once per distinct key per partition (not once per row)."""
    log = str(tmp_path / "lookups.log")

    def looker(key, _log=log):
        with open(_log, "a") as f:
            f.write(f"{key}\n")
        return {"v": str(key)}

    df = spark.createDataFrame(
        [(i, i % 5) for i in range(500)], ["id", "k"]
    ).coalesce(2)
    s = Stream(df.withColumn("ts", F.current_timestamp()), ts_col="ts")
    out = enrich_with_provider(s, CallableProvider(looker), key="k", fields=["v"])
    rows = out.df.collect()
    assert len(rows) == 500 and all(r.v == str(r.k) for r in rows)
    with open(log) as f:
        lookups = f.read().splitlines()
    # 5 distinct keys x <=2 partitions (worker cache may dedupe further)
    assert len(lookups) <= 10


def test_enrich_provider_typed_fields(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    s = Stream(df.withColumn("ts", F.current_timestamp()), ts_col="ts")
    prov = StaticProvider({"a": {"score": 1.5, "rank": 3}, "b": {"score": 2.5, "rank": 1}})
    out = enrich_with_provider(
        s, prov, key="name", fields={"score": "double", "rank": "long"}
    )
    got = {(r.name, r.score, r.rank) for r in out.df.collect()}
    assert got == {("a", 1.5, 3), ("b", 2.5, 1)}
    dt = dict(out.df.dtypes)
    assert dt["score"] == "double" and dt["rank"] == "bigint"


def test_vpl_enrich_with_provider(spark):
    """The reference's enrich_weather.vpl shape: a connector bound to a
    LIVE provider (not a dim table) — per-row lookups, TTL cache,
    enrich_status usable in emit."""
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.vpl.compiler import run_program

    prov = StaticProvider(
        {"paris": {"forecast": "rain", "wind_speed": 20.0},
         "oslo": {"forecast": "snow", "wind_speed": 5.0}},
        name="weather",
    )
    stream = Stream(load_evt(spark, """
Trip { city: "paris", km: 10.0 }
Trip { city: "oslo", km: 3.0 }
Trip { city: "atlantis", km: 1.0 }
"""), ts_col="ts", order_col="event_id")
    res = run_program("""
connector WeatherAPI = http(url: "https://api.example.com/weather")

stream W = Trip as t
    .enrich(WeatherAPI, key: t.city, fields: [forecast, wind_speed], cache_ttl: 15m, fallback: "unavailable")
    .emit(city: t.city, forecast: forecast, status: enrich_status)
""", stream, tables={"WeatherAPI": prov})
    got = {(r.city, r.forecast, r.status) for r in res["W"].collect()}
    assert got == {
        ("paris", "rain", "ok"),
        ("oslo", "snow", "ok"),
        ("atlantis", "unavailable", "fallback"),
    }


def test_reference_enrich_refdata_program(spark):
    """The reference's examples/enrich_refdata.vpl runs unmodified with
    provider bindings — chained enrichments, post-enrich .where over
    enriched fields, enrich_status in emit."""
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.vpl.compiler import run_program

    with open("/root/reference/examples/enrich_refdata.vpl") as f:
        src = f.read()
    products = StaticProvider({
        "p1": {"name": "Laptop", "category": "electronics", "price": 999.0,
               "supplier": "Acme"},
        "p2": {"name": "Desk", "category": "furniture", "price": 200.0,
               "supplier": "Woodco"},
    })
    users = StaticProvider({
        "u1": {"user_tier": "premium", "country": "FR"},
        "u2": {"user_tier": "basic", "country": "DE"},
    })
    stream = Stream(load_evt(spark, """
Order { order_id: "o1", user_id: "u1", product_id: "p1", quantity: 2 }
Order { order_id: "o2", user_id: "u2", product_id: "p1", quantity: 1 }
Order { order_id: "o3", user_id: "u1", product_id: "p2", quantity: 3 }
"""), ts_col="ts", order_col="event_id")
    res = run_program(src, stream, tables={"ProductDB": products, "UserCache": users})
    rows = {r.order_id: r for r in res["OrdersWithProducts"].collect()}
    assert rows["o1"].product == "Laptop" and rows["o3"].category == "furniture"
    # FullOrders filters premium + electronics -> only o1
    full = res["FullOrders"].collect()
    assert [r.order_id for r in full] == ["o1"]
    assert full[0].user_tier == "premium" and full[0].status == "ok"
