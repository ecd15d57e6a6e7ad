"""Port of the reference's enrichment battery
(crates/varpulis-runtime/tests/enrichment_tests.rs): `.enrich` parameter
parsing (full/minimal/multi-field), op-chain ordering, program load,
the E032 incompatible-connector diagnostic, and the EnrichmentCache
unit surface (insert/get, miss, TTL expiry, hit/miss stats, eviction
at the 100k capacity)."""

import time

import pytest

from varpulis_spark.enrichment import MAX_CACHE_ENTRIES, TTLCache
from varpulis_spark.vpl.parser import parse_full
from varpulis_spark.vpl.validate import validate


def enrich_op(src: str):
    prog = parse_full(src)
    (decl,) = [d for d in prog.streams]
    for op in decl.ops:
        if op.name == "enrich":
            return op
    raise AssertionError("no enrich op")


# -- parse surface (rs:22-150) -------------------------------------------------


def test_enrich_parses_full_params():
    op = enrich_op('''
connector WeatherAPI = http(url: "https://api.weather.com/v1")

stream Enriched = Temperature as t
    .enrich(WeatherAPI, key: t.city, fields: [forecast, humidity], cache_ttl: 5m, timeout: 2s, fallback: "unknown")
    .emit(city: t.city)
''')
    assert op.args[0].event_type == "WeatherAPI"
    assert set(op.kwargs) == {"key", "fields", "cache_ttl", "timeout", "fallback"}
    fields = [".".join(r.parts) for r in op.kwargs["fields"].items]
    assert fields == ["forecast", "humidity"]


def test_enrich_parses_minimal_params():
    op = enrich_op('''
connector MyAPI = http(url: "https://example.com")

stream Enriched = Event as e
    .enrich(MyAPI, key: e.id, fields: [name])
    .emit(id: e.id)
''')
    assert op.args[0].event_type == "MyAPI"
    assert set(op.kwargs) == {"key", "fields"}


def test_enrich_parses_multiple_fields():
    op = enrich_op('''
connector DB = database(url: "postgres://localhost/test", query: "SELECT 1")

stream WithUser = Order as o
    .enrich(DB, key: o.user_id, fields: [name, email, tier, country])
    .emit(u: o.user_id)
''')
    fields = [".".join(r.parts) for r in op.kwargs["fields"].items]
    assert fields == ["name", "email", "tier", "country"]


def test_enrich_chained_with_where_emit():
    prog = parse_full('''
connector RedisC = redis(url: "redis://localhost:6379")

stream Premium = Click as c
    .enrich(RedisC, key: c.user_id, fields: [user_tier, prefs], cache_ttl: 10m)
    .where(user_tier == "premium")
    .emit(user: c.user_id, tier: user_tier)
''')
    (decl,) = prog.streams
    assert [op.name for op in decl.ops] == ["enrich", "where", "emit"]


def test_enrich_program_validates_clean():
    """rs:154-181 test_enrich_engine_loads: the program passes the load
    gate (validation errors reject a deploy here)."""
    prog = parse_full('''
connector API = http(url: "https://example.com/api")

stream Enriched = Event as e
    .enrich(API, key: e.id, fields: [name, category], cache_ttl: 5m)
    .emit(id: e.id)
''')
    v = validate(prog)
    assert not v.errors, v.format()
    assert prog.streams[0].name == "Enriched"


def test_enrich_requires_compatible_connector():
    """rs:183-207: enriching from a pub/sub connector (mqtt) is E032."""
    prog = parse_full('''
connector MqttSource = mqtt(url: "mqtt://localhost:1883")

stream Bad = Event as e
    .enrich(MqttSource, key: e.id, fields: [name])
    .emit(id: e.id)
''')
    v = validate(prog)
    assert any(d.code == "E032" for d in v.errors), v.format()


# -- cache unit surface (rs:210-281) ---------------------------------------------


def test_cache_insert_and_get():
    cache = TTLCache(ttl_s=60)
    cache.put("user:123", {"name": "Alice", "age": 30})
    val, hit = cache.get("user:123")
    assert hit and val == {"name": "Alice", "age": 30}


def test_cache_miss_on_unknown_key():
    val, hit = TTLCache(ttl_s=60).get("nonexistent")
    assert not hit and val is None


def test_cache_ttl_expiry():
    cache = TTLCache(ttl_s=0.01)
    cache.put("user:456", {"name": "Bob"})
    time.sleep(0.02)
    _val, hit = cache.get("user:456")
    assert not hit, "expired entry must not be returned"


def test_cache_stats():
    cache = TTLCache(ttl_s=60)
    cache.put("user:789", {"name": "Carol"})
    cache.get("user:789")  # hit
    cache.get("nonexistent")  # miss
    assert (cache.hits, cache.misses) == (1, 1)


def test_cache_eviction_at_capacity():
    """rs:268-281: past-capacity inserts evict without error and the
    LATEST entry stays accessible (smaller capacity, same contract)."""
    cache = TTLCache(ttl_s=3600, max_entries=1000)
    for i in range(1010):
        cache.put(f"key:{i}", {"value": i})
    val, hit = cache.get("key:1009")
    assert hit and val == {"value": 1009}
    assert len(cache._d) <= 1001  # bounded


def test_cache_default_capacity_matches_reference():
    assert MAX_CACHE_ENTRIES == 100_000  # cache.rs:12
