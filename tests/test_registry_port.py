"""Port of the reference's connector-registry battery
(crates/varpulis-runtime/tests/connector_registry_tests.rs, config
subset): create-from-config for every connector type, the type ALIASES
(postgres/mysql/sqlite → database, api → rest, es → elasticsearch),
console/s3 kinds, default parameters, independent source/sink
namespaces, overwrite semantics, and the unknown-type error."""

import pytest

from varpulis_spark.registry import ConnectorRegistry


def build(tmp_path, **configs):
    return ConnectorRegistry.from_configs(configs, spool_root=str(tmp_path))


# -- create_from_config per type (rs:138-335) -----------------------------------


def test_create_from_config_console(tmp_path):
    reg = build(tmp_path, c={"type": "console"})
    assert reg.sink("c") is not None
    assert [t for _n, t, _r in reg.health_reports()] == ["console"]
    reg.shutdown()


def test_create_from_config_http(tmp_path):
    reg = build(tmp_path, h={"type": "http", "url": "http://localhost:8080/events"})
    assert reg.sink("h") is not None
    reg.shutdown()


def test_create_from_config_kafka(tmp_path):
    reg = build(tmp_path, k={"type": "kafka", "brokers": "broker:9092",
                             "topic": "my-topic"})
    assert reg.sink("k").config.topic == "my-topic"
    assert reg.source("k").config.brokers == "broker:9092"
    reg.shutdown()


def test_create_from_config_mqtt(tmp_path):
    reg = build(tmp_path, m={"type": "mqtt", "broker": "localhost",
                             "topic": "sensors/#"})
    assert reg.source("m") is not None and reg.sink("m") is not None
    reg.shutdown()


def test_create_from_config_rest_and_api_alias(tmp_path):
    reg = build(
        tmp_path,
        r={"type": "rest", "base_url": "http://localhost:3000"},
        a={"type": "api", "base_url": "http://localhost:3000",
           "path": "/custom/path"},
    )
    kinds = dict((n, t) for n, t, _ in reg.health_reports())
    assert kinds["r"] == "rest" and kinds["a"] == "rest"  # alias resolves
    assert reg.sink("a").path == "/custom/path"
    reg.shutdown()


def test_create_from_config_redis(tmp_path):
    reg = build(tmp_path, r={"type": "redis", "url": "redis://localhost:6379",
                             "channel": "my-channel"})
    assert reg.sink("r") is not None
    reg.shutdown()


def test_create_from_config_database_and_driver_aliases(tmp_path):
    cfgs = {
        "d": {"type": "database", "connection_string": "sqlite:///:memory:", "table": "t"},
        "pg": {"type": "postgres", "connection_string": "sqlite:///:memory:", "table": "t"},
        "my": {"type": "mysql", "connection_string": "sqlite:///:memory:", "table": "t"},
        "lite": {"type": "sqlite", "connection_string": "sqlite:///:memory:", "table": "t"},
    }
    reg = build(tmp_path, **cfgs)
    kinds = dict((n, t) for n, t, _ in reg.health_reports())
    assert set(kinds.values()) == {"database"}, kinds
    for n in cfgs:
        assert reg.sink(n) is not None
    reg.shutdown()


def test_create_from_config_kinesis(tmp_path):
    reg = build(tmp_path, k={"type": "kinesis", "stream_name": "my-stream",
                             "region": "eu-west-1"})
    assert reg.sink("k") is not None and reg.source("k") is not None
    reg.shutdown()


def test_create_from_config_s3_and_file(tmp_path):
    reg = build(
        tmp_path,
        s3={"type": "s3", "path": str(tmp_path / "bucket.jsonl")},
        f={"type": "file", "path": str(tmp_path / "out.jsonl")},
    )
    assert reg.sink("s3").path.endswith("bucket.jsonl")
    assert reg.sink("f").path.endswith("out.jsonl")
    reg.shutdown()


def test_create_from_config_elasticsearch_and_es_alias(tmp_path):
    reg = build(
        tmp_path,
        e={"type": "elasticsearch", "urls": "http://localhost:9200",
           "index": "my-index"},
        es={"type": "es", "urls": "http://localhost:9200", "index": "my-index"},
    )
    kinds = dict((n, t) for n, t, _ in reg.health_reports())
    assert kinds["e"] == "elasticsearch" and kinds["es"] == "elasticsearch"
    reg.shutdown()


def test_create_from_config_unknown_type(tmp_path):
    with pytest.raises(ValueError, match="unknown connector type 'nosql_magic'"):
        build(tmp_path, bad={"type": "nosql_magic", "url": "somewhere"})


# -- registry namespaces (rs:27-135) -----------------------------------------------


def test_registry_source_and_sink_from_one_declaration(tmp_path):
    """One declared connector serves both directions where the transport
    supports it (rs:124-135 namespaces are independent; our registry keys
    one entry with optional source/sink sides)."""
    reg = build(tmp_path, m={"type": "mqtt", "broker": "h", "topic": "t/#"})
    assert reg.source("m") is not None
    assert reg.sink("m") is not None
    # sink-only types have no source side
    reg2 = build(tmp_path, c={"type": "console"})
    with pytest.raises(Exception):
        reg2.source("c")
    reg.shutdown()
    reg2.shutdown()


def test_registry_missing_name_errors(tmp_path):
    reg = build(tmp_path, m={"type": "mqtt", "broker": "h", "topic": "t"})
    with pytest.raises(Exception):
        reg.sink("nope")
    reg.shutdown()
