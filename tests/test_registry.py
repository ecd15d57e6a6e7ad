"""ConnectorRegistry: config-driven construction, shared handles, health,
shutdown, and the run_program sources/sinks views
(managed.rs / managed_registry.rs parity)."""

import json
import sqlite3

import pytest

from varpulis_spark.registry import ConnectorRegistry


@pytest.fixture()
def registry(tmp_path):
    return ConnectorRegistry.from_configs(
        {
            "mq": {"type": "mqtt", "broker": "localhost", "topic": "a/#"},
            "db": {"type": "database",
                   "connection_string": f"sqlite:{tmp_path}/r.db",
                   "table": "alerts"},
            "es": {"type": "elasticsearch", "urls": "http://localhost:9200",
                   "index": "logs"},
        },
        spool_root=str(tmp_path / "spools"),
    )


def test_from_configs_builds_shared_instances(registry):
    assert registry.source("mq") is registry.source("mq")  # one instance
    assert registry.sink("db") is registry.sink("db")
    assert set(registry.sinks()) == {"mq", "db", "es"}
    with pytest.raises(KeyError, match="Unknown connector"):
        registry.source("nope")
    with pytest.raises(ValueError, match="no source side"):
        registry.source("es")


def test_unknown_type_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown connector type"):
        ConnectorRegistry.from_configs({"x": {"type": "carrier-pigeon"}})


def test_health_and_shutdown(registry):
    mq = registry.source("mq")
    mq.ingest("a/t", json.dumps({"x": 1.0}))
    reports = dict(
        (name, (kind, rep)) for name, kind, rep in registry.health_reports()
    )
    assert reports["mq"][0] == "mqtt"
    assert reports["mq"][1].messages_received == 1
    mq.flush()
    mq.ingest("a/t", json.dumps({"x": 2.0}))
    assert dict(
        (n, r) for n, _k, r in registry.health_reports()
    )["mq"].messages_received == 2  # 1 flushed file + 1 buffered
    registry.shutdown()  # no stop() on mqtt source in batch mode — no error


def test_run_program_via_registry(spark, tmp_path):
    """connector decl → registry → .from/.to end-to-end: MQTT spool in,
    filtered stream out to a sqlite sink."""
    from varpulis_spark import Stream
    from varpulis_spark.sources.event_file import load_evt
    from varpulis_spark.vpl import run_program

    reg = ConnectorRegistry.from_configs(
        {
            "mq_in": {"type": "mqtt", "broker": "h", "topic": "s/#"},
            "db_out": {"type": "database",
                       "connection_string": f"sqlite:{tmp_path}/out.db",
                       "table": "hot"},
        },
        spool_root=str(tmp_path / "spools"),
    )
    mq = reg.source("mq_in")
    for v in (10.0, 300.0):
        mq.ingest("s/r", json.dumps({"event_type": "Reading", "x": v}))
    mq.flush()

    ingest = Stream(load_evt(spark, "Reading { x: 1.0 }\n"),
                    ts_col="ts", order_col="event_id")
    run_program("""
stream Hot = Reading
    .from(mq_in)
    .where(x > 100.0)
    .emit(x: x)
    .to(db_out)
""", ingest,
        sources=reg.sources(spark, {"mq_in": "x double"}),
        sinks=reg.sinks())
    rows = sqlite3.connect(f"{tmp_path}/out.db").execute(
        "SELECT data FROM hot"
    ).fetchall()
    assert len(rows) == 1 and json.loads(rows[0][0])["x"] == 300.0


def test_connector_configs_from_vpl_program():
    """VPL connector declarations -> registry config dicts (the reference
    builds its managed registry straight from the program)."""
    from varpulis_spark.registry import connector_configs

    src = open("/root/reference/examples/hvac_quickstart.vpl").read()
    cfgs = connector_configs(src)
    assert cfgs["MqttSensors"]["type"] == "mqtt"
    assert cfgs["MqttSensors"]["broker"] == "localhost"  # host -> broker
    assert cfgs["MqttSensors"]["port"] == 1883
    assert cfgs["MqttSensors"]["client_id"] == "hvac-quickstart"
    assert cfgs["KafkaAlerts"]["brokers"] == "kafka:9092"  # list joined
    assert cfgs["KafkaAlerts"]["group_id"] == "hvac-alerts"
    assert cfgs["AlertWebhook"] == {
        "type": "http", "url": "https://hooks.example.com/hvac-alerts"
    }


def test_registry_from_program_builds_connectors(tmp_path):
    from varpulis_spark.registry import ConnectorRegistry

    src = open("/root/reference/examples/hvac_quickstart.vpl").read()
    reg = ConnectorRegistry.from_program(
        src, spool_root=str(tmp_path),
        overrides={"MqttSensors": {"topic": "sensors/#"}},
    )
    assert reg.source("MqttSensors").config.topic == "sensors/#"  # override
    assert reg.sink("KafkaAlerts").config.brokers == "kafka:9092"
    assert reg.sink("AlertWebhook").url.startswith("https://hooks")
    kinds = {t for _n, t, _r in reg.health_reports()}
    assert kinds == {"mqtt", "kafka", "http"}
    reg.shutdown()
