"""MQTT connector bridge: payload-parsing parity with the reference
(parse_mqtt_payload, connector/mqtt.rs:356-419), spool atomicity, streaming
replay, and sink publishing — all without a broker (the network client is
import-gated; ingest()/fake clients drive the same paths)."""

import json
import os

import pytest

from varpulis_spark import streaming as S
from varpulis_spark.sources.mqtt import MqttConfig, MqttSink, MqttSource


@pytest.fixture()
def source(tmp_path):
    return MqttSource(
        "test", MqttConfig("localhost", "sensors/#"), str(tmp_path / "spool")
    )


def test_payload_parsing_parity(spark, source):
    """event_type precedence (event_type > type > topic segment), nested
    `data` object wins over top-level, missing fields read as null."""
    source.ingest("sensors/temp", json.dumps({"event_type": "Reading", "x": 1.5}))
    source.ingest("sensors/temp", json.dumps({"type": "Alt", "x": 2.5}))
    source.ingest("sensors/temp", json.dumps({"x": 3.5}))  # topic fallback
    source.ingest("plain", json.dumps({"y": "s"}))  # missing x -> null
    source.ingest(
        "sensors/temp",
        json.dumps({"event_type": "Nested", "x": 9.0, "data": {"x": 4.5}}),
    )
    source.flush()
    rows = source.batch(spark, "x double, y string").df.collect()
    got = sorted((r.event_type, r.x) for r in rows)
    assert got == [
        ("Alt", 2.5),
        ("Nested", 4.5),  # data.x wins over top-level x
        ("Reading", 1.5),
        ("plain", None),
        ("temp", 3.5),
    ]
    assert all(r.ts is not None for r in rows)


def test_spool_flush_atomic_and_batched(source):
    """flush() lands ONE file per call via write+rename; empty flush is a
    no-op; the buffer drains."""
    assert source.flush() is None
    source.ingest("t", "{}")
    source.ingest("t", "{}")
    p1 = source.flush()
    source.ingest("t", "{}")
    p2 = source.flush()
    files = sorted(os.listdir(source.spool_dir))
    assert [os.path.basename(p1), os.path.basename(p2)] == files
    assert not any(f.endswith(".tmp") for f in files)
    assert sum(1 for _ in open(p1)) == 2 and sum(1 for _ in open(p2)) == 1


def test_mqtt_stream_replays_spool(spark, source):
    """Each spool file replays as a micro-batch through the standard
    streaming surface (filter/emit compose on top)."""
    for i in range(3):
        source.ingest("sensors/m", json.dumps({"event_type": "M", "x": float(i)}))
        source.flush()
    st = source.stream(spark, "x double", max_files_per_trigger=1)
    assert st.df.isStreaming
    out = st.where(st.df.x >= 1.0)
    S.run_to_memory(out, "mqtt_stream")
    got = sorted(r.x for r in spark.sql("SELECT x FROM mqtt_stream").collect())
    assert got == [1.0, 2.0]


class FakeClient:
    def __init__(self):
        self.published = []

    def publish(self, topic, payload, qos):
        self.published.append((topic, payload, qos))


def test_mqtt_sink_publishes_json(spark):
    fake = FakeClient()
    sink = MqttSink("out", MqttConfig("localhost", "alerts", qos=1), client=fake)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    sink.write_batch(df, epoch=0)
    assert len(fake.published) == 2
    topics = {t for t, _, _ in fake.published}
    qoss = {q for _, _, q in fake.published}
    assert topics == {"alerts"} and qoss == {1}
    payloads = sorted(json.loads(p)["id"] for _, p, _ in fake.published)
    assert payloads == [1, 2]


def test_mqtt_sink_composes_with_resilient_sink(spark, tmp_path):
    """The reference wraps MQTT sinks in ResilientSink (sink.rs:538) — the
    same composition here: a broken client's batches land in the DLQ."""

    class BrokenClient:
        def publish(self, *_a):
            raise ConnectionError("broker gone")

    sink = MqttSink("out", MqttConfig("localhost", "alerts"), client=BrokenClient())
    dlq = str(tmp_path / "dlq")
    wrapped = S.resilient_sink_fn(sink.write_batch, dlq, connector="mqtt")
    df = spark.createDataFrame([(1,)], "id long")
    wrapped(df, 0)
    rows = S.read_dlq(spark, dlq).collect()
    assert len(rows) == 1 and rows[0].connector == "mqtt"
    assert "broker gone" in rows[0].error


def test_connect_requires_paho(source):
    with pytest.raises(ImportError, match="paho-mqtt"):
        source.connect()
