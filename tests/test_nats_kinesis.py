"""NATS + Kinesis connector bridges: payload-parsing parity with the
reference (parse_nats_payload nats.rs:258-317; kinesis.rs:347-369 +
json_to_event_from_json :465-488), spool replay, and sink publishing — all
without a server (the network clients are import-gated; ingest()/fake
clients drive the same paths)."""

import json

import pytest

from varpulis_spark import streaming as S
from varpulis_spark.sources.kinesis import (
    KinesisConfig,
    KinesisSink,
    KinesisSource,
)
from varpulis_spark.sources.nats import (
    MAX_EVENT_PAYLOAD_BYTES,
    NatsConfig,
    NatsSink,
    NatsSource,
)


# ---------------------------------------------------------------------------
# NATS
# ---------------------------------------------------------------------------

@pytest.fixture()
def nats_source(tmp_path):
    return NatsSource(
        "test", NatsConfig("nats://localhost:4222", "orders.>"),
        str(tmp_path / "spool"),
    )


def test_nats_payload_parsing_parity(spark, nats_source):
    """Same precedence as MQTT but subjects split on '.'
    (nats.rs:268-275): event_type > type > last subject segment."""
    src = nats_source
    src.ingest("orders.us.created", json.dumps({"event_type": "Order", "x": 1.0}))
    src.ingest("orders.us.created", json.dumps({"type": "Alt", "x": 2.0}))
    src.ingest("orders.eu.shipped", json.dumps({"x": 3.0}))  # subject fallback
    src.ingest("plain", json.dumps({"y": "s"}))  # single segment, missing x
    src.ingest(
        "orders.us.created",
        json.dumps({"event_type": "Nested", "x": 9.0, "data": {"x": 4.0}}),
    )
    src.flush()
    rows = src.batch(spark, "x double, y string").df.collect()
    got = sorted((r.event_type, r.x) for r in rows)
    assert got == [
        ("Alt", 2.0),
        ("Nested", 4.0),  # data.x wins over top-level x
        ("Order", 1.0),
        ("plain", None),
        ("shipped", 3.0),  # last '.'-segment, NOT '/'-split
    ]
    assert all(r.ts is not None for r in rows)


def test_nats_oversize_payload_skipped(nats_source):
    """Payloads over MAX_EVENT_PAYLOAD_BYTES are skipped with a warning,
    not spooled (nats.rs:127-133)."""
    big = json.dumps({"x": "a" * (MAX_EVENT_PAYLOAD_BYTES + 1)})
    with pytest.warns(UserWarning, match="payload too large"):
        nats_source.ingest("orders.big", big)
    nats_source.ingest("orders.ok", json.dumps({"x": "ok"}))
    assert nats_source.skipped_oversize == 1
    path = nats_source.flush()
    with open(path) as f:
        lines = f.readlines()
    assert len(lines) == 1 and "ok" in lines[0]


def test_nats_stream_replays_spool(spark, nats_source):
    for i in range(3):
        nats_source.ingest("m.x", json.dumps({"event_type": "M", "x": float(i)}))
        nats_source.flush()
    st = nats_source.stream(spark, "x double", max_files_per_trigger=1)
    assert st.df.isStreaming
    out = st.where(st.df.x >= 1.0)
    S.run_to_memory(out, "nats_stream")
    got = sorted(r.x for r in spark.sql("SELECT x FROM nats_stream").collect())
    assert got == [1.0, 2.0]


class FakeNatsClient:
    def __init__(self):
        self.published = []

    def publish(self, subject, payload):
        self.published.append((subject, payload))


def test_nats_sink_publishes_json(spark):
    fake = FakeNatsClient()
    sink = NatsSink(
        "out", NatsConfig("nats://localhost:4222", "alerts.high"), client=fake
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string")
    sink.write_batch(df, epoch=0)
    assert {s for s, _ in fake.published} == {"alerts.high"}
    assert sorted(json.loads(p)["id"] for _, p in fake.published) == [1, 2]


def test_nats_connect_requires_nats_py(nats_source):
    with pytest.raises(ImportError, match="nats-py"):
        nats_source.connect()


def test_nats_queue_group_recorded():
    cfg = NatsConfig("nats://h:4222", "s.a", queue_group="workers")
    assert cfg.queue_group == "workers"


# ---------------------------------------------------------------------------
# Kinesis
# ---------------------------------------------------------------------------

@pytest.fixture()
def kin_source(tmp_path):
    return KinesisSource(
        "test", KinesisConfig("my-stream", "us-east-1"), str(tmp_path / "spool")
    )


def test_kinesis_config_clamps():
    """batch_size clamps to [1, 10000] (kinesis.rs:75); unknown iterator
    types fall back to LATEST (kinesis.rs:311-315)."""
    c = KinesisConfig("s", "r", batch_size=99999, shard_iterator_type="BOGUS")
    assert c.batch_size == 10000 and c.shard_iterator_type == "LATEST"
    assert KinesisConfig("s", "r", batch_size=-5).batch_size == 1
    assert KinesisConfig(
        "s", "r", shard_iterator_type="TRIM_HORIZON"
    ).shard_iterator_type == "TRIM_HORIZON"


def test_kinesis_record_parsing_parity(spark, kin_source):
    """JSON records parse with default type WebhookEvent (kinesis.rs:470,
    no subject to fall back on); non-JSON records become KinesisRecord
    rows carrying raw_data + partition_key (kinesis.rs:355-369)."""
    src = kin_source
    src.ingest(json.dumps({"event_type": "Order", "x": 1.0}), "pk-1")
    src.ingest(json.dumps({"type": "Alt", "x": 2.0}), "pk-2")
    src.ingest(json.dumps({"x": 3.0}), "pk-3")  # -> WebhookEvent
    src.ingest(
        json.dumps({"event_type": "Nested", "x": 9.0, "data": {"x": 4.0}}),
        "pk-4",
    )
    src.ingest("not json at all", "pk-5")  # -> KinesisRecord
    src.flush()
    rows = src.batch(spark, "x double").df.collect()
    got = sorted(((r.event_type, r.x, r.raw_data) for r in rows),
                 key=lambda t: t[0])
    assert got == [
        ("Alt", 2.0, None),
        ("KinesisRecord", None, "not json at all"),
        ("Nested", 4.0, None),
        ("Order", 1.0, None),
        ("WebhookEvent", 3.0, None),
    ]
    by_type = {r.event_type: r for r in rows}
    assert by_type["KinesisRecord"].partition_key == "pk-5"
    assert all(r.ts is not None for r in rows)


def test_kinesis_stream_replays_spool(spark, kin_source):
    for i in range(3):
        kin_source.ingest(json.dumps({"event_type": "M", "x": float(i)}), "pk")
        kin_source.flush()
    st = kin_source.stream(spark, "x double", max_files_per_trigger=1)
    assert st.df.isStreaming
    out = st.where(st.df.x >= 1.0)
    S.run_to_memory(out, "kinesis_stream")
    got = sorted(r.x for r in spark.sql("SELECT x FROM kinesis_stream").collect())
    assert got == [1.0, 2.0]


class FakeKinesisClient:
    def __init__(self):
        self.records = []

    def put_record(self, StreamName, PartitionKey, Data):
        self.records.append((StreamName, PartitionKey, Data))


def test_kinesis_sink_fixed_and_random_partition_keys(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    fixed = FakeKinesisClient()
    KinesisSink(
        "out", KinesisConfig("s", "r", partition_key="fixed"), client=fixed
    ).write_batch(df, 0)
    assert {pk for _, pk, _ in fixed.records} == {"fixed"}
    rand = FakeKinesisClient()
    KinesisSink("out", KinesisConfig("s", "r"), client=rand).write_batch(df, 0)
    keys = [pk for _, pk, _ in rand.records]
    assert len(set(keys)) == 2  # fresh UUID per record (kinesis.rs:435-439)
    payload_ids = sorted(json.loads(d.decode()) ["id"] for _, _, d in rand.records)
    assert payload_ids == [1, 2]


def test_kinesis_sink_composes_with_resilient_sink(spark, tmp_path):
    class Broken:
        def put_record(self, **_kw):
            raise ConnectionError("throttled")

    sink = KinesisSink("out", KinesisConfig("s", "r"), client=Broken())
    dlq = str(tmp_path / "dlq")
    wrapped = S.resilient_sink_fn(sink.write_batch, dlq, connector="kinesis")
    wrapped(spark.createDataFrame([(1,)], "id long"), 0)
    rows = S.read_dlq(spark, dlq).collect()
    assert len(rows) == 1 and rows[0].connector == "kinesis"
    assert "throttled" in rows[0].error


class FakePollClient:
    """Speaks just enough of the Kinesis API to drive one poll cycle:
    one shard, one GetRecords batch, then the shard closes
    (NextShardIterator=None)."""

    def describe_stream(self, StreamName):
        assert StreamName == "my-stream"
        return {"StreamDescription": {"Shards": [{"ShardId": "shard-0"}]}}

    def get_shard_iterator(self, StreamName, ShardId, ShardIteratorType):
        assert ShardIteratorType == "LATEST"
        return {"ShardIterator": "it-0"}

    def get_records(self, ShardIterator, Limit):
        assert ShardIterator == "it-0" and Limit == 100
        return {
            "Records": [
                {
                    "Data": json.dumps({"event_type": "E", "x": 7.0}).encode(),
                    "PartitionKey": "pk",
                    "SequenceNumber": "1",
                }
            ],
            "NextShardIterator": None,
        }


def test_kinesis_connect_polls_shards(spark, kin_source):
    """connect() with an injected client drives the real shard-polling
    loop: describe → iterator → get_records → ingest+flush → shard end
    (kinesis.rs:290-386)."""
    kin_source.connect(client=FakePollClient())
    kin_source._thread.join(timeout=10)
    assert not kin_source._thread.is_alive()
    rows = kin_source.batch(spark, "x double").df.collect()
    assert len(rows) == 1 and rows[0].event_type == "E" and rows[0].x == 7.0
    assert rows[0].partition_key == "pk"


def test_kinesis_connect_surfaces_connection_errors(kin_source):
    """Bad credentials/endpoint fail synchronously in connect(), not
    silently inside the polling thread (kinesis.rs:256-276 surfaces
    ConnectionFailed the same way)."""

    class Refuses:
        def describe_stream(self, StreamName):
            raise ConnectionError("no credentials")

    with pytest.raises(ConnectionError):
        kin_source.connect(client=Refuses())
