"""Kafka connector plumbing tests (VERDICT r4 task 7): no broker exists in
the sandbox, but everything short of the socket is testable — option
construction against KafkaConfig semantics (kafka.rs:19-55,180-192) and
payload lowering parity (kafka.rs:260-285, event.rs:138-155) over local
DataFrames shaped like the built-in source's output."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row

from varpulis_spark.sources.kafka import (
    MAX_EVENT_PAYLOAD_BYTES,
    KafkaConfig,
    kafka_reader_options,
    kafka_sink_frame,
    kafka_writer_options,
    parse_kafka_events,
)

UTC = dt.timezone.utc


def _kafka_frame(spark, payloads: list[bytes | None], topic: str = "events"):
    """A local DataFrame with the built-in Kafka source's output shape."""
    rows = [
        Row(
            key=None,
            value=p,
            topic=topic,
            partition=0,
            offset=i,
            timestamp=dt.datetime(2026, 1, 1, 12, 0, i, tzinfo=UTC),
            timestampType=0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )


# ---------------------------------------------------------------------------
# option construction (KafkaConfig → Spark options)
# ---------------------------------------------------------------------------


def test_reader_options_managed_keys_skipped():
    """apply_properties (kafka.rs:184-187) skips bootstrap.servers and
    group.id in the pass-through map — the dedicated config fields own
    them."""
    cfg = KafkaConfig(
        brokers="b1:9092,b2:9092",
        topic="trades",
        group_id="cep",
        properties={
            "bootstrap.servers": "evil:9092",  # must be ignored
            "group.id": "evil",  # must be ignored
            "security.protocol": "SASL_SSL",
            "max.poll.records": "500",
        },
    )
    opts = kafka_reader_options(cfg, starting_offsets="earliest")
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "trades"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "cep"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.max.poll.records"] == "500"
    assert "kafka.kafka.bootstrap.servers" not in opts


def test_writer_options_transactional_id():
    """transactional_id lowers to idempotent production ONLY: Spark's Kafka
    sink never opens a transaction, so a passed-through transactional.id
    would make every real-broker send throw IllegalStateException
    (ADVICE r5; the sink is at-least-once by design)."""
    cfg = KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1")
    opts = kafka_writer_options(cfg)
    assert opts["topic"] == "out"
    assert "kafka.transactional.id" not in opts  # would break the producer
    assert opts["kafka.enable.idempotence"] == "true"
    plain = kafka_writer_options(KafkaConfig(brokers="b:9092", topic="out"))
    assert "kafka.enable.idempotence" not in plain


# ---------------------------------------------------------------------------
# source payload lowering (kafka.rs:260-285)
# ---------------------------------------------------------------------------


def test_parse_event_type_precedence_and_default(spark):
    """event_type comes from the payload; missing → \"KafkaEvent\"
    (kafka.rs:273-276). Kafka has NO topic-segment fallback — that rule is
    MQTT/NATS-only (parse_mqtt_payload vs the kafka source loop)."""
    payloads = [
        json.dumps({"event_type": "Trade", "symbol": "ACME", "price": 10.5}).encode(),
        json.dumps({"symbol": "DUCK", "price": 1.25}).encode(),
    ]
    out = parse_kafka_events(
        _kafka_frame(spark, payloads, topic="md.trades"),
        "symbol string, price double",
    ).collect()
    assert [r.event_type for r in out] == ["Trade", "KafkaEvent"]
    assert out[0].symbol == "ACME" and out[0].price == 10.5
    # no topic fallback: default is the literal KafkaEvent, not "trades"
    assert out[1].event_type == "KafkaEvent"


def test_parse_nested_data_object(spark):
    """A nested `data` OBJECT supplies the fields (shared broker decode
    shape; json_to_event helpers.rs:10-33)."""
    payloads = [
        json.dumps(
            {"event_type": "Reading", "data": {"symbol": "NEST", "price": 3.5}}
        ).encode()
    ]
    out = parse_kafka_events(
        _kafka_frame(spark, payloads), "symbol string, price double"
    ).collect()
    assert out[0].symbol == "NEST" and out[0].price == 3.5


def test_parse_oversize_payload_dropped_and_malformed_kept(spark):
    """Payloads over MAX_EVENT_PAYLOAD_BYTES are rejected BEFORE JSON
    parsing (kafka.rs:262-269, limits.rs:8); malformed JSON yields a
    null-field row with the default type so a DLQ can see it."""
    big = json.dumps({"symbol": "BIG", "pad": "x" * (MAX_EVENT_PAYLOAD_BYTES + 10)})
    payloads = [big.encode(), b"not json at all", json.dumps({"symbol": "OK"}).encode()]
    out = parse_kafka_events(
        _kafka_frame(spark, payloads), "symbol string, price double"
    ).collect()
    assert [r.symbol for r in out] == [None, "OK"]  # oversize row is GONE
    assert out[0].event_type == "KafkaEvent"  # malformed kept, null fields


# ---------------------------------------------------------------------------
# sink framing (kafka.rs:405-412, event.rs:138-155)
# ---------------------------------------------------------------------------


def test_sink_frame_key_and_payload_shape(spark):
    df = spark.createDataFrame(
        [
            Row(
                ts=dt.datetime(2026, 1, 2, 3, 4, 5, 123456, tzinfo=UTC),
                event_type="Alert",
                symbol="ACME",
                price=99.5,
            )
        ],
        "ts timestamp, event_type string, symbol string, price double",
    )
    out = kafka_sink_frame(df).collect()[0]
    assert out.key == "Alert"  # key = event_type (kafka.rs:410-411)
    payload = json.loads(out.value)
    assert payload["event_type"] == "Alert"
    assert payload["symbol"] == "ACME" and payload["price"] == 99.5
    # RFC3339 with µs precision, UTC (serde DateTime<Utc> parity)
    assert payload["timestamp"].startswith("2026-01-02T03:04:05.123456")
    # field order: event_type first, timestamp second (event.rs:144-147)
    assert list(payload.keys())[:2] == ["event_type", "timestamp"]


def test_reader_builds_streaming_source(spark):
    """kafka_source wires the options into readStream.format('kafka') —
    building the unresolved plan needs no broker; the options land in the
    stream's logical plan."""
    pytest.importorskip("pyspark")
    from varpulis_spark.sources.kafka import kafka_source

    try:
        s = kafka_source(
            spark,
            KafkaConfig(brokers="localhost:9092", topic="t"),
            value_schema="symbol string",
        )
    except Exception as e:  # pragma: no cover - kafka jars absent
        pytest.skip(f"kafka format unavailable in this Spark build: {e}")
    assert s.df.isStreaming
    assert [f.name for f in s.df.schema.fields[:2]] == ["ts", "event_type"]


def test_registry_builds_kafka_connector():
    """ConnectorRegistry kafka type (managed_kafka.rs): shared source/sink
    handles constructed from a config dict — no broker needed to build."""
    from varpulis_spark.registry import ConnectorRegistry

    reg = ConnectorRegistry.from_configs(
        {
            "mk": {
                "type": "kafka",
                "brokers": "b1:9092",
                "topic": "trades",
                "group_id": "cep",
                "properties": {"security.protocol": "SASL_SSL"},
            }
        }
    )
    src = reg.source("mk")
    snk = reg.sink("mk")
    assert src.config.brokers == "b1:9092" and snk.config.topic == "trades"
    opts = kafka_reader_options(src.config)
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert [t for _n, t, _r in reg.health_reports()] == ["kafka"]
    reg.shutdown()


# ---------------------------------------------------------------------------
# exactly-once transactional sink (kafka.rs:331-431 send_batch_transactional)
# ---------------------------------------------------------------------------


class FakeTxnProducer:
    """librdkafka-surface fake recording the transaction call sequence.
    `fail_on` is a set of (method, call_index) pairs that raise."""

    def __init__(self, fail_on=()):
        self.log = []  # flat call trace
        self.records = []  # (topic, key, value) of the CURRENT transaction
        self.committed = []  # records visible to a read_committed consumer
        self.fail_on = set(fail_on)
        self.counts = {}

    def _call(self, name):
        i = self.counts.get(name, 0)
        self.counts[name] = i + 1
        self.log.append(name)
        if (name, i) in self.fail_on:
            raise RuntimeError(f"injected {name} failure #{i}")

    def init_transactions(self):
        self._call("init_transactions")

    def begin_transaction(self):
        self._call("begin_transaction")
        self.records = []

    def produce(self, topic, key=None, value=None):
        self._call("produce")
        self.records.append((topic, key, value))

    def commit_transaction(self):
        self._call("commit_transaction")
        self.committed.extend(self.records)
        self.records = []

    def abort_transaction(self):
        self._call("abort_transaction")
        self.records = []


def _mini_batch(spark, values):
    import pyspark.sql.functions as F

    return (
        spark.createDataFrame([(float(v),) for v in values], "value double")
        .select(
            F.lit("Alert").alias("event_type"),
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
            "value",
        )
    )


def test_txn_sink_commit_sequence(spark):
    """Happy path: init once, then begin → produce rows → produce the epoch
    marker → commit, atomically per epoch."""
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    fake = FakeTxnProducer()
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    assert sink.write_batch(_mini_batch(spark, [1, 2]), epoch=0) == "committed"
    assert fake.log[0] == "init_transactions"
    assert fake.log[1] == "begin_transaction"
    assert fake.log.count("produce") == 3  # 2 rows + 1 epoch marker
    assert fake.log[-1] == "commit_transaction"
    data = [r for r in fake.committed if r[0] == "out"]
    marks = [r for r in fake.committed if r[0].endswith(".__varpulis_epochs")]
    assert len(data) == 2 and all(r[1] == "Alert" for r in data)
    assert marks == [("out.__varpulis_epochs", "app-1", "0")]
    # second epoch: no re-init, fresh transaction
    sink.write_batch(_mini_batch(spark, [3]), epoch=1)
    assert fake.log.count("init_transactions") == 1
    assert fake.log.count("begin_transaction") == 2


def test_txn_sink_abort_on_failure_then_retry_commits_once(spark):
    """A commit failure aborts the transaction (nothing visible), the error
    propagates so Spark retries the SAME epoch, and the retry lands the
    batch exactly once (kafka.rs:413-428 abort-on-error contract)."""
    import pytest as _pytest

    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    fake = FakeTxnProducer(fail_on={("commit_transaction", 0)})
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    batch = _mini_batch(spark, [1, 2])
    with _pytest.raises(RuntimeError, match="injected commit"):
        sink.write_batch(batch, epoch=0)
    # aborted: a read_committed consumer saw NOTHING
    assert fake.committed == []
    assert fake.log[-1] == "abort_transaction"
    assert sink.last_committed_epoch == -1
    # Spark redelivers epoch 0 → a fresh transaction commits exactly once
    assert sink.write_batch(batch, epoch=0) == "committed"
    assert len([r for r in fake.committed if r[0] == "out"]) == 2
    assert fake.log.count("begin_transaction") == 2


def test_txn_sink_send_failure_aborts(spark):
    import pytest as _pytest

    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    fake = FakeTxnProducer(fail_on={("produce", 1)})
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    with _pytest.raises(RuntimeError, match="injected produce"):
        sink.write_batch(_mini_batch(spark, [1, 2]), epoch=0)
    assert fake.committed == [] and fake.log[-1] == "abort_transaction"


def test_txn_sink_skips_already_committed_epoch(spark):
    """foreachBatch redelivers the last epoch after a restart; the epoch
    marker committed with the data makes the redelivery a no-op — the
    at-least-once → exactly-once conversion."""
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    fake = FakeTxnProducer()
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    batch = _mini_batch(spark, [1, 2])
    assert sink.write_batch(batch, epoch=5) == "committed"
    n = len(fake.committed)
    assert sink.write_batch(batch, epoch=5) == "skipped"
    assert sink.write_batch(batch, epoch=4) == "skipped"
    assert len(fake.committed) == n  # nothing re-produced
    # recovery shape: a fresh sink re-baselined from the marker topic
    sink2 = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
        last_committed_epoch=5,
    )
    assert sink2.write_batch(batch, epoch=5) == "skipped"
    assert sink2.write_batch(batch, epoch=6) == "committed"


def test_txn_sink_requires_transactional_id():
    import pytest as _pytest

    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    with _pytest.raises(ValueError, match="transactional_id"):
        TransactionalKafkaSink(KafkaConfig(brokers="b", topic="t"))


def test_sink_handle_routes_transactional(spark):
    """KafkaSinkHandle with a transactional id delivers through the
    transactional path (one txn per epoch), not the built-in writer."""
    from varpulis_spark.sources.kafka import KafkaConfig, KafkaSinkHandle

    fake = FakeTxnProducer()
    h = KafkaSinkHandle(
        "k",
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    h.write_batch(_mini_batch(spark, [7]), epoch=0)
    assert fake.log.count("commit_transaction") == 1
    assert len([r for r in fake.committed if r[0] == "out"]) == 1


class FakeRecoveryConsumer:
    """Minimal read_committed consumer surface over a FakeTxnProducer's
    committed records: subscribe / poll / close."""

    def __init__(self, committed):
        self._committed = committed
        self._queue = []
        self.closed = False
        self.subscribed = None

    def subscribe(self, topics):
        self.subscribed = list(topics)

        class _Msg:
            def __init__(self, key, value):
                self._k, self._v = key, value

            def key(self):
                return self._k.encode() if isinstance(self._k, str) else self._k

            def value(self):
                return self._v.encode() if isinstance(self._v, str) else self._v

            def error(self):
                return None

        self._queue = [
            _Msg(k, v) for t, k, v in self._committed if t in self.subscribed
        ]

    def poll(self, timeout):
        return self._queue.pop(0) if self._queue else None

    def close(self):
        self.closed = True


def test_txn_sink_recovers_epoch_from_marker_topic(spark):
    """Driver restart: a fresh sink re-baselines last_committed_epoch from
    the marker topic (read_committed), so foreachBatch's redelivery of the
    pre-crash epoch is skipped — no duplicates (ADVICE r9 #1)."""
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    cfg = KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1")
    fake = FakeTxnProducer()
    sink = TransactionalKafkaSink(cfg, producer_factory=lambda: fake)
    batch = _mini_batch(spark, [1, 2])
    sink.write_batch(batch, epoch=3)
    sink.write_batch(batch, epoch=4)
    n_before = len(fake.committed)

    # "restart": fresh sink over the same broker state, default -1 baseline
    consumer = FakeRecoveryConsumer(fake.committed)
    sink2 = TransactionalKafkaSink(
        cfg, producer_factory=lambda: fake, consumer_factory=lambda: consumer
    )
    # redelivered last epoch → recovered baseline skips it
    assert sink2.write_batch(batch, epoch=4) == "skipped"
    assert sink2.last_committed_epoch == 4
    assert consumer.closed and consumer.subscribed == ["out.__varpulis_epochs"]
    assert len(fake.committed) == n_before  # nothing re-produced
    # next epoch proceeds normally
    assert sink2.write_batch(batch, epoch=5) == "committed"


def test_txn_sink_recovery_ignores_other_transactional_ids(spark):
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    committed = [
        ("out.__varpulis_epochs", "other-app", "99"),
        ("out.__varpulis_epochs", "app-1", "2"),
        ("out.__varpulis_epochs", "app-1", "not-an-int"),
    ]
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b", topic="out", transactional_id="app-1"),
        producer_factory=lambda: FakeTxnProducer(),
        consumer_factory=lambda: FakeRecoveryConsumer(committed),
    )
    assert sink.recover_last_committed_epoch() == 2


def test_txn_sink_no_consumer_means_process_lifetime_only(spark):
    """An injected producer without a consumer factory cannot recover —
    behaves as before (epoch 0 commits after 'restart')."""
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    fake = FakeTxnProducer()
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    assert sink.write_batch(_mini_batch(spark, [1]), epoch=0) == "committed"


def test_txn_sink_produce_buffer_overflow_flushes_and_retries(spark):
    """librdkafka queue-full: produce raises BufferError; the sink must
    flush and retry inside the transaction instead of aborting (ADVICE r9
    #3 — otherwise Spark retries the identical batch forever)."""
    from varpulis_spark.sources.kafka import KafkaConfig, TransactionalKafkaSink

    class OverflowingProducer(FakeTxnProducer):
        def __init__(self):
            super().__init__()
            self.flushes = 0
            self.polls = 0
            self._fail_next = True

        def poll(self, timeout):
            self.polls += 1

        def flush(self, *a):
            self.flushes += 1

        def produce(self, topic, key=None, value=None):
            if self._fail_next and topic == "out":
                self._fail_next = False
                raise BufferError("Local: Queue full")
            super().produce(topic, key=key, value=value)

    fake = OverflowingProducer()
    sink = TransactionalKafkaSink(
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
    )
    assert sink.write_batch(_mini_batch(spark, [1, 2]), epoch=0) == "committed"
    assert fake.flushes == 1  # overflow drained, not aborted
    assert fake.polls >= 3  # poll(0) services callbacks per produce
    assert len([r for r in fake.committed if r[0] == "out"]) == 2


def test_sink_handle_passes_consumer_factory(spark):
    from varpulis_spark.sources.kafka import KafkaConfig, KafkaSinkHandle

    fake = FakeTxnProducer()
    fake.committed = [("out.__varpulis_epochs", "app-1", "7")]
    h = KafkaSinkHandle(
        "k",
        KafkaConfig(brokers="b:9092", topic="out", transactional_id="app-1"),
        producer_factory=lambda: fake,
        consumer_factory=lambda: FakeRecoveryConsumer(fake.committed),
    )
    assert h._txn_sink.write_batch(_mini_batch(spark, [1]), epoch=7) == "skipped"
