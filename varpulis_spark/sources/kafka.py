"""Kafka connector plumbing (reference: connector/kafka.rs:1-538,
managed_kafka.rs).

Spark ships a first-class Kafka source/sink (`format("kafka")`), so unlike
MQTT/NATS/Kinesis no spool bridge is needed — this module supplies the
reference-parity pieces AROUND the built-in format:

- `KafkaConfig` mirrors KafkaConfig (kafka.rs:19-55): brokers, topic,
  optional consumer group, pass-through client properties (internally
  managed keys are skipped exactly like apply_properties, kafka.rs:180-192).
- `TransactionalKafkaSink` (r9): exactly-once delivery when
  `transactional_id` is set — one producer transaction per foreachBatch
  epoch (begin → produce → epoch marker → commit, abort-and-reraise on
  failure, already-committed epochs skipped), the Spark analog of
  kafka.rs send_batch_transactional. The built-in `format("kafka")`
  writer stays the non-transactional path (it is at-least-once and must
  never see `transactional.id`, which `kafka_writer_options` therefore
  lowers to idempotence only).
- `kafka_reader_options` / `kafka_writer_options` lower the config to the
  Spark option maps (client properties get the `kafka.` prefix Spark
  forwards verbatim to the underlying client).
- `parse_kafka_events` lowers the source's payload rules (kafka.rs:260-285)
  to Catalyst expressions: oversize payloads (> 1 MiB,
  limits.rs MAX_EVENT_PAYLOAD_BYTES) are dropped BEFORE parsing;
  `event_type` comes from the JSON payload with default "KafkaEvent"
  (Kafka has no topic-segment fallback — that rule is MQTT/NATS-only);
  a nested `data` object supplies fields like the other connectors.
- `kafka_sink_frame` lowers the sink's framing (kafka.rs:405-412):
  value = to_sink_payload JSON (event_type first, then timestamp, then the
  payload fields — event.rs:138-155), key = event_type (per-type ordering
  under Kafka's per-key partitioning, same delivery contract).

All of this is pure DataFrame/option plumbing, unit-testable without a
broker (tests/test_kafka.py); against a real cluster the same frames plug
into `readStream`/`writeStream.format("kafka")` unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from varpulis_spark.stream import Stream

MAX_EVENT_PAYLOAD_BYTES = 1_048_576  # limits.rs:8

# keys the config owns; user properties for these are ignored
# (apply_properties, kafka.rs:184-187)
_MANAGED_KEYS = {"bootstrap.servers", "group.id"}


@dataclass
class KafkaConfig:
    brokers: str
    topic: str
    group_id: str | None = None
    properties: dict[str, str] = field(default_factory=dict)
    transactional_id: str | None = None


def kafka_reader_options(
    config: KafkaConfig, starting_offsets: str = "latest"
) -> dict[str, str]:
    """Spark readStream options for the consumer side. Pass-through client
    properties are prefixed `kafka.`; managed keys are skipped."""
    opts = {
        "kafka.bootstrap.servers": config.brokers,
        "subscribe": config.topic,
        "startingOffsets": starting_offsets,
    }
    if config.group_id:
        # Spark owns group semantics; groupIdPrefix keeps the reference's
        # named-group observability without breaking offset management
        opts["kafka.group.id"] = config.group_id
    for k, v in config.properties.items():
        if k in _MANAGED_KEYS:
            continue
        opts[f"kafka.{k}"] = v
    return opts


def kafka_writer_options(config: KafkaConfig) -> dict[str, str]:
    """writeStream options for the producer side.

    `transactional_id` (KafkaConfig, kafka.rs:24-26) lowers to IDEMPOTENT
    production only HERE: Spark's built-in Kafka sink never calls
    initTransactions/beginTransaction on its producer, so passing
    `transactional.id` through would make every send throw
    IllegalStateException against a real broker (ADVICE r5). For true
    exactly-once delivery use `TransactionalKafkaSink` (r9) — one driver-
    side transaction per foreachBatch epoch with an atomic epoch marker;
    `KafkaSinkHandle` routes there automatically when transactional_id is
    set."""
    opts = {
        "kafka.bootstrap.servers": config.brokers,
        "topic": config.topic,
    }
    if config.transactional_id:
        opts["kafka.enable.idempotence"] = "true"
    for k, v in config.properties.items():
        if k in _MANAGED_KEYS:
            continue
        opts[f"kafka.{k}"] = v
    return opts


def parse_kafka_events(df: DataFrame, value_schema: str) -> DataFrame:
    """Lower the Kafka source's payload rules to Catalyst expressions over
    the built-in source's output columns (key, value, topic, partition,
    offset, timestamp, ...).

    kafka.rs:260-285 in order: payload size limit BEFORE JSON parsing;
    event_type = payload `event_type` else "KafkaEvent" (no topic
    fallback); fields from a nested `data` object when present, else
    top-level keys; malformed JSON yields a null-field row with the default
    type (a DLQ can still see it)."""
    from pyspark.sql.types import StructType

    df = df.filter(F.length(F.col("value")) <= MAX_EVENT_PAYLOAD_BYTES)
    payload = F.col("value").cast("string")
    top = F.from_json(payload, value_schema)
    nested = F.from_json(payload, f"data struct<{value_schema}>")
    types = F.from_json(payload, "event_type string")
    event_type = F.coalesce(types.getField("event_type"), F.lit("KafkaEvent"))
    field_names = [f.name for f in StructType.fromDDL(value_schema).fields]
    has_data = nested.getField("data").isNotNull()
    cols = [
        F.when(has_data, nested.getField("data").getField(n))
        .otherwise(top.getField(n))
        .alias(n)
        for n in field_names
    ]
    return df.select(
        F.col("timestamp").alias("ts"), event_type.alias("event_type"), *cols
    )


def kafka_sink_frame(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Produce the (key, value) frame the Kafka sink writes.

    value mirrors Event::to_sink_payload (event.rs:138-155): a JSON object
    with event_type first, then the RFC3339 timestamp, then every payload
    field except any `timestamp` duplicate. key = event_type
    (kafka.rs:410-411) so per-type ordering survives partitioning.
    `to_json(struct(...))` preserves field order, and null fields are kept
    out of the payload only when absent in the row — same as serde's map
    serialization of present keys."""
    payload_cols = [
        c for c in df.columns if c not in {ts_col, "event_type", "timestamp"}
    ]
    value = F.to_json(
        F.struct(
            F.col("event_type"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(
                "timestamp"
            ),
            *[F.col(c) for c in payload_cols],
        )
    )
    return df.select(
        F.col("event_type").cast("string").alias("key"), value.alias("value")
    )


class KafkaSourceHandle:
    """Registry-facing source handle (`ConnectorRegistry` kafka type):
    `.stream()` → the built-in streaming format; `.batch()` → Spark's batch
    Kafka read (earliest→latest), both through the same payload lowering."""

    def __init__(self, name: str, config: KafkaConfig):
        self.name = name
        self.config = config

    def stream(self, spark: SparkSession, value_schema: str, **kw) -> Stream:
        return kafka_source(spark, self.config, value_schema=value_schema, **kw)

    def batch(self, spark: SparkSession, value_schema: str) -> Stream:
        reader = spark.read.format("kafka")
        opts = kafka_reader_options(self.config, starting_offsets="earliest")
        opts["endingOffsets"] = "latest"
        for k, v in opts.items():
            reader = reader.option(k, v)
        return Stream(parse_kafka_events(reader.load(), value_schema), ts_col="ts")


class KafkaSinkHandle:
    """Registry-facing sink: `write_batch(df, epoch)` frames rows as
    (key=event_type, value=to_sink_payload JSON) and writes through the
    built-in batch Kafka writer (kafka.rs:405-412 delivery contract).

    With `transactional_id` set the handle routes through
    `TransactionalKafkaSink` (exactly-once, one transaction per epoch,
    kafka.rs send_batch_transactional) — that path needs a driver-side
    transactional client (confluent_kafka by default, or inject
    `producer_factory`); without a transactional id the built-in
    distributed writer delivers idempotent at-least-once."""

    def __init__(
        self,
        name: str,
        config: KafkaConfig,
        ts_col: str = "ts",
        producer_factory=None,
        consumer_factory=None,
    ):
        self.name = name
        self.config = config
        self.ts_col = ts_col
        self._txn_sink = (
            TransactionalKafkaSink(
                config, ts_col, producer_factory, consumer_factory=consumer_factory
            )
            if config.transactional_id
            else None
        )

    def write_batch(self, df: DataFrame, epoch: int = 0) -> None:
        if self._txn_sink is not None:
            self._txn_sink.write_batch(df, epoch)
            return
        framed = kafka_sink_frame(df, self.ts_col)
        writer = framed.write.format("kafka")
        for k, v in kafka_writer_options(self.config).items():
            writer = writer.option(k, v)
        writer.save()


class TransactionalKafkaSink:
    """Exactly-once Kafka delivery for foreachBatch (kafka.rs:331-431
    `send_batch_transactional`, managed_kafka.rs) — the piece Spark's
    built-in Kafka sink does not provide (it is at-least-once and never
    opens producer transactions).

    Semantics, mapped onto Spark's micro-batch retry model:
    - one Kafka TRANSACTION per (epoch) batch: begin → produce every
      framed row → produce one epoch MARKER record → commit. A consumer
      in `read_committed` sees all of the batch or none of it
      (kafka.rs:397-398).
    - any send/commit failure ABORTS the transaction and re-raises; the
      aborted records are never visible, and Spark's retry of the same
      epoch re-sends them in a fresh transaction (kafka.rs:413-415).
    - a RE-DELIVERED epoch (foreachBatch replays the last batch after a
      restart) is SKIPPED: the epoch marker committed atomically with the
      data records who owns the epoch, so `last_committed_epoch` recovery
      + the skip turns at-least-once redelivery into exactly-once output.

    The producer runs on the driver (a Kafka transaction is single-
    producer, like the reference's single-process sink); rows stream in
    via toLocalIterator, so driver memory stays bounded by one partition.

    `producer_factory()` must return an object with the librdkafka-style
    surface: init_transactions(), begin_transaction(),
    produce(topic, key=, value=), commit_transaction(),
    abort_transaction(). The default factory builds a confluent_kafka
    Producer; tests inject a fake (tests/test_kafka.py)."""

    MARKER_TOPIC_SUFFIX = ".__varpulis_epochs"

    def __init__(
        self,
        config: KafkaConfig,
        ts_col: str = "ts",
        producer_factory=None,
        last_committed_epoch: int = -1,
        consumer_factory=None,
    ):
        if not config.transactional_id:
            raise ValueError(
                "TransactionalKafkaSink requires KafkaConfig.transactional_id "
                "(unique per application instance, kafka.rs:24-26)"
            )
        self.config = config
        self.ts_col = ts_col
        self._producer_factory_injected = producer_factory is not None
        self._factory = producer_factory or self._default_factory
        self._consumer_factory = consumer_factory
        self._producer = None
        self.last_committed_epoch = last_committed_epoch
        self._recovery_attempted = False

    def _default_factory(self):
        try:
            from confluent_kafka import Producer  # type: ignore
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "transactional Kafka delivery needs the confluent_kafka "
                "client on the driver (Spark's built-in sink cannot open "
                "producer transactions); install confluent-kafka or drop "
                "transactional_id for idempotent at-least-once delivery"
            ) from e
        conf = {
            "bootstrap.servers": self.config.brokers,
            "transactional.id": self.config.transactional_id,
            "enable.idempotence": True,
        }
        for k, v in self.config.properties.items():
            if k in _MANAGED_KEYS or k == "transactional.id":
                continue
            conf[k] = v
        return Producer(conf)

    def _default_consumer_factory(self):
        try:
            from confluent_kafka import Consumer  # type: ignore
        except ImportError:  # pragma: no cover - env-dependent
            return None
        return Consumer(
            {
                "bootstrap.servers": self.config.brokers,
                "group.id": f"{self.config.transactional_id}.__recovery",
                "isolation.level": "read_committed",
                "enable.auto.commit": False,
                "auto.offset.reset": "earliest",
            }
        )

    def _make_recovery_consumer(self):
        if self._consumer_factory is not None:
            return self._consumer_factory()
        if self._producer_factory_injected:
            # custom producer without a matching consumer: recovery is not
            # possible — exactly-once holds for the process lifetime only
            return None
        return self._default_consumer_factory()

    def recover_last_committed_epoch(self, idle_timeout: float = 5.0) -> int:
        """Re-baseline `last_committed_epoch` from the epoch-marker topic
        after a driver restart: scan the marker topic with a read_committed
        consumer (markers from aborted transactions are invisible) and keep
        the max epoch recorded under this transactional id. Without this,
        foreachBatch's redelivery of the last pre-crash epoch would be
        re-committed — duplicates visible to read_committed consumers
        (ADVICE r9). The marker topic carries one tiny keyed record per
        epoch, so it should be log-compacted by key in production.

        The consumer needs: subscribe([topic]), poll(timeout) -> message
        with .key()/.value()/.error() or None when drained, close()."""
        c = self._make_recovery_consumer()
        if c is None:
            return self.last_committed_epoch
        try:
            c.subscribe([self.config.topic + self.MARKER_TOPIC_SUFFIX])
            latest = self.last_committed_epoch
            while True:
                msg = c.poll(idle_timeout)
                if msg is None:
                    break
                err = getattr(msg, "error", None)
                if err is not None and err():
                    continue
                key = msg.key()
                if isinstance(key, bytes):
                    key = key.decode("utf-8", "replace")
                if key != self.config.transactional_id:
                    continue
                val = msg.value()
                if isinstance(val, bytes):
                    val = val.decode("utf-8", "replace")
                try:
                    latest = max(latest, int(val))
                except (TypeError, ValueError):
                    continue
            self.last_committed_epoch = latest
            return latest
        finally:
            c.close()

    def _ensure_producer(self):
        if self._producer is None:
            self._producer = self._factory()
            self._producer.init_transactions()
        return self._producer

    @staticmethod
    def _produce_with_backpressure(p, topic: str, key, value) -> None:
        """librdkafka's local queue is bounded (default 100k messages);
        produce() raises BufferError when it fills. poll(0) services
        delivery callbacks each call to drain it, and on overflow we
        flush-and-retry instead of letting the exception abort the
        transaction — an epoch larger than the queue would otherwise abort
        and Spark would retry the identical batch forever (ADVICE r9)."""
        poll = getattr(p, "poll", None)
        if poll is not None:
            poll(0)
        try:
            p.produce(topic, key=key, value=value)
        except BufferError:
            flush = getattr(p, "flush", None)
            if flush is not None:
                flush()
            elif poll is not None:
                poll(1.0)
            p.produce(topic, key=key, value=value)

    def write_batch(self, df: DataFrame, epoch: int = 0) -> str:
        """Returns "committed" or "skipped" (already-committed epoch)."""
        if not self._recovery_attempted:
            self._recovery_attempted = True
            if self.last_committed_epoch < 0:
                self.recover_last_committed_epoch()
        if epoch <= self.last_committed_epoch:
            return "skipped"
        p = self._ensure_producer()
        framed = kafka_sink_frame(df, self.ts_col)
        p.begin_transaction()
        try:
            for row in framed.toLocalIterator():
                self._produce_with_backpressure(
                    p, self.config.topic, row.key, row.value
                )
            # the marker commits atomically with the data: recovery reads
            # the latest marker for this transactional id to re-baseline
            # last_committed_epoch after a restart
            self._produce_with_backpressure(
                p,
                self.config.topic + self.MARKER_TOPIC_SUFFIX,
                self.config.transactional_id,
                str(epoch),
            )
            p.commit_transaction()
        except Exception:
            try:
                p.abort_transaction()
            except Exception:
                pass  # broker may have already fenced/aborted it
            raise
        self.last_committed_epoch = epoch
        return "committed"

    def foreach_batch(self):
        """`writeStream.foreachBatch(sink.foreach_batch())`."""

        def fn(df, epoch):
            self.write_batch(df, epoch)

        return fn


def kafka_source(
    spark: SparkSession,
    config: KafkaConfig | str,
    topic: str | None = None,
    value_schema: str | None = None,
    starting_offsets: str = "latest",
) -> Stream:
    """`EventType.from(Kafka, ...)` → built-in kafka format + payload
    lowering. Accepts a KafkaConfig or (brokers, topic) for the legacy
    call shape."""
    if isinstance(config, str):
        config = KafkaConfig(brokers=config, topic=topic or "")
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(config, starting_offsets).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema is not None:
        df = parse_kafka_events(df, value_schema)
        return Stream(df, ts_col="ts")
    return Stream(df, ts_col="timestamp")
