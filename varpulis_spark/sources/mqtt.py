"""MQTT connector — the reference's default I/O path
(connector/mqtt.rs:21-126 MqttConfig/MqttSource, :243-332 MqttSink,
:356-419 parse_mqtt_payload).

Spark has no DSv2 MQTT source, so the idiomatic bridge is:

- SOURCE: a driver-side subscriber thread spools incoming messages as
  atomically-renamed JSON-lines files; a file streaming source replays the
  spool as micro-batches (exactly the shape of the reference's
  connector-task → bounded-channel → engine feed, varpulis-cli
  main.rs:1005-1040, with the spool as the durable channel — restarts
  resume from the checkpoint without message loss).
- SINK: a foreachBatch callback publishing each row as JSON. Production
  path: a per-partition client factory (executor-side fan-out, no driver
  bottleneck); test path: one injected client, rows iterated on the driver.

The paho-mqtt network client is NOT installed in this container: `connect`
is import-gated with a clear error, and everything else — payload-parsing
parity, spool atomicity, Stream wiring, sink batching — is real and tested
through `ingest()` / an injected fake client.

Payload parsing parity (parse_mqtt_payload, mqtt.rs:356-419):
- event_type: payload `event_type` key, else `type`, else the last
  non-empty topic segment, else 'Unknown'
- a nested `data` OBJECT supplies the fields; otherwise the top-level keys
  (minus the type keys) do
- arrival time is stamped at ingest (the engine's dynamic events always
  carry ts)
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from varpulis_spark.stream import Stream

SPOOL_SCHEMA = "topic string, payload string, mqtt_ts timestamp"


@dataclass
class MqttConfig:
    """Mirror of MqttConfig (mqtt.rs:21-66): broker/topic/client_id/
    credentials/qos, builder-style."""

    broker: str
    topic: str
    port: int = 1883
    client_id: str | None = None
    username: str | None = None
    password: str | None = None
    qos: int = 0
    keep_alive_s: int = 60

    def __post_init__(self):
        self.qos = min(max(self.qos, 0), 2)  # with_qos clamps (mqtt.rs:60-62)


def parse_mqtt_events(df: DataFrame, value_schema: str) -> DataFrame:
    """Lower parse_mqtt_payload (mqtt.rs:356-419) to Catalyst expressions
    over a spool DataFrame (topic, payload, mqtt_ts).

    `value_schema` is the DDL of the event fields (this engine is typed;
    the reference's dynamic events read missing fields as null — from_json
    does the same). Emits event_type + ts + the schema fields; a nested
    `data` object wins over top-level fields, and a malformed payload
    yields a row of nulls with the topic-derived type (the reference drops
    it — kept here so the DLQ can see it)."""
    top = F.from_json(F.col("payload"), value_schema)
    nested = F.from_json(F.col("payload"), f"data struct<{value_schema}>")
    types = F.from_json(F.col("payload"), "event_type string, type string")
    seg = F.element_at(F.filter(F.split(F.col("topic"), "/"), lambda s: s != ""), -1)
    event_type = F.coalesce(
        types.getField("event_type"), types.getField("type"), seg, F.lit("Unknown")
    )
    from pyspark.sql.types import StructType

    field_names = [f.name for f in StructType.fromDDL(value_schema).fields]
    has_data = nested.getField("data").isNotNull()
    cols = [
        F.when(has_data, nested.getField("data").getField(n))
        .otherwise(top.getField(n))
        .alias(n)
        for n in field_names
    ]
    return df.select(
        F.col("mqtt_ts").alias("ts"), event_type.alias("event_type"), *cols
    )


class MqttSource:
    """MqttSource (mqtt.rs:88-241): subscribe → parse → feed the engine.

    `ingest()` is the transport-independent entry (the paho on_message
    callback routes here; tests and fake clients call it directly);
    `flush()` atomically lands the buffered messages as one spool file ==
    one replay micro-batch."""

    def __init__(self, name: str, config: MqttConfig, spool_dir: str):
        self.name = name
        self.config = config
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._buf: list[tuple[str, str, float]] = []
        self._lock = threading.Lock()
        self._client = None
        self._topics = [config.topic]
        self._seq = 0

    # -- transport ---------------------------------------------------------
    def connect(self, flush_every: int = 100):
        """Start the network client (requires paho-mqtt; import-gated)."""
        try:
            import paho.mqtt.client as mqtt  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env-blocked
            raise ImportError(
                "MQTT transport needs the 'paho-mqtt' package (not present "
                "in this environment). The spool/parse/stream plumbing is "
                "fully functional via ingest(); plug any client into it."
            ) from e
        cid = self.config.client_id or f"varpulis-{self.name}-{uuid.uuid4().hex[:8]}"
        client = mqtt.Client(client_id=cid)
        if self.config.username:
            client.username_pw_set(self.config.username, self.config.password)

        def on_message(_c, _u, msg):  # pragma: no cover - needs broker
            self.ingest(msg.topic, msg.payload.decode("utf-8", "replace"))
            if len(self._buf) >= flush_every:
                self.flush()

        client.on_message = on_message
        client.connect(self.config.broker, self.config.port, self.config.keep_alive_s)
        for t in self._topics:
            client.subscribe(t, self.config.qos)
        client.loop_start()
        self._client = client
        return self

    def subscribe(self, topic: str) -> None:
        """Additional topic on the existing connection (mqtt.rs:110-123)."""
        self._topics.append(topic)
        if self._client is not None:  # pragma: no cover - needs broker
            self._client.subscribe(topic, self.config.qos)

    # -- spool -------------------------------------------------------------
    def ingest(self, topic: str, payload: str, ts: float | None = None) -> None:
        """Buffer one message (arrival-stamped)."""
        with self._lock:
            self._buf.append((topic, payload, ts if ts is not None else time.time()))

    def flush(self) -> str | None:
        """Atomically land the buffer as one spool file (write-then-rename:
        the streaming reader never sees a partial file). Returns the path."""
        with self._lock:
            buf, self._buf = self._buf, []
            if not buf:
                return None
            self._seq += 1
            name = f"{int(time.time() * 1e6):016d}_{self._seq:06d}.jsonl"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        dst = os.path.join(self.spool_dir, name)
        with open(tmp, "w") as f:
            for topic, payload, ts in buf:
                f.write(json.dumps({
                    "topic": topic,
                    "payload": payload,
                    "mqtt_ts": time.strftime(
                        "%Y-%m-%dT%H:%M:%S", time.gmtime(ts)
                    ) + f".{int(ts % 1 * 1e6):06d}Z",
                }) + "\n")
        os.replace(tmp, dst)
        return dst

    # -- Spark wiring ------------------------------------------------------
    def stream(
        self, spark: SparkSession, value_schema: str,
        max_files_per_trigger: int | None = None,
    ) -> Stream:
        """Streaming Stream over the spool (one file == one micro-batch
        with max_files_per_trigger=1)."""
        reader = spark.readStream.schema(SPOOL_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        df = reader.json(self.spool_dir)
        return Stream(parse_mqtt_events(df, value_schema), ts_col="ts")

    def batch(self, spark: SparkSession, value_schema: str) -> Stream:
        """Batch view of the spool (replay/debug)."""
        df = spark.read.schema(SPOOL_SCHEMA).json(self.spool_dir)
        return Stream(parse_mqtt_events(df, value_schema), ts_col="ts")


class MqttSink:
    """MqttSink (mqtt.rs:243-332): publish each event as JSON.

    `client` (test/driver mode): any object with
    publish(topic, payload, qos); rows iterate on the driver.
    `client_factory` (production mode): called once per PARTITION on the
    executors — no driver bottleneck, clients never serialized."""

    def __init__(
        self,
        name: str,
        config: MqttConfig,
        client=None,
        client_factory: Callable[[], object] | None = None,
    ):
        self.name = name
        self.config = config
        self._client = client
        self._factory = client_factory

    def write_batch(self, df: DataFrame, epoch: int) -> None:
        """foreachBatch callback (compose with resilient_sink_fn for
        circuit-breaker + DLQ protection)."""
        topic, qos = self.config.topic, self.config.qos
        payloads = df.select(
            F.to_json(F.struct(*df.columns)).alias("p")
        )
        if self._factory is not None:
            factory = self._factory

            def publish_partition(rows: Iterable) -> None:
                client = factory()
                for r in rows:
                    client.publish(topic, r.p, qos)

            payloads.foreachPartition(publish_partition)
            return
        client = self._client
        if client is None:
            raise ValueError("MqttSink needs a client or client_factory")
        for r in payloads.toLocalIterator():
            client.publish(topic, r.p, qos)
