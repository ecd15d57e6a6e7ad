"""MQTT connector — the reference's default I/O path
(connector/mqtt.rs:21-126 MqttConfig/MqttSource, :243-332 MqttSink,
:356-419 parse_mqtt_payload).

Spark has no DSv2 MQTT source, so the idiomatic bridge is:

- SOURCE: a driver-side subscriber thread spools incoming messages as
  atomically-renamed JSON-lines files; a file streaming source replays the
  spool as micro-batches (exactly the shape of the reference's
  connector-task → bounded-channel → engine feed, varpulis-cli
  main.rs:1005-1040, with the spool as the durable channel — restarts
  resume from the checkpoint without message loss). The spool machinery is
  shared with the NATS/Kinesis bridges (sources/spool.py).
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

import time
import uuid
from dataclasses import dataclass
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from varpulis_spark.sources.spool import (
    SpooledSource,
    iso_micros,
    parse_broker_events,
)

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
    over a spool DataFrame (topic, payload, mqtt_ts). Topic segments split
    on '/'; see parse_broker_events for the shared precedence rules."""
    return parse_broker_events(
        df, value_schema, topic_col="topic", separator="/", ts_col="mqtt_ts"
    )


class MqttSource(SpooledSource):
    """MqttSource (mqtt.rs:88-241): subscribe → parse → feed the engine.

    `ingest()` is the transport-independent entry (the paho on_message
    callback routes here; tests and fake clients call it directly);
    `flush()` atomically lands the buffered messages as one spool file ==
    one replay micro-batch."""

    RECORD_SCHEMA = SPOOL_SCHEMA

    def __init__(self, name: str, config: MqttConfig, spool_dir: str):
        super().__init__(name, spool_dir)
        self.config = config
        self._client = None
        self._topics = [config.topic]

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
        """Buffer one message (arrival-stamped). Oversized payloads are
        rejected and counted (limits.rs MAX_EVENT_PAYLOAD_BYTES — the
        reference enforces it in every connector's receive loop)."""
        if not self.admit(payload):
            return
        t = ts if ts is not None else time.time()
        self._buffer({"topic": topic, "payload": payload, "mqtt_ts": iso_micros(t)})

    def _parse(self, df: DataFrame, value_schema: str) -> DataFrame:
        return parse_mqtt_events(df, value_schema)


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
