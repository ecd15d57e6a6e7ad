"""NATS connector bridge (connector/nats.rs:21-57 NatsConfig,
:73-170 NatsSource, :173-239 NatsSink, :258-317 parse_nats_payload).

Same bridge shape as the MQTT connector (sources/mqtt.py): a driver-side
subscriber spools messages to JSON-lines files; a file streaming source
replays the spool as micro-batches. The nats-py network client is NOT
installed in this container: `connect` is import-gated with a clear error,
and everything else — payload-parsing parity, spool atomicity, Stream
wiring, sink batching — is real and tested through `ingest()` / an
injected fake client.

Reference parity notes:
- subjects split on '.' (nats.rs:270-274), unlike MQTT's '/';
- `queue_group` → broker-side load balancing via queue_subscribe
  (nats.rs:101-107); recorded and applied on connect;
- oversized payloads (> 1 MiB, limits.rs MAX_EVENT_PAYLOAD_BYTES) are
  skipped with a warning, not spooled (nats.rs:127-133);
- auth: username/password or token (nats.rs:242-251).
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass
from typing import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from varpulis_spark.sources.spool import (
    SpooledSource,
    iso_micros,
    parse_broker_events,
)

MAX_EVENT_PAYLOAD_BYTES = 1_048_576  # limits.rs:8


@dataclass
class NatsConfig:
    """Mirror of NatsConfig (nats.rs:21-57): servers/subject/queue_group/
    credentials/token, builder-style via keyword args."""

    servers: str
    subject: str
    queue_group: str | None = None
    username: str | None = None
    password: str | None = None
    token: str | None = None


def parse_nats_events(df: DataFrame, value_schema: str) -> DataFrame:
    """parse_nats_payload (nats.rs:258-317) lowered to Catalyst: same
    event_type/data precedence as MQTT, subject segments split on '.'."""
    return parse_broker_events(
        df, value_schema, topic_col="subject", separator=".", ts_col="nats_ts"
    )


class NatsSource(SpooledSource):
    """NatsSource (nats.rs:73-170): subscribe → parse → feed the engine.

    `ingest()` is the transport-independent entry (the nats-py message
    callback routes here; tests and fake clients call it directly)."""

    RECORD_SCHEMA = "subject string, payload string, nats_ts timestamp"

    def __init__(self, name: str, config: NatsConfig, spool_dir: str):
        super().__init__(name, spool_dir)
        self.config = config
        self._client = None
        self.skipped_oversize = 0

    # -- transport ---------------------------------------------------------
    def connect(self, flush_every: int = 100):
        """Start the network client (requires nats-py; import-gated).

        nats-py is asyncio-based; the subscription loop runs on a daemon
        thread with its own event loop, routing messages to ingest() —
        the same shape as the reference's spawned receive task
        (nats.rs:121-156)."""
        try:
            import nats  # noqa: F401, PLC0415
        except ImportError as e:  # pragma: no cover - env-blocked
            raise ImportError(
                "NATS transport needs the 'nats-py' package (not present in "
                "this environment). The spool/parse/stream plumbing is fully "
                "functional via ingest(); plug any client into it."
            ) from e

        import asyncio  # noqa: PLC0415
        import threading  # noqa: PLC0415

        async def _run():  # pragma: no cover - needs a server
            opts = {}
            if self.config.username:  # nats.rs:244-246
                opts["user"] = self.config.username
                opts["password"] = self.config.password
            if self.config.token:  # nats.rs:247-249
                opts["token"] = self.config.token
            nc = await nats.connect(self.config.servers, **opts)
            self._client = nc

            async def on_message(msg):
                self.ingest(msg.subject, msg.data.decode("utf-8", "replace"))
                if len(self._buf) >= flush_every:
                    self.flush()

            if self.config.queue_group:  # nats.rs:101-107
                await nc.subscribe(
                    self.config.subject, queue=self.config.queue_group,
                    cb=on_message,
                )
            else:
                await nc.subscribe(self.config.subject, cb=on_message)
            while self._running:
                await asyncio.sleep(0.1)
            await nc.drain()

        self._running = True
        self._thread = threading.Thread(
            target=lambda: asyncio.run(_run()), daemon=True
        )
        self._thread.start()  # pragma: no cover - needs a server
        return self

    def stop(self) -> None:
        """Signal the receive loop to drain and exit (nats.rs:161-165)."""
        self._running = False

    # -- spool -------------------------------------------------------------
    def ingest(self, subject: str, payload: str, ts: float | None = None) -> None:
        """Buffer one message (arrival-stamped). Oversized payloads are
        skipped with a warning (nats.rs:127-133)."""
        if not self.admit(payload):
            self.skipped_oversize += 1
            warnings.warn(
                f"NATS source {self.name}: payload too large "
                f"(> {MAX_EVENT_PAYLOAD_BYTES} bytes), skipped"
            )
            return
        t = ts if ts is not None else time.time()
        self._buffer(
            {"subject": subject, "payload": payload, "nats_ts": iso_micros(t)}
        )

    def _parse(self, df: DataFrame, value_schema: str) -> DataFrame:
        return parse_nats_events(df, value_schema)


class NatsSink:
    """NatsSink (nats.rs:173-239): publish each event as JSON to the
    configured subject.

    `client` (test/driver mode): any object with publish(subject, payload);
    rows iterate on the driver. `client_factory` (production mode): called
    once per PARTITION on the executors — no driver bottleneck, clients
    never serialized."""

    def __init__(
        self,
        name: str,
        config: NatsConfig,
        client=None,
        client_factory: Callable[[], object] | None = None,
    ):
        self.name = name
        self.config = config
        self._client = client
        self._factory = client_factory

    def write_batch(self, df: DataFrame, epoch: int) -> None:
        """foreachBatch callback (compose with resilient_sink_fn for
        circuit-breaker + DLQ protection, sink.rs:489-620)."""
        subject = self.config.subject
        payloads = df.select(F.to_json(F.struct(*df.columns)).alias("p"))
        if self._factory is not None:
            factory = self._factory

            def publish_partition(rows: Iterable) -> None:
                client = factory()
                for r in rows:
                    client.publish(subject, r.p)

            payloads.foreachPartition(publish_partition)
            return
        client = self._client
        if client is None:
            raise ValueError("NatsSink needs a client or client_factory")
        for r in payloads.toLocalIterator():
            client.publish(subject, r.p)
