"""Shared spool machinery for broker connector bridges (MQTT/NATS/Kinesis).

The reference runs each connector as an async task feeding a bounded channel
into the engine (varpulis-cli main.rs:1005-1040). Spark's equivalent durable
channel is a file streaming source: a driver-side receiver thread spools
incoming messages as atomically-renamed JSON-lines files, and
`readStream.json(spool_dir)` replays them as micro-batches. Restarts resume
from the checkpoint without message loss — stronger than the reference's
in-memory channel.

Each concrete connector supplies:
- ``RECORD_SCHEMA``: DDL of the spool record (transport metadata + payload),
- ``ingest(...)``: transport-specific buffering (its callback target),
- ``_parse(df, value_schema)``: lowering of the reference's payload parser
  to Catalyst expressions over the spool DataFrame.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from varpulis_spark.stream import Stream


def iso_micros(ts: float) -> str:
    """Format an epoch-seconds float as an ISO-8601 UTC string with
    microsecond precision (the engine's events carry µs timestamps)."""
    return (
        time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime(ts))
        + f".{int(ts % 1 * 1e6):06d}Z"
    )


class SpooledSource:
    """Base for broker source bridges: thread-safe buffer + atomic flush +
    streaming/batch replay. Subclasses define RECORD_SCHEMA, ingest() (which
    calls _buffer), and _parse()."""

    RECORD_SCHEMA: str = "payload string, ts timestamp"

    def __init__(self, name: str, spool_dir: str):
        self.name = name
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._buf: list[dict] = []
        self._lock = threading.Lock()
        self._seq = 0
        # ingest-limit counters (limits.rs parity), surfaced in registry
        # health reports: dropped = whole events rejected, truncated =
        # events kept with fields/values bounded
        self.drops: dict[str, int] = {}

    def _buffer(self, record: dict) -> None:
        with self._lock:
            self._buf.append(record)

    def _count_drop(self, reason: str) -> None:
        with self._lock:
            self.drops[reason] = self.drops.get(reason, 0) + 1

    def admit(self, payload: str | bytes) -> bool:
        """Ingest-limit gate for the RAW payload (limits.rs:8): oversize
        payloads are rejected BEFORE JSON parsing, counted under
        'payload_too_large'. Connectors call this at their spool
        boundary."""
        from varpulis_spark.limits import payload_too_large

        if payload_too_large(payload):
            self._count_drop("payload_too_large")
            return False
        return True

    def flush(self) -> str | None:
        """Atomically land the buffer as one spool file (write-then-rename:
        the streaming reader never sees a partial file). One file == one
        replay micro-batch with maxFilesPerTrigger=1. Returns the path."""
        with self._lock:
            buf, self._buf = self._buf, []
            if not buf:
                return None
            self._seq += 1
            name = f"{int(time.time() * 1e6):016d}_{self._seq:06d}.jsonl"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        dst = os.path.join(self.spool_dir, name)
        with open(tmp, "w") as f:
            for rec in buf:
                f.write(json.dumps(rec) + "\n")
        os.replace(tmp, dst)
        return dst

    # -- parsing (subclass responsibility) ---------------------------------
    def _parse(self, df: DataFrame, value_schema: str) -> DataFrame:
        raise NotImplementedError

    # -- Spark wiring ------------------------------------------------------
    def stream(
        self,
        spark: SparkSession,
        value_schema: str,
        max_files_per_trigger: int | None = None,
    ) -> Stream:
        """Streaming Stream over the spool."""
        reader = spark.readStream.schema(self.RECORD_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return Stream(self._parse(reader.json(self.spool_dir), value_schema),
                      ts_col="ts")

    def batch(self, spark: SparkSession, value_schema: str) -> Stream:
        """Batch view of the spool (replay/debug)."""
        df = spark.read.schema(self.RECORD_SCHEMA).json(self.spool_dir)
        return Stream(self._parse(df, value_schema), ts_col="ts")


def parse_broker_events(
    df: DataFrame,
    value_schema: str,
    topic_col: str,
    separator: str,
    ts_col: str,
    default_type: str = "Unknown",
) -> DataFrame:
    """Lower the reference's shared broker-payload parser to Catalyst
    expressions (parse_mqtt_payload mqtt.rs:356-419; parse_nats_payload
    nats.rs:258-317 — identical shape, NATS splits subjects on '.').

    event_type precedence: payload `event_type` key, else `type`, else the
    last non-empty `separator`-delimited segment of the topic/subject, else
    `default_type`. A nested `data` OBJECT supplies the fields; otherwise
    the top-level keys do. Missing fields read as null (the reference's
    dynamic events behave the same); a malformed payload yields a row of
    nulls with the topic-derived type (kept so a DLQ can see it).
    """
    top = F.from_json(F.col("payload"), value_schema)
    nested = F.from_json(F.col("payload"), f"data struct<{value_schema}>")
    types = F.from_json(F.col("payload"), "event_type string, type string")
    seg = F.element_at(
        F.filter(F.split(F.col(topic_col), re.escape(separator), -1),
                 lambda s: s != ""),
        -1,
    )
    event_type = F.coalesce(
        types.getField("event_type"), types.getField("type"), seg,
        F.lit(default_type),
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
        F.col(ts_col).alias("ts"), event_type.alias("event_type"), *cols
    )
