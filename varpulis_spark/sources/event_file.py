"""`.evt` event-file replay source (Apama-style).

Reference: crates/varpulis-runtime/src/event_file.rs:1-26 — `# / //`
comments, `EventType { key: value, ... }` lines, `BATCH <ms>` offsets from
start (and `@5s`-style per-event offsets). The reference replays with real
timing into the engine; the batch analog materializes the SAME events as a
DataFrame whose `ts` carries the offsets from a fixed epoch, so window /
within semantics see identical times (TESTDATA.md timing conventions).

Driver-side parsing is deliberate: .evt files are test/replay fixtures
(KBs), not data-plane inputs.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_EVENT_RE = re.compile(r"^(\w+)\s*\{(.*)\}\s*$")
_BATCH_RE = re.compile(r"^BATCH\s+(\d+)\s*$")
_AT_RE = re.compile(r"^@(\d+(?:\.\d+)?)(ms|s|m|h)\s+(.*)$")
_KEY_RE = re.compile(r"([{,]\s*)(\w+)\s*:")
_AT_UNITS = {"ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_evt(source: str) -> list[tuple[float, str, dict]]:
    """Parse .evt text → [(offset_seconds, event_type, payload)]."""
    out = []
    offset = 0.0
    for raw in source.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        m = _BATCH_RE.match(line)
        if m:
            offset = int(m.group(1)) / 1000.0
            continue
        line_offset = offset
        m = _AT_RE.match(line)
        if m:
            line_offset = float(m.group(1)) * _AT_UNITS[m.group(2)]
            line = m.group(3).strip()
        m = _EVENT_RE.match(line)
        if not m:
            continue
        etype, body = m.group(1), m.group(2).strip()
        payload = {}
        if body:
            quoted = _KEY_RE.sub(r'\1"\2":', "{" + body + "}")
            payload = json.loads(quoted)
        out.append((line_offset, etype, payload))
    return out


def load_evt(spark: SparkSession, path_or_source: str, ts_col: str = "ts") -> DataFrame:
    """Load an .evt file (path or literal source) as a batch DataFrame.

    Columns: event_id (arrival order), ts, event_type, plus the union of all
    payload fields (missing → null). Payload types are inferred per field:
    all-int → long, numeric → double, else string.
    """
    src = path_or_source
    if "\n" not in src and src.endswith(".evt"):
        with open(src) as f:
            src = f.read()
    events = parse_evt(src)
    return events_to_df(spark, events, ts_col)


def events_to_df(
    spark: SparkSession, events: list, ts_col: str = "ts"
) -> DataFrame:
    """(seconds_offset, event_type, payload_dict) triples → batch DataFrame
    with per-field type inference (shared by the .evt replayer and the REST
    injection endpoint)."""
    # payload keys may collide with the envelope (event_id/ts/event_type) —
    # e.g. financial_markets.evt carries a `ts` field; suffix them.
    reserved = {"event_id", ts_col, "event_type"}
    events = [
        (off, t, {(f"{k}_payload" if k in reserved else k): v for k, v in p.items()})
        for off, t, p in events
    ]
    fields: dict[str, str] = {}
    for _off, _t, payload in events:
        for k, v in payload.items():
            cur = fields.get(k)
            if isinstance(v, bool):
                t = "boolean"
            elif isinstance(v, int):
                t = "long"
            elif isinstance(v, float):
                t = "double"
            else:
                t = "string"
            if cur is None or cur == t:
                fields[k] = t
            elif {cur, t} == {"long", "double"}:
                fields[k] = "double"
            else:
                fields[k] = "string"
    names = sorted(fields)
    rows = []
    for i, (off, etype, payload) in enumerate(events):
        row = [i, EPOCH + timedelta(seconds=off), etype]
        for n in names:
            v = payload.get(n)
            if v is not None:
                if fields[n] == "double":
                    v = float(v)
                elif fields[n] == "string" and not isinstance(v, str):
                    v = str(v)
            row.append(v)
        rows.append(tuple(row))
    schema = f"event_id long, {ts_col} timestamp, event_type string"
    for n in names:
        schema += f", {n} {fields[n]}"
    return spark.createDataFrame(rows, schema)
