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
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)



def _split_fields(content: str) -> list[str]:
    """Split on top-level commas, respecting nested {}/[]/() and
    double-quoted strings with backslash escapes (event_file.rs:245-287
    port — note the reference tracks only DOUBLE quotes here)."""
    fields: list[str] = []
    start = 0
    depth = 0
    in_string = False
    escape_next = False
    for i, ch in enumerate(content):
        if escape_next:
            escape_next = False
            continue
        if ch == "\\":
            escape_next = True
        elif ch == '"':
            in_string = not in_string
        elif ch in "{[(" and not in_string:
            depth += 1
        elif ch in "}])" and not in_string:
            depth -= 1
        elif ch == "," and not in_string and depth == 0:
            f = content[start:i].strip()
            if f:
                fields.append(f)
            start = i + 1
    last = content[start:].strip()
    if last:
        fields.append(last)
    return fields


def _parse_value(s: str, depth: int | None = None):
    """event_file.rs:291-372 port: bool/null/quoted string (reference
    escape rules: \\n \\t \\" \\' \\\\ known, UNKNOWN escapes kept
    verbatim, trailing backslash kept)/int/float/array; anything else —
    including `{...}` — is an unquoted string, exactly like the
    reference (it has no map branch in .evt value position)."""
    from varpulis_spark.limits import MAX_JSON_DEPTH

    if depth is None:
        depth = MAX_JSON_DEPTH
    s = s.strip()
    if s == "true":
        return True
    if s == "false":
        return False
    if s in ("null", "nil"):
        return None
    if len(s) >= 2 and (
        (s[0] == '"' and s[-1] == '"') or (s[0] == "'" and s[-1] == "'")
    ):
        inner = s[1:-1]
        if "\\" not in inner:
            return inner
        out = []
        it = iter(inner)
        for ch in it:
            if ch != "\\":
                out.append(ch)
                continue
            nxt = next(it, None)
            if nxt == "n":
                out.append("\n")
            elif nxt == "t":
                out.append("\t")
            elif nxt in ('"', "'", "\\"):
                out.append(nxt)
            elif nxt is None:
                out.append("\\")
            else:
                out.append("\\")
                out.append(nxt)
        return "".join(out)
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s.startswith("[") and s.endswith("]"):
        if depth == 0:
            raise ValueError("Array nesting too deep")
        return [
            _parse_value(item, depth - 1)
            for item in _split_fields(s[1:-1])
            if item
        ]
    return s  # unquoted identifier-like string


def _parse_u64(s: str) -> int:
    """Rust `str::parse::<u64>()`: optional leading '+', ASCII digits only —
    no sign, decimals, underscores, or unicode digits."""
    body = s[1:] if s.startswith("+") else s
    if not body or any(c not in "0123456789" for c in body):
        raise ValueError(s)
    return int(body)


def _parse_timing_prefix(line: str) -> tuple[float, str]:
    """@10s / @100ms / @2m / @100 (bare = ms) → (offset_seconds, rest).
    Raises on a missing event or non-u64 value, like the reference
    (event_file.rs:133-171) — which means NO decimals, NO negatives, and
    no 'h' unit (the reference only knows ms/s/m)."""
    body = line.lstrip("@")
    sp = next((i for i, c in enumerate(body) if c.isspace()), None)
    if sp is None:
        raise ValueError("Invalid timing prefix format")
    timing, rest = body[:sp], body[sp:].strip()
    units = (("ms", 1e-3), ("s", 1.0), ("m", 60.0))
    for suffix, mult in units:
        if timing.endswith(suffix):
            num = timing[: -len(suffix)]
            try:
                return _parse_u64(num) * mult, rest
            except ValueError:
                raise ValueError(f"Invalid timing value: {timing}") from None
    try:
        return _parse_u64(timing) * 1e-3, rest  # bare number = milliseconds
    except ValueError:
        raise ValueError(f"Invalid timing value: {timing}") from None


def _parse_jsonl_line(line: str) -> tuple[str, dict]:
    """JSONL event line: {"event_type": "X", "data": {...}}
    (event_file.rs:412-441, with the reference's field cap)."""
    from varpulis_spark.limits import MAX_EVENT_PAYLOAD_BYTES, MAX_FIELDS_PER_EVENT

    if len(line) > MAX_EVENT_PAYLOAD_BYTES:
        raise ValueError(
            f"JSONL line too large ({len(line)} bytes, max {MAX_EVENT_PAYLOAD_BYTES})"
        )
    try:
        obj = json.loads(line)
    except ValueError as e:
        raise ValueError(f"Invalid JSON: {e}") from None
    etype = obj.get("event_type")
    if not isinstance(etype, str):
        raise ValueError("Missing event_type field")
    data = obj.get("data")
    payload = {}
    if isinstance(data, dict):
        for i, (k, v) in enumerate(data.items()):
            if i >= MAX_FIELDS_PER_EVENT:
                break
            payload[k] = v
    return etype, payload


def _parse_event_line(line: str) -> tuple[str, dict]:
    """`EventType { k: v, ... }` / `EventType(v1, v2)` positional
    (event_file.rs:173-243). A bare `EventType` with neither brace nor
    paren is a hard 'Invalid event format' error, like the reference
    (event_file.rs:179-187)."""
    line = line.strip().rstrip(";")
    brace = line.find("{")
    paren = line.find("(")
    if brace >= 0 and (paren < 0 or brace < paren):
        etype, rest = line[:brace].strip(), line[brace:]
    elif paren >= 0:
        etype, rest = line[:paren].strip(), line[paren:]
    else:
        raise ValueError(f"Invalid event format: {line}")
    payload: dict = {}
    if rest.startswith("{"):
        content = rest.lstrip("{").rstrip("}").strip()
        for field in _split_fields(content):
            if not field:
                continue
            colon = field.find(":")
            if colon < 0:
                raise ValueError(f"Invalid field format: {field}")
            payload[field[:colon].strip()] = _parse_value(field[colon + 1 :])
    else:
        content = rest.lstrip("(").rstrip(")").strip()
        for i, value in enumerate(_split_fields(content)):
            if value:
                payload[f"field_{i}"] = _parse_value(value)
    return etype, payload


def parse_evt(source: str) -> list[tuple[float, str, dict]]:
    """Parse .evt text → [(offset_seconds, event_type, payload)].

    Faithful port of EventFileParser::parse (event_file.rs:84-129,
    r8 — previously a json.loads shim that silently DROPPED JSONL lines,
    bare-ms timing prefixes, and malformed lines, and crashed on
    single-quoted strings): `# / //` comments, `BATCH <ms>`, `@N[unit]`
    per-line offsets (bare number = ms, u64 only), JSONL lines,
    `Type { k: v }` / `Type(v1, v2)` events — and HARD errors with line
    numbers on anything malformed (including a bare `Type` with no
    braces/parens), matching the reference."""
    out = []
    offset = 0.0
    for line_num, raw in enumerate(source.splitlines()):
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        if line.startswith("BATCH"):
            parts = line.split()
            if len(parts) >= 2:
                try:
                    offset = _parse_u64(parts[1]) / 1000.0
                except ValueError:
                    raise ValueError(
                        f"Invalid BATCH time at line {line_num + 1}"
                    ) from None
            continue
        line_offset = offset
        if line.startswith("@"):
            line_offset, line = _parse_timing_prefix(line)
        try:
            if line.startswith("{"):
                etype, payload = _parse_jsonl_line(line)
            else:
                etype, payload = _parse_event_line(line)
        except ValueError as e:
            raise ValueError(f"Error at line {line_num + 1}: {e}") from None
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
