"""Event type declarations → Spark StructType.

The reference keeps event declarations advisory (reference:
crates/varpulis-runtime/src/engine/mod.rs:364-369 only logs them; runtime
stays dynamically typed). Here declarations are load-bearing: an EventSchema
becomes a real StructType so Catalyst gets concrete column types, column
pruning, and codegen. Undeclared payloads fall back to a generic envelope
(event_type, ts, plus a JSON `props` string), matching the driver's `events`
table shape.

Type mapping (reference crates/varpulis-core/src/types.rs:8-41):
  int → LongType, float → DoubleType, bool → BooleanType, str → StringType,
  timestamp(ns) → TimestampType (µs precision — documented divergence),
  duration(ns) → LongType nanoseconds, [T] → ArrayType, {K:V} → MapType,
  T? → nullable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "int": T.LongType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "duration": T.LongType(),  # nanoseconds, like reference Value::Duration
    "binary": T.BinaryType(),
}


def parse_type(spec: str | T.DataType) -> T.DataType:
    """Parse a VPL-ish type spec ('int', '[float]', '{str:int}') to Spark."""
    if isinstance(spec, T.DataType):
        return spec
    s = spec.strip()
    if s.endswith("?"):
        return parse_type(s[:-1])  # nullability handled at the field level
    if s.startswith("[") and s.endswith("]"):
        return T.ArrayType(parse_type(s[1:-1]))
    if s.startswith("{") and s.endswith("}"):
        k, _, v = s[1:-1].partition(":")
        return T.MapType(parse_type(k), parse_type(v))
    if s in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[s]
    raise ValueError(f"unknown type spec: {spec!r}")


@dataclass
class EventSchema:
    """A named event type with typed payload fields.

    Mirrors reference Stmt::EventDecl (crates/varpulis-core/src/ast.rs:29-34)
    including single inheritance via `extends`.
    """

    name: str
    fields: dict[str, str | T.DataType] = field(default_factory=dict)
    extends: "EventSchema | None" = None

    def struct_type(self, include_envelope: bool = True) -> T.StructType:
        out: list[T.StructField] = []
        if include_envelope:
            out.append(T.StructField("event_type", T.StringType(), False))
            out.append(T.StructField("ts", T.TimestampType(), False))
        seen = {f.name for f in out}
        for schema in self._mro():
            for fname, ftype in schema.fields.items():
                if fname in seen:
                    continue
                seen.add(fname)
                nullable = isinstance(ftype, str) and ftype.strip().endswith("?")
                out.append(T.StructField(fname, parse_type(ftype), nullable))
        return T.StructType(out)

    def _mro(self) -> list["EventSchema"]:
        chain: list[EventSchema] = []
        cur: EventSchema | None = self
        while cur is not None:
            chain.append(cur)
            cur = cur.extends
        return list(reversed(chain))  # base fields first


GENERIC_EVENT = EventSchema(
    "Event",
    {"event_id": "int", "user_id": "int", "value": "float", "props": "str"},
)


class SchemaRegistry:
    """Registry of declared event types (like the engine's event_types map)."""

    def __init__(self) -> None:
        self._schemas: dict[str, EventSchema] = {}

    def declare(self, name: str, extends: str | None = None, **fields: str) -> EventSchema:
        parent = self._schemas[extends] if extends else None
        schema = EventSchema(name, dict(fields), parent)
        self._schemas[name] = schema
        return schema

    def get(self, name: str) -> EventSchema:
        return self._schemas.get(name, GENERIC_EVENT)

    def __contains__(self, name: str) -> bool:
        return name in self._schemas
