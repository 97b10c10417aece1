"""Canonical textual Arrow type vocabulary -> Spark DataType.

Re-expresses the reference's type-string parser (vocabulary per
`crates/cdf-kernel/src/arrow_type.rs:15-96`): primitives, temporal,
decimal128/256, and nested list/struct/map forms. Where Spark has no
exact physical equivalent (unsigned ints, float16, sub-microsecond
timestamps, time types) we widen and record a
:class:`TypeMappingFidelity` — mirroring the reference's
`TypeMappingFidelity` (`crates/cdf-kernel/src/lib.rs:86`) so lossy
mappings are evidence, not silent.

Grammar (case-insensitive, whitespace-tolerant):
    primitive   := string|utf8|json|large_utf8|boolean|bool
                 | int8|int16|int32|int64|uint8|uint16|uint32|uint64
                 | float16|float32|float64|binary|large_binary
    temporal    := date32|date64|date(unit)|time32(unit)|time64(unit)
                 | timestamp(unit[,tz])|duration(unit)
    decimal     := decimal128(p,s)|decimal256(p,s)|decimal(p,s)
    nested      := list<T>|large_list<T>|struct<name: T, ...>|map<K,V>
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class TypeMappingFidelity:
    """One recorded lossy/widening step in a type mapping."""

    source_type: str
    target_type: str
    kind: str  # widened | truncated | promoted | emulated
    note: str = ""


@dataclass
class MappedType:
    """Result of mapping a canonical type string to Spark."""

    spark_type: T.DataType
    canonical: str
    fidelity: list[TypeMappingFidelity] = field(default_factory=list)

    @property
    def exact(self) -> bool:
        return not self.fidelity


class TypeParseError(ValueError):
    pass


_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "utf8": T.StringType(),
    "json": T.StringType(),
    "large_utf8": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "binary": T.BinaryType(),
    "large_binary": T.BinaryType(),
    "date32": T.DateType(),
    "date64": T.DateType(),
    "null": T.NullType(),
}

# Unsigned widening: each unsigned fits losslessly in the next signed
# width; uint64 needs decimal(20,0). Recorded as `widened` fidelity.
_UNSIGNED: dict[str, T.DataType] = {
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
}

# Storage-level canonicalization: aliases that share a Spark physical
# type fingerprint identically (json-ness etc. lives in the semantic
# layer, not the storage type).
_CANON_NAME = {
    "string": "utf8",
    "json": "utf8",
    "large_utf8": "utf8",
    "bool": "boolean",
    "large_binary": "binary",
    "date64": "date32",
}

_TIME_UNITS = {"s", "ms", "us", "ns", "second", "millisecond", "microsecond", "nanosecond"}


def _canon_unit(unit: str) -> str:
    unit = unit.strip().lower()
    aliases = {"second": "s", "millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}
    unit = aliases.get(unit, unit)
    if unit not in {"s", "ms", "us", "ns"}:
        raise TypeParseError(f"unknown temporal unit: {unit!r}")
    return unit


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at angle/paren nesting depth 0."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_arrow_type(text: str) -> MappedType:
    """Parse a canonical type string to a :class:`MappedType`."""
    s = text.strip()
    low = s.lower()

    if low in _PRIMITIVES:
        return MappedType(_PRIMITIVES[low], _CANON_NAME.get(low, low))

    if low in _UNSIGNED:
        target = _UNSIGNED[low]
        return MappedType(
            target,
            low,
            [TypeMappingFidelity(low, target.simpleString(), "widened", "unsigned widened to next signed width")],
        )

    if low == "float16":
        return MappedType(
            T.FloatType(),
            low,
            [TypeMappingFidelity("float16", "float", "promoted", "no half-precision in Spark")],
        )

    m = re.fullmatch(r"decimal(?:128)?\s*\(\s*(\d+)\s*,\s*(-?\d+)\s*\)", low)
    if m:
        p, sc = int(m.group(1)), int(m.group(2))
        if not (1 <= p <= 38):
            raise TypeParseError(f"decimal128 precision out of range: {p}")
        return MappedType(T.DecimalType(p, sc), f"decimal128({p},{sc})")

    m = re.fullmatch(r"decimal256\s*\(\s*(\d+)\s*,\s*(-?\d+)\s*\)", low)
    if m:
        p, sc = int(m.group(1)), int(m.group(2))
        if p <= 38:
            return MappedType(T.DecimalType(p, sc), f"decimal256({p},{sc})")
        # Spark decimals cap at 38 digits; record truncation.
        return MappedType(
            T.DecimalType(38, min(sc, 38)),
            f"decimal256({p},{sc})",
            [TypeMappingFidelity(f"decimal256({p},{sc})", f"decimal(38,{min(sc, 38)})", "truncated", "precision capped at 38")],
        )

    m = re.fullmatch(r"date\s*\(\s*(\w+)\s*\)", low)
    if m:
        return MappedType(T.DateType(), "date32")

    m = re.fullmatch(r"timestamp\s*\(\s*(\w+)\s*(?:,\s*([^)]+))?\)", low)
    if m:
        unit = _canon_unit(m.group(1))
        tz = (m.group(2) or "").strip().strip("'\"")
        fid: list[TypeMappingFidelity] = []
        canonical = f"timestamp({unit}{', ' + tz if tz else ''})"
        if unit == "ns":
            fid.append(TypeMappingFidelity(canonical, "timestamp", "truncated", "ns truncated to us"))
        spark_t: T.DataType = T.TimestampType() if tz else T.TimestampNTZType()
        return MappedType(spark_t, canonical, fid)

    m = re.fullmatch(r"time(?:32|64)\s*\(\s*(\w+)\s*\)", low)
    if m:
        unit = _canon_unit(m.group(1))
        canonical = f"time({unit})"
        # No native time-of-day type: emulate as long-since-midnight with
        # a semantic marker (SURVEY fixture 3: `c_time`).
        return MappedType(
            T.LongType(),
            canonical,
            [TypeMappingFidelity(canonical, "bigint", "emulated", "time-of-day stored as units since midnight")],
        )

    m = re.fullmatch(r"duration\s*\(\s*(\w+)\s*\)", low)
    if m:
        unit = _canon_unit(m.group(1))
        return MappedType(
            T.DayTimeIntervalType(),
            f"duration({unit})",
            [] if unit == "us" else [TypeMappingFidelity(f"duration({unit})", "interval day to second", "truncated", "stored at microsecond resolution")],
        )

    m = re.fullmatch(r"(large_)?list\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        inner = parse_arrow_type(m.group(2))
        return MappedType(T.ArrayType(inner.spark_type, True), f"list<{inner.canonical}>", inner.fidelity)

    m = re.fullmatch(r"struct\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        fields: list[T.StructField] = []
        fid: list[TypeMappingFidelity] = []
        canon_parts: list[str] = []
        for part in _split_top_level(m.group(1)):
            if ":" not in part:
                raise TypeParseError(f"struct field missing ':': {part!r}")
            name, _, ftype = part.partition(":")
            mapped = parse_arrow_type(ftype)
            fields.append(T.StructField(name.strip(), mapped.spark_type, True))
            fid.extend(mapped.fidelity)
            canon_parts.append(f"{name.strip()}: {mapped.canonical}")
        return MappedType(T.StructType(fields), f"struct<{', '.join(canon_parts)}>", fid)

    m = re.fullmatch(r"map\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        parts = _split_top_level(m.group(1))
        if len(parts) != 2:
            raise TypeParseError(f"map needs exactly <K, V>: {text!r}")
        k, v = parse_arrow_type(parts[0]), parse_arrow_type(parts[1])
        return MappedType(
            T.MapType(k.spark_type, v.spark_type, True),
            f"map<{k.canonical}, {v.canonical}>",
            k.fidelity + v.fidelity,
        )

    # union -> struct-with-tag emulation (SURVEY §1.2 gap decision).
    m = re.fullmatch(r"union\s*<(.+)>", s, re.IGNORECASE | re.DOTALL)
    if m:
        variants = [parse_arrow_type(p) for p in _split_top_level(m.group(1))]
        fields = [T.StructField("_tag", T.IntegerType(), False)]
        fields += [T.StructField(f"_{i}", mt.spark_type, True) for i, mt in enumerate(variants)]
        canonical = f"union<{', '.join(mt.canonical for mt in variants)}>"
        fid = [TypeMappingFidelity(canonical, "struct", "emulated", "union as tagged struct")]
        for mt in variants:
            fid.extend(mt.fidelity)
        return MappedType(T.StructType(fields), canonical, fid)

    raise TypeParseError(f"unknown canonical type: {text!r}")


def spark_to_canonical(dt: T.DataType) -> str:
    """Inverse mapping (canonicalization of a Spark type) for fingerprints."""
    if isinstance(dt, T.StringType):
        return "utf8"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date32"
    if isinstance(dt, T.TimestampType):
        return "timestamp(us, UTC)"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp(us)"
    if isinstance(dt, T.DecimalType):
        return f"decimal128({dt.precision},{dt.scale})"
    if isinstance(dt, T.DayTimeIntervalType):
        return "duration(us)"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_to_canonical(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_canonical(dt.keyType)}, {spark_to_canonical(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name}: {spark_to_canonical(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    raise TypeParseError(f"no canonical form for Spark type {dt!r}")
