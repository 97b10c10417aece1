"""Avro Object Container File support without jars or external libs.

The reference ships a native Avro format driver
(`crates/cdf-format-avro/`); this image has neither the spark-avro jar
nor fastavro, so this module implements the parts of the PUBLIC Avro
1.11 specification the engine needs:

- binary encoding: zigzag-varint longs, length-prefixed bytes/strings,
  IEEE little-endian float/double, records/arrays/maps/unions/enums/
  fixed (spec "Binary Encoding");
- object container files: magic ``Obj\\x01``, metadata map carrying
  ``avro.schema``/``avro.codec``, sync-marker-delimited blocks, null
  and deflate (raw zlib) codecs (spec "Object Container Files");
- logical types date / timestamp-millis / timestamp-micros / decimal
  (bytes), mapped to Spark DateType / TimestampType / DecimalType.

Execution shape (scale-first): ``read_avro`` lists files into Spark's
``binaryFile`` source, so each container file decodes ON AN EXECUTOR
inside ``mapInPandas`` — per-file parallelism, the same unit the
reference's driver uses. The driver reads only one file header to
derive the Spark schema. Python-side decode is the honest cost of
jar-free Avro; with the spark-avro jar on the classpath,
``formats.require_format`` unlocks the JVM reader instead.

Writing (for round-trips and tests) is driver-side via ``write_avro``
over an Arrow table / pandas frame.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives

def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint (spec: int/long encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven decode/encode

class AvroTypeError(ValueError):
    pass


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte size (skippable form)
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
            return out
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # {"type": "long", "logicalType": ...}
    # primitive names
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise AvroTypeError(f"unsupported avro type {schema!r}")


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                _write_long(out, i)
                return
            if value is not None and bt != "null":
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise AvroTypeError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            out.write(value)
            return
        return _encode(t, value, out)
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.write(struct.pack("<f", value))
        return
    if schema == "double":
        out.write(struct.pack("<d", value))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(value))
        return
    if schema == "string":
        _write_bytes(out, value.encode("utf-8"))
        return
    raise AvroTypeError(f"unsupported avro type {schema!r}")


# ---------------------------------------------------------------------------
# container files

def read_header(raw: bytes) -> tuple[dict, str, bytes, int]:
    """-> (schema, codec, sync_marker, offset_of_first_block)."""
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise AvroTypeError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroTypeError(f"unsupported avro codec {codec!r} (null/deflate only)")
    return schema, codec, sync, buf.tell()


def decode_container(raw: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file -> (schema, rows)."""
    schema, codec, sync, off = read_header(raw)
    buf = io.BytesIO(raw)
    buf.seek(off)
    rows: list[dict] = []
    while buf.tell() < len(raw):
        n_rows = _read_long(buf)
        n_bytes = _read_long(buf)
        block = buf.read(n_bytes)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        bbuf = io.BytesIO(block)
        for _ in range(n_rows):
            rows.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise AvroTypeError("sync marker mismatch (corrupt block)")
    return schema, rows


def write_container(schema: dict, rows: list[dict], codec: str = "deflate") -> bytes:
    import os as _os

    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = _os.urandom(16)
    out.write(sync)

    body = io.BytesIO()
    for r in rows:
        _encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    _write_long(out, len(rows))
    _write_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark integration

_PRIMITIVE_SPARK = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _spark_type(schema):
    from pyspark.sql import types as T

    if isinstance(schema, list):  # union: nullable over the non-null branch
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise AvroTypeError("only 2-branch [null, X] unions map to Spark")
        return _spark_type(non_null[0])
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampNTZType()
        if lt == "decimal":
            return T.DecimalType(schema["precision"], schema.get("scale", 0))
        t = schema["type"]
        if t == "record":
            return T.StructType(
                [T.StructField(f["name"], _spark_type(f["type"]), True) for f in schema["fields"]]
            )
        if t == "array":
            return T.ArrayType(_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), _spark_type(schema["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return _spark_type(t)
    from pyspark.sql.types import _parse_datatype_string

    if schema in _PRIMITIVE_SPARK:
        return _parse_datatype_string(_PRIMITIVE_SPARK[schema])
    raise AvroTypeError(f"unsupported avro type {schema!r}")


def _logical_converter(schema):
    """Row-value converter for logical types (decode side)."""
    import datetime
    import decimal as _dec

    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        inner = _logical_converter(non_null[0])
        return (lambda v: None if v is None else inner(v)) if inner else None
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return lambda d: datetime.date(1970, 1, 1) + datetime.timedelta(days=d)
        if lt == "timestamp-millis":
            return lambda ms: datetime.datetime(1970, 1, 1) + datetime.timedelta(milliseconds=ms)
        if lt == "timestamp-micros":
            return lambda us: datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
        if lt == "decimal":
            scale = schema.get("scale", 0)
            return lambda b: _dec.Decimal(int.from_bytes(b, "big", signed=True)).scaleb(-scale)
    return None


def avro_schema_to_spark(schema: dict):
    """Top-level record schema -> Spark StructType."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroTypeError("top-level avro schema must be a record")
    return _spark_type(schema)


def read_avro(spark, path_glob: str):
    """Distributed Avro read: binaryFile source + per-file decode in
    mapInPandas (executor-side; one task per container file)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)
    # schema from one header, driver-side (metadata only)
    first = files.select("path", "content").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no avro files match {path_glob}")
    schema, _, _, _ = read_header(bytes(first[0].content))
    spark_schema = avro_schema_to_spark(schema)
    convs = {
        f["name"]: _logical_converter(f["type"])
        for f in schema["fields"]
        if _logical_converter(f["type"]) is not None
    }
    names = [f["name"] for f in schema["fields"]]

    def decode_files(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode_container(bytes(content))
                for name, conv in convs.items():
                    for r in rows:
                        r[name] = conv(r[name]) if r[name] is not None else None
                yield pd.DataFrame.from_records(rows, columns=names)

    return files.select("content").mapInPandas(decode_files, schema=spark_schema)


def write_avro(df, path: str, codec: str = "deflate", max_rows: int = 1_000_000) -> dict:
    """Driver-side writer for round-trips/tests: DataFrame -> one
    container file. Returns the generated avro schema.

    DELIBERATELY driver-side (`df.collect()` + python-encoded blocks):
    it exists so avro round-trips work jar-free, not as a bulk export
    path. `max_rows` (default 1M) guards the boundary — a frame above
    it raises instead of silently materializing GBs on the driver;
    bulk data belongs in parquet via the package/destination path
    (same honesty discipline as multimodal.py's codec boundaries)."""
    from pyspark.sql import types as T

    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"write_avro is a driver-side fixture writer capped at {max_rows} rows; "
            f"this frame exceeds the cap — write parquet through the package path "
            "for bulk data, or raise max_rows explicitly if you accept the "
            "driver-memory cost"
        )

    _SPARK_AVRO = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.BinaryType: "bytes",
        T.StringType: "string",
    }

    def to_avro_type(dt):
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": ["null", to_avro_type(dt.elementType)]}
        for k, v in _SPARK_AVRO.items():
            if isinstance(dt, k):
                return v
        raise AvroTypeError(f"cannot map spark type {dt} to avro")

    schema = {
        "type": "record",
        "name": "cdf_row",
        "fields": [
            {"name": f.name, "type": ["null", to_avro_type(f.dataType)]}
            for f in df.schema.fields
        ],
    }

    import datetime
    import decimal as _dec

    def to_avro_value(dt, v):
        if v is None:
            return None
        if isinstance(dt, T.DateType):
            return (v - datetime.date(1970, 1, 1)).days
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            td = v - epoch  # exact integer micros (float seconds would round)
            return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        if isinstance(dt, T.DecimalType):
            unscaled = int(_dec.Decimal(v).scaleb(dt.scale).to_integral_value())
            n = max(1, (unscaled.bit_length() + 8) // 8)
            return unscaled.to_bytes(n, "big", signed=True)
        if isinstance(dt, T.ArrayType):
            return [to_avro_value(dt.elementType, x) for x in v]
        return v

    fields = df.schema.fields
    rows = [
        {f.name: to_avro_value(f.dataType, row[f.name]) for f in fields}
        for row in df.collect()
    ]
    blob = write_container(schema, rows, codec=codec)
    with open(path, "wb") as fh:
        fh.write(blob)
    return schema
