"""Subprocess adapters: external producers over pipes.

Re-expresses the reference's subprocess adapters
(`crates/cdf-subprocess/`, 5.2k LoC: Arrow IPC / NDJSON / Singer /
Airbyte over stdin/stdout pipes): an external program emits records;
the engine adapts them into a DataFrame.

Spark shape: the subprocess runs on the DRIVER (it is a control-plane
connector — Singer taps and Airbyte sources are rate-limited API
clients, not data-plane engines); its output streams into Arrow
batches and enters Spark zero-copy. Singer/Airbyte framing: RECORD /
SCHEMA / STATE messages, with STATE surfaced as the resume position.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..types.schema import CanonicalSchema


@dataclass
class SubprocessResult:
    df: DataFrame
    states: list[dict] = field(default_factory=list)  # Singer/Airbyte STATE messages
    records: int = 0
    positions: list = field(default_factory=list)  # ForeignStatePosition per STATE
    catalog: dict | None = None  # Airbyte CATALOG, when emitted


def run_ndjson_subprocess(
    spark: SparkSession,
    argv: list[str],
    schema: dict[str, str] | None = None,
    timeout: int = 300,
) -> SubprocessResult:
    """Run a program emitting NDJSON rows on stdout -> DataFrame."""
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=timeout, check=True)
    rows = [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]
    spark_schema = CanonicalSchema.from_declared(schema).to_spark() if schema else None
    df = spark.createDataFrame(rows, schema=spark_schema)  # type: ignore[arg-type]
    return SubprocessResult(df=df, records=len(rows))


def run_singer_tap(
    spark: SparkSession,
    argv: list[str],
    stream: str | None = None,
    timeout: int = 300,
) -> SubprocessResult:
    """Run a Singer-protocol tap (`{"type": "SCHEMA"|"RECORD"|"STATE"}`
    messages) -> DataFrame + collected STATE messages (the replayable
    position, reference parity with the Singer adapter)."""
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=timeout, check=True)
    records: list[dict] = []
    states: list[dict] = []
    schema_msg: dict | None = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line:
            continue
        msg = json.loads(line)
        t = msg.get("type")
        if t == "RECORD" and (stream is None or msg.get("stream") == stream):
            records.append(msg["record"])
        elif t == "STATE":
            states.append(msg.get("value", {}))
        elif t == "SCHEMA" and (stream is None or msg.get("stream") == stream):
            schema_msg = msg
    if schema_msg is not None:
        spark_schema = _singer_schema_to_spark(schema_msg.get("schema", {}))
        # Singer records carry ISO strings for date-times: parse rows as
        # JSON lines against the typed schema (Spark's JSON reader owns
        # the string->timestamp coercion).
        lines = [json.dumps(r) for r in records]
        df = spark.read.schema(spark_schema).json(spark.sparkContext.parallelize(lines))
    else:
        df = spark.createDataFrame(records)  # type: ignore[arg-type]
    return SubprocessResult(df=df, states=states, records=len(records))


class AirbyteProtocolError(ValueError):
    """A message violated the Airbyte NDJSON framing."""


def _canonical_json(value) -> str:
    return json.dumps(value, sort_keys=True, separators=(",", ":"))


def _airbyte_state_position(value, seq: int) -> "ForeignStatePosition":
    from ..positions import ForeignStatePosition

    blob = _canonical_json(value)
    digest = hashlib.sha256(blob.encode()).hexdigest()
    return ForeignStatePosition(
        protocol="airbyte", blob=blob, blob_sha256=f"sha256:{digest}", seq=seq
    )


def run_airbyte_source(
    spark: SparkSession,
    argv: list[str],
    stream: str | None = None,
    namespace: str | None = None,
    timeout: int = 300,
) -> SubprocessResult:
    """Run an Airbyte-protocol source -> DataFrame + resume positions.

    Framing parity with the reference's adapter
    (`crates/cdf-subprocess/src/airbyte.rs:63-120`):

    - `RECORD`: requires object `record` with string `stream`, object
      `data`, integer `emitted_at`; filtered by (stream, namespace).
    - `STATE`: kind legacy/stream/global; each state VALUE becomes an
      opaque canonical-JSON position addressed by sha256
      (`protocol.rs:61-71` foreign_state) — the caller checkpoints the
      LAST one.
    - `CATALOG`: captured (schema discovery), requires object `catalog`.
    - Unknown types pass through uncounted (forward compatibility).
    - Non-JSON or shape-violating lines raise AirbyteProtocolError with
      the 1-based line number, like the reference's malformed_field.
    """
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=timeout, check=True)
    records: list[dict] = []
    states: list[dict] = []
    positions = []
    catalog: dict | None = None
    for lineno, line in enumerate(proc.stdout.splitlines(), start=1):
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError as exc:
            raise AirbyteProtocolError(
                f"Airbyte message line {lineno} is not valid JSON: {exc}"
            ) from exc
        if not isinstance(msg, dict) or not isinstance(msg.get("type"), str):
            raise AirbyteProtocolError(f"Airbyte message line {lineno}: missing string 'type'")
        t = msg["type"].upper()
        if t == "RECORD":
            rec = msg.get("record")
            if not isinstance(rec, dict):
                raise AirbyteProtocolError(f"Airbyte RECORD line {lineno}: missing object 'record'")
            if not isinstance(rec.get("stream"), str):
                raise AirbyteProtocolError(f"Airbyte RECORD line {lineno}: missing string 'stream'")
            if not isinstance(rec.get("data"), dict):
                raise AirbyteProtocolError(f"Airbyte RECORD line {lineno}: missing object 'data'")
            if not isinstance(rec.get("emitted_at"), int):
                raise AirbyteProtocolError(
                    f"Airbyte RECORD line {lineno}: missing integer 'emitted_at'"
                )
            if (stream is None or rec["stream"] == stream) and (
                namespace is None or rec.get("namespace") == namespace
            ):
                records.append(rec["data"])
        elif t == "STATE":
            st = msg.get("state")
            if not isinstance(st, dict):
                raise AirbyteProtocolError(f"Airbyte STATE line {lineno}: missing object 'state'")
            kind = st.get("type", "LEGACY")
            if kind not in ("LEGACY", "STREAM", "GLOBAL"):
                raise AirbyteProtocolError(
                    f"Airbyte STATE line {lineno}: unknown state type {kind!r}"
                )
            value = {
                "LEGACY": lambda: st.get("data", st),
                "STREAM": lambda: st.get("stream", {}),
                "GLOBAL": lambda: st.get("global", {}),
            }[kind]()
            states.append(value)
            positions.append(_airbyte_state_position(value, seq=len(positions)))
        elif t == "CATALOG":
            if not isinstance(msg.get("catalog"), dict):
                raise AirbyteProtocolError(
                    f"Airbyte CATALOG line {lineno}: missing object 'catalog'"
                )
            catalog = msg["catalog"]
    spark_schema = None
    if catalog is not None and stream is not None:
        for s in catalog.get("streams", []):
            if s.get("name") == stream and isinstance(s.get("json_schema"), dict):
                spark_schema = _singer_schema_to_spark(s["json_schema"])
    if spark_schema is not None:
        lines = [json.dumps(r) for r in records]
        df = spark.read.schema(spark_schema).json(spark.sparkContext.parallelize(lines))
    else:
        df = spark.createDataFrame(records)  # type: ignore[arg-type]
    return SubprocessResult(
        df=df, states=states, records=len(records), positions=positions, catalog=catalog
    )


_SINGER_TYPES = {
    "string": "utf8",
    "integer": "int64",
    "number": "float64",
    "boolean": "boolean",
}


def _singer_schema_to_spark(json_schema: dict):
    props = json_schema.get("properties", {})
    decl = []
    for name, spec in props.items():
        types = spec.get("type", "string")
        if isinstance(types, list):
            types = next((t for t in types if t != "null"), "string")
        if spec.get("format") == "date-time":
            decl.append((name, "timestamp(us)"))
        else:
            decl.append((name, _SINGER_TYPES.get(types, "utf8")))
    return CanonicalSchema.from_declared(decl).to_spark()
