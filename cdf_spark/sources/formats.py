"""Format driver registry and gated optional formats.

Re-expresses the reference's format-driver registry
(`crates/cdf-runtime/src/format.rs:1262`, drivers in
`crates/cdf-format-*`, registry `crates/cdf-builtin-drivers/src/lib.rs`):

  parquet / orc / csv+tsv+psv / json+ndjson / text  -> Spark built-ins
  gzip/bzip2/lz4/zstd/snappy byte transforms        -> Spark codec layer
  arrow-ipc                                          -> pyarrow bridge (below)
  avro                                               -> spark-avro jar when present,
                                                        else the jar-free spec
                                                        implementation in avro_format.py
  protobuf                                           -> requires descriptors + jar (gated)

`require_format` raises a clear, actionable error for formats whose
runtime dependency is absent — mirroring the reference's capability
sheets rather than failing deep inside a read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BUILTIN_FORMATS = {"parquet", "orc", "csv", "json", "ndjson", "text"}
# avro and protobuf are NOT gated: avro_format.py decodes container
# files and protobuf_format.py decodes varint-framed wire streams
# without jars (binaryFile + mapInPandas); jars, when present, are
# preferred for their native decode speed.
GATED_FORMATS: dict[str, str] = {}


class FormatUnavailable(RuntimeError):
    pass


def require_format(spark: SparkSession, fmt: str) -> None:
    fmt = fmt.lower()
    if fmt in BUILTIN_FORMATS or fmt in ("arrow-ipc", "avro", "protobuf"):
        return
    if fmt in GATED_FORMATS:
        # probe the session classpath once
        try:
            spark.read.format(fmt).schema("x int").load("/nonexistent-cdf-probe")
        except Exception as e:
            msg = str(e)
            if "Failed to find data source" in msg:
                raise FormatUnavailable(
                    f"format {fmt!r} needs {GATED_FORMATS[fmt]} on the session classpath"
                ) from None
            return  # data source exists; path error is fine
        return
    raise FormatUnavailable(f"unknown format {fmt!r}")


def read_arrow_ipc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Arrow IPC / Feather files -> DataFrame via the pyarrow bridge.

    Files are read driver-side with pyarrow (zero-copy into Spark via
    the Arrow createDataFrame path) — the right tool for manifests and
    medium inputs; for petabyte inputs convert to parquet first (the
    reference's own bulk path stores Arrow IPC only inside packages).

    Type fidelity note: Spark's Arrow ingestion maps tz-naive arrow
    timestamps to session-tz TimestampType, so a TimestampNTZ column
    round-trips as TimestampType (values identical under the engine's
    pinned UTC session) — the TypeMappingFidelity 'widened' case.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.ipc as ipc

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths)) or [paths]
    tables = []
    for p in paths:
        try:
            with ipc.open_file(p) as reader:
                tables.append(reader.read_all())
        except pa.ArrowInvalid:
            with ipc.open_stream(p) as reader:
                tables.append(reader.read_all())
    table = pa.concat_tables(tables)
    return spark.createDataFrame(table)


def write_arrow_ipc(df: DataFrame, path: str) -> int:
    """DataFrame -> one Arrow IPC file (driver-side collect via Arrow).
    Returns row count."""
    import pyarrow.ipc as ipc

    table = df.toArrow()
    with ipc.new_file(path, table.schema) as writer:
        writer.write_table(table)
    return table.num_rows
