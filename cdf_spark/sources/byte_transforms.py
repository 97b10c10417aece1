"""Byte-transform chains: decompression + character transcoding ahead
of format parsing.

Re-expresses the reference's transform drivers
(`crates/cdf-transform-{gzip,bzip2,xz,brotli,zstd,lz4,snappy,character}/`,
registry `crates/cdf-builtin-drivers/src/lib.rs`): a files resource may
declare a CHAIN of byte transforms (e.g. ``xz`` then
``transcode:latin-1``) that runs between the raw bytes and the format
driver. Spark's own codec layer covers gzip/bzip2/zstd/lz4/snappy for
text sources transparently; this module adds the ones Spark lacks
(xz/LZMA, raw deflate, brotli when the lib exists, explicit charset
transcoding) and makes the chain explicit and auditable.

Execution shape: ``binaryFile`` source → per-file chain apply + line
split inside ``mapInPandas`` (executor-side, one task per file) → a
``value: string`` frame → JVM-side ``from_json``/``from_csv`` parsing.
No RDD round-trips; schema inference samples ONE file driver-side.
"""

from __future__ import annotations

import bz2 as _bz2
import gzip as _gzip
import io
import lzma as _lzma
import zlib as _zlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .formats import FormatUnavailable


def _gate(modname: str) -> Callable[[bytes], bytes]:
    def missing(_: bytes) -> bytes:
        raise FormatUnavailable(f"byte transform needs the {modname!r} python module")

    return missing


try:  # pragma: no cover
    import brotli as _brotli

    _brotli_dec = _brotli.decompress
except ImportError:  # pragma: no cover
    _brotli_dec = _gate("brotli")

try:  # pragma: no cover
    import zstandard as _zstd

    _zstd_dec = lambda b: _zstd.ZstdDecompressor().decompress(b)  # noqa: E731
except ImportError:  # pragma: no cover
    _zstd_dec = _gate("zstandard")


DECOMPRESSORS: dict[str, Callable[[bytes], bytes]] = {
    "gzip": _gzip.decompress,
    "bzip2": _bz2.decompress,
    "xz": _lzma.decompress,  # .xz container OR raw lzma alike via FORMAT_AUTO
    "deflate": lambda b: _zlib.decompress(b, -15),
    "zlib": _zlib.decompress,
    "brotli": _brotli_dec,
    "zstd": _zstd_dec,
}


def compress(name: str, data: bytes) -> bytes:
    """Inverse transforms for tests/round-trips (xz/gzip/bzip2/deflate/zlib)."""
    if name == "gzip":
        return _gzip.compress(data)
    if name == "bzip2":
        return _bz2.compress(data)
    if name == "xz":
        return _lzma.compress(data)
    if name == "deflate":
        c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
        return c.compress(data) + c.flush()
    if name == "zlib":
        return _zlib.compress(data)
    raise FormatUnavailable(f"no compressor for {name!r}")


def build_chain(transforms: list[str]) -> Callable[[bytes], str]:
    """Compile a declared transform chain into bytes -> decoded text.

    Each entry is a decompressor name or ``transcode:<charset>``; the
    final decode defaults to utf-8 when no transcode step is present.
    """
    steps: list[Callable] = []
    charset = "utf-8"
    for t in transforms:
        if t.startswith("transcode:"):
            charset = t.split(":", 1)[1]
        elif t in DECOMPRESSORS:
            steps.append(DECOMPRESSORS[t])
        else:
            raise FormatUnavailable(f"unknown byte transform {t!r}")

    def apply(raw: bytes) -> str:
        for s in steps:
            raw = s(raw)
        return raw.decode(charset)

    return apply


def read_with_transforms(
    spark: SparkSession,
    path_glob: str,
    transforms: list[str],
    format: str = "ndjson",  # ndjson | csv | text
    schema: str | None = None,
    csv_options: dict | None = None,
) -> DataFrame:
    """Distributed read through a byte-transform chain.

    Files decode on executors (one task per file); parsing stays
    JVM-side (`from_json` / `from_csv`). ``schema`` is a DDL string;
    when omitted for ndjson it is inferred by sampling one file.
    """
    import pandas as pd

    chain = build_chain(transforms)
    files = spark.read.format("binaryFile").load(path_glob)

    def decode(batches):
        for pdf in batches:
            lines: list[str] = []
            for content in pdf["content"]:
                text = chain(bytes(content))
                lines.extend(l for l in text.splitlines() if l.strip())
            yield pd.DataFrame({"value": lines})

    lines_df = files.select("content").mapInPandas(decode, schema="value string")

    if format == "text":
        return lines_df
    if format == "ndjson":
        if schema is None:
            first = spark.read.format("binaryFile").load(path_glob).limit(1).collect()
            if not first:
                raise FileNotFoundError(f"no files match {path_glob}")
            sample_line = next(
                l for l in chain(bytes(first[0].content)).splitlines() if l.strip()
            )
            schema_col = F.schema_of_json(F.lit(sample_line))
            schema = spark.range(1).select(schema_col.alias("s")).collect()[0].s
        return lines_df.select(F.from_json("value", schema).alias("r")).select("r.*")
    if format == "csv":
        if schema is None:
            raise ValueError("csv through a transform chain requires an explicit schema")
        return lines_df.select(
            F.from_csv("value", schema, csv_options or {}).alias("r")
        ).select("r.*")
    raise FormatUnavailable(f"format {format!r} not supported behind byte transforms")
