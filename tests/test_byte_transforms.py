"""Byte-transform chains (xz/deflate/charset + gated brotli/zstd),
standing in for `crates/cdf-transform-*/`."""

from __future__ import annotations

import json

import pytest

from cdf_spark.sources.byte_transforms import (
    build_chain,
    compress,
    read_with_transforms,
)
from cdf_spark.sources.formats import FormatUnavailable


def _write(p, name, rows):
    payload = "\n".join(json.dumps(r) for r in rows).encode()
    p.write_bytes(compress(name, payload))


def test_xz_ndjson_roundtrip(spark, tmp_path):
    rows = [{"id": i, "v": f"r{i}"} for i in range(50)]
    _write(tmp_path / "a.ndjson.xz", "xz", rows[:25])
    _write(tmp_path / "b.ndjson.xz", "xz", rows[25:])
    df = read_with_transforms(spark, str(tmp_path / "*.xz"), ["xz"])
    assert df.count() == 50
    assert {r.id for r in df.collect()} == set(range(50))


def test_deflate_with_schema(spark, tmp_path):
    rows = [{"id": i, "x": i * 0.5} for i in range(10)]
    _write(tmp_path / "d.bin", "deflate", rows)
    df = read_with_transforms(
        spark, str(tmp_path / "d.bin"), ["deflate"], schema="id long, x double"
    )
    assert df.count() == 10
    assert df.schema.simpleString() == "struct<id:bigint,x:double>"


def test_charset_transcode_latin1_csv(spark, tmp_path):
    text = "1;café\n2;Ångström\n"
    (tmp_path / "t.csv").write_bytes(text.encode("latin-1"))
    df = read_with_transforms(
        spark,
        str(tmp_path / "t.csv"),
        ["transcode:latin-1"],
        format="csv",
        schema="id int, name string",
        csv_options={"sep": ";"},
    )
    got = {r.id: r.name for r in df.collect()}
    assert got == {1: "café", 2: "Ångström"}


def test_chained_xz_then_transcode(spark, tmp_path):
    payload = '{"id": 1, "name": "naïve"}\n'.encode("latin-1")
    (tmp_path / "c.xz").write_bytes(compress("xz", payload))
    df = read_with_transforms(
        spark, str(tmp_path / "c.xz"), ["xz", "transcode:latin-1"],
        schema="id long, name string",
    )
    assert df.collect()[0].name == "naïve"


def test_bzip2_text_lines(spark, tmp_path):
    (tmp_path / "x.bz2").write_bytes(compress("bzip2", b"alpha\nbeta\n"))
    df = read_with_transforms(spark, str(tmp_path / "x.bz2"), ["bzip2"], format="text")
    assert {r.value for r in df.collect()} == {"alpha", "beta"}


def test_missing_lib_is_actionable(spark, tmp_path):
    (tmp_path / "y.br").write_bytes(b"\x00")
    chain = build_chain(["brotli"])  # builds fine; fails on use with a clear error
    try:
        import brotli  # noqa: F401

        pytest.skip("brotli installed in this image")
    except ImportError:
        pass
    with pytest.raises(FormatUnavailable) as e:
        chain(b"\x00")
    assert "brotli" in str(e.value)


def test_unknown_transform_rejected():
    with pytest.raises(FormatUnavailable):
        build_chain(["rot13"])
