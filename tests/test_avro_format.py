"""Jar-free Avro: spec-level binary/container round-trips plus the
distributed read path (binaryFile + mapInPandas), standing in for the
reference's native Avro driver (`crates/cdf-format-avro/`)."""

from __future__ import annotations

import datetime
import decimal
import io

import pytest

from cdf_spark.sources.avro_format import (
    _read_long,
    _write_long,
    decode_container,
    read_avro,
    write_avro,
    write_container,
)


def test_zigzag_varint_roundtrip():
    for n in [0, 1, -1, 63, -64, 64, 8191, -8192, 2**31 - 1, -(2**31), 2**62, -(2**62)]:
        out = io.BytesIO()
        _write_long(out, n)
        assert _read_long(io.BytesIO(out.getvalue())) == n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "kind", "type": {"type": "enum", "name": "k", "symbols": ["A", "B"]}},
        ],
    }
    rows = [
        {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"], "attrs": {"n": 2}, "kind": "A"},
        {"id": 2, "name": None, "score": -0.25, "tags": [], "attrs": {}, "kind": "B"},
    ]
    blob = write_container(schema, rows, codec=codec)
    got_schema, got_rows = decode_container(blob)
    assert got_schema == schema
    assert got_rows == rows


def test_spark_avro_roundtrip_lineitem(spark, tmp_path, lineitem):
    """Real table: parquet slice -> avro container -> distributed read
    back; values identical (timestamps/decimals included via logical
    types)."""
    src = lineitem.select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"
    ).limit(500)
    avro_path = str(tmp_path / "lineitem.avro")
    write_avro(src, avro_path)

    back = read_avro(spark, avro_path)
    assert back.count() == 500
    a = sorted(src.collect(), key=lambda r: (r.l_orderkey, str(r.l_shipdate), float(r.l_quantity)))
    b = sorted(back.collect(), key=lambda r: (r.l_orderkey, str(r.l_shipdate), float(r.l_quantity)))
    for ra, rb in zip(a, b):
        assert ra.l_orderkey == rb.l_orderkey
        assert float(ra.l_quantity) == float(rb.l_quantity)
        assert ra.l_returnflag == rb.l_returnflag
        # ntz timestamps compare naive-UTC
        assert str(ra.l_shipdate).replace("+00:00", "") == str(rb.l_shipdate).replace("+00:00", "")


def test_read_avro_many_files_parallel(spark, tmp_path, orders):
    """Multiple container files decode as separate tasks (per-file
    parallelism) and union into one frame."""
    parts = orders.select("o_orderkey", "o_totalprice").limit(300).collect()
    import pandas  # noqa: F401

    for i in range(3):
        chunk = parts[i * 100 : (i + 1) * 100]
        df = spark.createDataFrame(chunk)
        write_avro(df, str(tmp_path / f"part-{i}.avro"))
    back = read_avro(spark, str(tmp_path / "*.avro"))
    assert back.count() == 300
    assert back.rdd.getNumPartitions() >= 1
    assert {r.o_orderkey for r in back.collect()} == {r.o_orderkey for r in parts}


def test_decimal_logical_type_roundtrip(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("amt", T.DecimalType(12, 3)),
        ]
    )
    vals = [(1, decimal.Decimal("123.456")), (2, decimal.Decimal("-0.001")), (3, None)]
    df = spark.createDataFrame(vals, schema)
    p = str(tmp_path / "dec.avro")
    write_avro(df, p)
    back = {r.k: r.amt for r in read_avro(spark, p).collect()}
    assert back == {1: decimal.Decimal("123.456"), 2: decimal.Decimal("-0.001"), 3: None}


def test_date_logical_type(spark, tmp_path):
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, datetime.date(2024, 2, 29)), (2, datetime.date(1969, 12, 31))],
        T.StructType([T.StructField("k", T.LongType()), T.StructField("d", T.DateType())]),
    )
    p = str(tmp_path / "dates.avro")
    write_avro(df, p)
    back = {r.k: r.d for r in read_avro(spark, p).collect()}
    assert back == {1: datetime.date(2024, 2, 29), 2: datetime.date(1969, 12, 31)}
