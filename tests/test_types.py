"""Type kernel: canonical vocabulary parsing, fidelity, fingerprints."""

import pytest
from pyspark.sql import types as T

from cdf_spark.types.arrow_types import TypeParseError, parse_arrow_type, spark_to_canonical
from cdf_spark.types.authority import SchemaAuthority
from cdf_spark.types.schema import CanonicalSchema, schema_fingerprint


@pytest.mark.parametrize(
    "text,expected",
    [
        ("utf8", T.StringType()),
        ("string", T.StringType()),
        ("json", T.StringType()),
        ("large_utf8", T.StringType()),
        ("boolean", T.BooleanType()),
        ("int8", T.ByteType()),
        ("int16", T.ShortType()),
        ("int32", T.IntegerType()),
        ("int64", T.LongType()),
        ("float32", T.FloatType()),
        ("float64", T.DoubleType()),
        ("binary", T.BinaryType()),
        ("large_binary", T.BinaryType()),
        ("date32", T.DateType()),
        ("date64", T.DateType()),
        ("decimal128(38,10)", T.DecimalType(38, 10)),
        ("decimal(12,2)", T.DecimalType(12, 2)),
    ],
)
def test_primitives(text, expected):
    mt = parse_arrow_type(text)
    assert mt.spark_type == expected
    assert mt.exact


@pytest.mark.parametrize(
    "text,expected,kind",
    [
        ("uint8", T.ShortType(), "widened"),
        ("uint16", T.IntegerType(), "widened"),
        ("uint32", T.LongType(), "widened"),
        ("uint64", T.DecimalType(20, 0), "widened"),
        ("float16", T.FloatType(), "promoted"),
        ("time64(us)", T.LongType(), "emulated"),
        ("timestamp(ns)", T.TimestampNTZType(), "truncated"),
    ],
)
def test_lossy_mappings_record_fidelity(text, expected, kind):
    mt = parse_arrow_type(text)
    assert mt.spark_type == expected
    assert not mt.exact
    assert mt.fidelity[0].kind == kind


def test_timestamps():
    assert parse_arrow_type("timestamp(us, UTC)").spark_type == T.TimestampType()
    assert parse_arrow_type("timestamp(us)").spark_type == T.TimestampNTZType()
    assert parse_arrow_type("timestamp(ms)").spark_type == T.TimestampNTZType()


def test_nested():
    mt = parse_arrow_type("struct<id: int64, labels: list<utf8>>")
    assert mt.spark_type == T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("labels", T.ArrayType(T.StringType(), True), True),
        ]
    )
    mt = parse_arrow_type("map<utf8, int64>")
    assert mt.spark_type == T.MapType(T.StringType(), T.LongType(), True)
    mt = parse_arrow_type("list<struct<sku: utf8, qty: int64>>")
    assert isinstance(mt.spark_type, T.ArrayType)


def test_union_emulation():
    mt = parse_arrow_type("union<int64, utf8>")
    assert isinstance(mt.spark_type, T.StructType)
    assert mt.spark_type.fieldNames() == ["_tag", "_0", "_1"]
    assert mt.fidelity[0].kind == "emulated"


def test_unknown_type_rejected():
    with pytest.raises(TypeParseError):
        parse_arrow_type("frobnicator")
    with pytest.raises(TypeParseError):
        parse_arrow_type("decimal128(99,0)")


def test_roundtrip_canonicalization():
    for text in ["int64", "utf8", "list<float64>", "map<utf8, int64>", "struct<a: int32, b: utf8>"]:
        mt = parse_arrow_type(text)
        assert parse_arrow_type(spark_to_canonical(mt.spark_type)).spark_type == mt.spark_type


def test_fingerprint_stability_and_sensitivity():
    s1 = CanonicalSchema.from_declared({"id": "int64", "name": "utf8"})
    s2 = CanonicalSchema.from_declared({"id": "int64", "name": "utf8"})
    s3 = CanonicalSchema.from_declared({"id": "int64", "name": "large_utf8"})  # canonicalizes same
    s4 = CanonicalSchema.from_declared({"id": "int32", "name": "utf8"})
    assert s1.fingerprint() == s2.fingerprint()
    assert s1.fingerprint() == s3.fingerprint()  # large_utf8 -> utf8 canonical
    assert s1.fingerprint() != s4.fingerprint()
    # field order is semantic
    s5 = CanonicalSchema.from_declared([("name", "utf8"), ("id", "int64")])
    assert s1.fingerprint() != s5.fingerprint()


def test_spark_schema_fingerprint():
    st = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())])
    fp = schema_fingerprint(st)
    assert fp.startswith("sha256:")
    assert fp == schema_fingerprint(st)


def test_schema_authority_lifecycle(tmp_path):
    auth = SchemaAuthority(tmp_path, "orders")
    v1 = auth.propose(CanonicalSchema.from_declared({"id": "int64", "amount": "float64"}))
    assert v1.status == "candidate"
    auth.promote(v1.version)
    assert auth.active().version == v1.version

    # exact admission
    res = auth.admit(CanonicalSchema.from_declared({"id": "int64", "amount": "float64"}))
    assert res.verdict == "exact" and res.admissible

    # widening admission
    res = auth.admit(CanonicalSchema.from_declared({"id": "int32", "amount": "float64"}))
    assert res.verdict == "widened" and res.admissible

    # extra fields -> variant capture candidates
    res = auth.admit(CanonicalSchema.from_declared({"id": "int64", "amount": "float64", "extra": "utf8"}))
    assert res.verdict == "extra_fields" and res.unknown_fields == ["extra"]

    # drift -> rejected
    res = auth.admit(CanonicalSchema.from_declared({"id": "utf8", "amount": "float64"}))
    assert res.verdict == "drifted" and not res.admissible

    # persistence + idempotent propose
    auth2 = SchemaAuthority(tmp_path, "orders")
    assert auth2.active().fingerprint == v1.fingerprint
    assert auth2.propose(CanonicalSchema.from_declared({"id": "int64", "amount": "float64"})).version == v1.version
