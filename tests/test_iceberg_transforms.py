"""Iceberg partition transforms: spec-fixed murmur3 bucket hashing,
inclusive predicate projection (bucket eq-only, order-preserving
truncate/temporal with strict-op widening), writer-side derived
partition values, reader-side file + manifest pruning, and rehydrate
round-trips of transform specs."""

from __future__ import annotations

import datetime
import struct

import pytest
from pyspark.sql import functions as F

from cdf_spark.expressions.ast import Binary, Col, Lit
from cdf_spark.sources.iceberg import (
    IcebergError,
    IcebergFixtureWriter,
    IcebergTable,
    _iceberg_bucket,
    _murmur3_32,
    _parse_transform,
    _project_literal,
    _project_predicate,
)


# -- spec test vectors (Iceberg spec Appendix B publishes these) -----------


def test_murmur3_spec_vectors():
    assert _murmur3_32(struct.pack("<q", 34)) == 2017239379  # int 34
    assert _murmur3_32(b"iceberg") == 1210000089  # string
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    # spec lists -653330422; unsigned view of the same 32 bits
    assert _murmur3_32(struct.pack("<q", days)) == 3641636874


def test_bucket_int_long_string_date_agree_with_spec_serialization():
    # ints and longs hash identically (8-byte LE long)
    assert _iceberg_bucket(34, 16, "int") == _iceberg_bucket(34, 16, "long")
    assert _iceberg_bucket("iceberg", 16, "string") == (1210000089 & 0x7FFFFFFF) % 16
    d = datetime.date(2017, 11, 16)
    assert _iceberg_bucket(d, 16, "date") == (3641636874 & 0x7FFFFFFF) % 16
    assert _iceberg_bucket(None, 16, "int") is None


def test_parse_transform():
    assert _parse_transform("bucket[4]") == ("bucket", 4)
    assert _parse_transform("truncate[10]") == ("truncate", 10)
    assert _parse_transform("identity") == ("identity", None)
    assert _parse_transform("day") == ("day", None)


# -- literal projection ----------------------------------------------------


def test_project_literal_truncate_floor_semantics():
    # spec: truncate(W=10, -1) == -10 (floor, not toward zero)
    assert _project_literal(-1, "truncate", 10, "int") == -10
    assert _project_literal(17, "truncate", 10, "int") == 10
    assert _project_literal("abcdef", "truncate", 3, "string") == "abc"


def test_project_literal_temporal():
    d = datetime.date(2024, 3, 5)
    assert _project_literal(d, "year", None, "date") == 54
    assert _project_literal(d, "month", None, "date") == 54 * 12 + 2
    assert _project_literal(d, "day", None, "date") == (d - datetime.date(1970, 1, 1)).days
    # an int literal is ambiguous for temporal transforms -> unprojectable
    assert _project_literal(19000, "month", None, "date") is None


def test_project_predicate_shapes():
    tf = {"k": ("$part$k_bucket", "bucket", 8, "long"),
          "u": ("$part$u_trunc", "truncate", 2, "string")}
    # bucket: eq projects, range does not
    p = _project_predicate(Binary("eq", Col("k"), Lit(123)), tf)
    assert p.op == "eq" and p.left.name == "$part$k_bucket"
    assert p.right.value == _iceberg_bucket(123, 8, "long")
    assert _project_predicate(Binary("ge", Col("k"), Lit(123)), tf) is None
    # strict < widens to <= in truncated space
    q = _project_predicate(Binary("lt", Col("u"), Lit("u45")), tf)
    assert q.op == "le" and q.right.value == "u4"
    # flipped literal-first comparison normalizes
    r = _project_predicate(Binary("gt", Lit("u45"), Col("u")), tf)
    assert r.op == "le" and r.left.name == "$part$u_trunc"
    # AND drops the unprojectable conjunct; OR is poisoned by it
    both = Binary("and", Binary("eq", Col("k"), Lit(1)), Binary("ge", Col("k"), Lit(1)))
    assert _project_predicate(both, tf).op == "eq"
    either = Binary("or", Binary("eq", Col("k"), Lit(1)), Binary("ge", Col("k"), Lit(1)))
    assert _project_predicate(either, tf) is None
    # ne is never projectable (transforms are not injective)
    assert _project_predicate(Binary("ne", Col("u"), Lit("u45")), tf) is None


# -- writer + reader end-to-end --------------------------------------------


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 600).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), (F.col("id") % 40).cast("string")).alias("user"),
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("id") % 90).cast("int")).alias("d"),
    )
    w = IcebergFixtureWriter(
        tmp_path / "t",
        seed=11,
        partition_by=[("bucket", 8, "k"), ("truncate", 2, "user"), ("month", "d")],
    )
    w.append(df, timestamp_ms=1000)
    return df, w, IcebergTable(tmp_path / "t")


def _sid(t):
    return int(t.metadata["current-snapshot-id"])


def test_bucket_eq_prunes_to_one_bucket_without_losing_the_row(spark, table):
    df, w, t = table
    kept, ev = t.data_files_pruned(_sid(t), [Binary("eq", Col("k"), Lit(123))])
    assert ev["files_pruned"] > 0
    assert spark.read.parquet(*kept).filter("k = 123").count() == 1


def test_truncate_and_month_range_pruning_exact(spark, table):
    df, w, t = table
    kept, ev = t.data_files_pruned(_sid(t), [Binary("ge", Col("user"), Lit("u35"))])
    assert ev["files_pruned"] > 0
    assert (
        spark.read.parquet(*kept).filter("user >= 'u35'").count()
        == df.filter("user >= 'u35'").count()
    )
    lit = Lit(datetime.date(2024, 3, 1))
    kept2, ev2 = t.data_files_pruned(_sid(t), [Binary("ge", Col("d"), lit)])
    assert ev2["files_pruned"] > 0
    assert (
        spark.read.parquet(*kept2).filter("d >= '2024-03-01'").count()
        == df.filter("d >= '2024-03-01'").count()
    )


def test_manifest_level_summary_skip_on_bucket(spark, tmp_path):
    """Two commits with key-disjoint bucket ranges -> two manifests;
    an eq predicate on a key from the first must SKIP the second's
    manifest from its partition summaries alone when the bucket ranges
    are disjoint (we pick keys whose buckets split low/high)."""
    lo = [k for k in range(200) if _iceberg_bucket(k, 8, "long") <= 3]
    hi = [k for k in range(200) if _iceberg_bucket(k, 8, "long") >= 4]
    df_lo = spark.createDataFrame([(k,) for k in lo], "k long")
    df_hi = spark.createDataFrame([(k,) for k in hi], "k long")
    w = IcebergFixtureWriter(tmp_path / "t", seed=3, partition_by=[("bucket", 8, "k")])
    w.append(df_lo, timestamp_ms=1000)
    w.append(df_hi, timestamp_ms=2000)
    t = IcebergTable(tmp_path / "t")
    key = next(k for k in lo if _iceberg_bucket(k, 8, "long") == 0)
    kept, ev = t.data_files_pruned(_sid(t), [Binary("eq", Col("k"), Lit(key))])
    assert ev["manifests_total"] == 2 and ev["manifests_skipped"] == 1, ev
    assert spark.read.parquet(*kept).filter(f"k = {key}").count() == 1


def test_truncate_negative_ints_floor(spark, tmp_path):
    df = spark.createDataFrame([(v,) for v in (-15, -10, -1, 0, 1, 9, 10)], "v long")
    w = IcebergFixtureWriter(tmp_path / "t", seed=7, partition_by=[("truncate", 10, "v")])
    w.append(df, timestamp_ms=1000)
    t = IcebergTable(tmp_path / "t")
    # v >= -1 projects to trunc >= -10: the [-10..-1] file must be kept
    # (floor truncate; toward-zero truncation would put -1 in bucket 0
    # and wrongly prune the file holding it), the [-15] file pruned
    kept, ev = t.data_files_pruned(_sid(t), [Binary("ge", Col("v"), Lit(-1))])
    assert ev["files_pruned"] == 1
    assert sorted(
        r.v for r in spark.read.parquet(*kept).filter("v >= -1").collect()
    ) == [-1, 0, 1, 9, 10]


def test_rehydrate_preserves_transform_spec(spark, tmp_path):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    w = IcebergFixtureWriter(tmp_path / "t", seed=9, partition_by=[("bucket", 4, "k")])
    w.append(df, timestamp_ms=1000)
    w2 = IcebergFixtureWriter(tmp_path / "t", seed=10)  # rehydrates
    assert w2._spec_fields == [("k", "bucket", 4, "k_bucket")]
    w2.append(spark.range(50, 100).select(F.col("id").alias("k")), timestamp_ms=2000)
    t = IcebergTable(tmp_path / "t")
    assert t.read(spark).count() == 100
    kept, ev = t.data_files_pruned(_sid(t), [Binary("eq", Col("k"), Lit(77))])
    assert ev["files_pruned"] > 0
    assert spark.read.parquet(*kept).filter("k = 77").count() == 1


def test_omit_partition_cols_rejected_for_transforms(tmp_path):
    with pytest.raises(IcebergError, match="all-identity"):
        IcebergFixtureWriter(
            tmp_path / "t", partition_by=[("bucket", 4, "k")], omit_partition_cols=True
        )
