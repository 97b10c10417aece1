"""JSON schema inference + variant (residual) capture.

Re-expresses the reference's JSON discovery
(`crates/cdf-format-json/src/discovery.rs:30-110` — windowed
full-content inference) and variant capture
(`crates/cdf-engine/src/variant_capture.rs:15-45`; nested policy
`crates/cdf-contract/src/policy.rs:428-435`; semantic `cdf.variant@1`):
fields observed in the data but absent from the declared schema are
not dropped — they are captured as canonical JSON in a
`_cdf_variant` column; rows whose declared fields fail to parse are
quarantined with the raw record preserved.

Spark shape: one pass, all JVM-side — `from_json` for the declared
struct, a second `from_json` against the *inferred* superset schema to
extract the residual fields, `to_json(struct(...))` for the canonical
residual rendering.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types.schema import CanonicalSchema

VARIANT_COL = "_cdf_variant"
RAW_COL = "_cdf_raw"


@dataclass
class VariantReadResult:
    admitted: DataFrame      # declared fields + _cdf_variant
    quarantined: DataFrame   # unparseable rows, raw record retained
    inferred_schema: T.StructType
    unknown_fields: list[str]


def infer_json_schema(spark: SparkSession, path: str, sample_rows: int | None = None) -> T.StructType:
    """Full-content (optionally windowed) inference over NDJSON."""
    reader = spark.read
    if sample_rows:
        # the sample window is small by contract: collect it and infer
        # from a parallelized line set — avoids converting the whole
        # distributed frame through the RDD serialization path
        lines = [r.value for r in spark.read.text(path).limit(sample_rows).collect()]
        return spark.read.json(spark.sparkContext.parallelize(lines or ["{}"])).schema
    return reader.json(path).schema


def read_json_with_variant(
    spark: SparkSession,
    path: str,
    declared: dict[str, str] | CanonicalSchema,
) -> VariantReadResult:
    """Read NDJSON against a declared schema, capturing extras.

    - declared fields parse into typed columns;
    - unknown top-level fields -> canonical JSON in `_cdf_variant`
      (NULL when none);
    - rows where ALL declared fields fail to materialize (malformed
      JSON) -> quarantine with the raw line.
    """
    if isinstance(declared, dict):
        declared = CanonicalSchema.from_declared(declared)
    declared_struct = declared.to_spark()
    declared_names = set(declared.field_names())

    inferred = infer_json_schema(spark, path)
    unknown = [f.name for f in inferred.fields if f.name not in declared_names and not f.name.startswith("_corrupt")]

    raw = spark.read.text(path).withColumnRenamed("value", RAW_COL)
    # PERMISSIVE from_json yields all-null fields for malformed rows —
    # the corrupt-record column is the reliable malformed signal.
    parse_struct = T.StructType(list(declared_struct.fields) + [T.StructField("_corrupt_record", T.StringType())])
    parsed = raw.withColumn(
        "_d",
        F.from_json(F.col(RAW_COL), parse_struct, {"columnNameOfCorruptRecord": "_corrupt_record"}),
    )

    if unknown:
        residual_struct = T.StructType([f for f in inferred.fields if f.name in unknown])
        parsed = parsed.withColumn("_x", F.from_json(F.col(RAW_COL), residual_struct))
        variant = F.when(
            F.to_json(F.col("_x")).isNotNull() & (F.to_json(F.col("_x")) != "{}"),
            F.to_json(F.col("_x")),
        )
    else:
        variant = F.lit(None).cast("string")

    is_malformed = F.col("_d").isNull() | F.col("_d._corrupt_record").isNotNull()
    quarantined = parsed.filter(is_malformed).select(RAW_COL)
    admitted = (
        parsed.filter(~is_malformed)
        .select(*[F.col("_d." + n).alias(n) for n in declared.field_names()], variant.alias(VARIANT_COL))
    )
    return VariantReadResult(
        admitted=admitted,
        quarantined=quarantined,
        inferred_schema=inferred,
        unknown_fields=unknown,
    )
