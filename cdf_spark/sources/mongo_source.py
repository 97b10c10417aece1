"""MongoDB-shaped source: extended-JSON collection scans and
change-stream event application with resume tokens.

Re-expresses the reference's MongoDB source
(`crates/cdf-source-mongodb/src/resource.rs:254-340`): collection
scans plus change streams whose position is an opaque, lexically
ordered resume token. No MongoDB server ships in this image, so the
transport is MongoDB's PUBLIC interchange formats instead of the wire
protocol:

- **collection scans** read mongoexport-style NDJSON (relaxed extended
  JSON, one document per line) — the format every Mongo dump/archive
  pipeline already produces. Extended-JSON type wrappers
  (``$numberLong``, ``$date``, ``$oid``) are unwrapped JVM-side.
- **change streams** read archived change-stream events (the shape
  ``watch()`` emits: ``_id._data`` resume token, ``operationType``,
  ``documentKey``, ``fullDocument``) and reduce them to keyed effects
  via the engine's CDC machinery; the checkpointed position is
  :class:`cdf_spark.positions.ResumeToken`, resume filters events at
  or before the stored token.

Scale: NDJSON lines parse in Spark's native json reader (distributed,
codegen); effect reduction is the windowed one-shuffle reduce from
`operators/effects.py`. A live-server connector would swap the reader
for the official Spark-Mongo connector; positions and apply logic are
transport-independent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.effects import apply_effects_to_target, reduce_keyed_effects
from ..positions import ResumeToken
from .base import ResourceDescriptor

# change-stream operationType -> engine CDC op
_OP_MAP = {"insert": "insert", "update": "update", "replace": "update", "delete": "delete"}


def _unwrap_extended_json(df: DataFrame) -> DataFrame:
    """Unwrap relaxed extended-JSON wrappers that survive schema
    inference as structs: {"$numberLong": "n"} -> bigint, {"$oid": s}
    -> string, {"$date": iso} -> timestamp. Operates only on top-level
    columns whose inferred struct has exactly the wrapper field."""
    from pyspark.sql import types as T

    out = df
    for f in df.schema.fields:
        if not isinstance(f.dataType, T.StructType):
            continue
        names = [x.name for x in f.dataType.fields]
        if names == ["$numberLong"]:
            out = out.withColumn(f.name, F.col(f"{f.name}.$numberLong").cast("bigint"))
        elif names == ["$oid"]:
            out = out.withColumn(f.name, F.col(f"{f.name}.$oid"))
        elif names == ["$date"]:
            out = out.withColumn(f.name, F.to_timestamp(F.col(f"{f.name}.$date")))
    return out


@dataclass
class MongoCollectionResource:
    """Collection scan over mongoexport NDJSON archives."""

    descriptor: ResourceDescriptor
    path: str  # NDJSON glob

    def read(self, spark: SparkSession) -> DataFrame:
        return _unwrap_extended_json(spark.read.json(self.path))


@dataclass
class MongoChangeStreamResource:
    """Change-stream events -> keyed effects, resume-token positions.

    Event lines carry ``{"_id": {"_data": token}, "operationType": ...,
    "documentKey": {"_id": ...}, "fullDocument": {...}}``.
    """

    descriptor: ResourceDescriptor
    path: str  # NDJSON glob of archived change-stream events

    def events(self, spark: SparkSession, resume_after: ResumeToken | None = None) -> DataFrame:
        df = spark.read.json(self.path)
        df = df.withColumn("_token", F.col("_id._data"))
        if resume_after is not None:
            # tokens are opaque but lexically ordered (reference
            # resource.rs: ordered resume semantics)
            df = df.filter(F.col("_token") > F.lit(resume_after.token))
        return df

    def effects(self, spark: SparkSession, resume_after: ResumeToken | None = None) -> DataFrame:
        """Events flattened to the engine's effect shape: key columns +
        document fields + `op` + `_token` (the per-effect order)."""
        ev = self.events(spark, resume_after)
        op = F.coalesce(
            *[F.when(F.col("operationType") == k, F.lit(v)) for k, v in _OP_MAP.items()]
        )
        flat = ev.select(
            F.col("documentKey._id").alias("_id"),
            F.col("fullDocument").alias("_doc"),
            op.alias("op"),
            F.col("_token"),
        )
        doc_fields = [f.name for f in flat.schema["_doc"].dataType.fields if f.name != "_id"]
        return flat.select(
            "_id",
            *[F.col(f"_doc.{c}").alias(c) for c in doc_fields],
            "op",
            "_token",
        )

    def apply(
        self,
        spark: SparkSession,
        target: DataFrame,
        resume_after: ResumeToken | None = None,
    ) -> tuple[DataFrame, ResumeToken | None]:
        """Reduce events to one winner per key (last in token order) and
        MERGE into the target; returns (new_target, new_position)."""
        eff = self.effects(spark, resume_after)
        reduced = reduce_keyed_effects(eff, keys=["_id"], order_by=["_token"], winner="last")
        frontier_row = eff.agg(F.max("_token").alias("t")).collect()[0]
        applied = apply_effects_to_target(
            target, reduced.drop("_token"), keys=["_id"]
        )
        new_pos = ResumeToken(frontier_row.t) if frontier_row.t is not None else resume_after
        return applied, new_pos
