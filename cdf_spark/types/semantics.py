"""Semantic layer: logical types over physical columns.

Re-expresses the reference's semantic definitions
(`SemanticDefinition`, `crates/cdf-semantic/src/lib.rs:40-59`;
families `:71-89`; e.g. `postgres.jsonb_text@1`, `mongodb.object_id@1`,
`cdf.variant@1`): a semantic is a named, versioned logical type layered
over a physical Arrow/Spark type, with

  - match rules (by exact column name, regex pattern, or physical type
    family) used to auto-annotate schemas,
  - an optional validation predicate (lowered to a Column),
  - a privacy class driving redaction defaults.

Spark carries semantics in column METADATA (survives parquet round
trips) under the `cdf.semantic` key.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_KEY = "cdf.semantic"


@dataclass
class SemanticDefinition:
    name: str                      # e.g. "cdf.email@1"
    physical_family: str           # utf8 | int | float | binary | timestamp | any
    match_names: list[str] = field(default_factory=list)
    match_pattern: str | None = None     # regex on column name
    validation_regex: str | None = None  # value-level predicate (strings)
    privacy: str = "none"          # none | pii | secret

    def matches(self, col_name: str, dtype: T.DataType) -> bool:
        if not self._family_ok(dtype):
            return False
        if col_name in self.match_names:
            return True
        return bool(self.match_pattern and re.fullmatch(self.match_pattern, col_name))

    def _family_ok(self, dtype: T.DataType) -> bool:
        fam = self.physical_family
        if fam == "any":
            return True
        checks = {
            "utf8": T.StringType,
            "binary": T.BinaryType,
            "int": T.IntegralType,
            "float": T.FractionalType,
            "timestamp": (T.TimestampType, T.TimestampNTZType),
        }
        expected = checks.get(fam)
        return expected is not None and isinstance(dtype, expected)

    def validation_column(self, col: Column) -> Column | None:
        if self.validation_regex is None:
            return None
        return F.regexp_like(col.cast("string"), F.lit(self.validation_regex))


BUILTIN_SEMANTICS: list[SemanticDefinition] = [
    SemanticDefinition(
        "cdf.email@1", "utf8", match_pattern=r".*email.*",
        validation_regex=r"^[^@\s]+@[^@\s]+\.[^@\s]+$", privacy="pii",
    ),
    SemanticDefinition(
        "cdf.variant@1", "utf8", match_names=["_cdf_variant"],
    ),
    SemanticDefinition(
        "postgres.jsonb_text@1", "utf8", match_pattern=r".*(props|payload|json).*",
    ),
    SemanticDefinition(
        "mongodb.object_id@1", "utf8", match_pattern=r".*(_id|oid)$",
        validation_regex=r"^[0-9a-f]{24}$",
    ),
    SemanticDefinition(
        "cdf.url@1", "utf8", match_pattern=r".*(url|uri|link).*",
        validation_regex=r"^[a-z][a-z0-9+.-]*://\S+$",
    ),
]


class SemanticRegistry:
    def __init__(self, definitions: list[SemanticDefinition] | None = None):
        self.definitions = list(definitions if definitions is not None else BUILTIN_SEMANTICS)

    def register(self, definition: SemanticDefinition) -> None:
        self.definitions.append(definition)

    def resolve(self, col_name: str, dtype: T.DataType) -> SemanticDefinition | None:
        # exact-name matches outrank pattern matches (reference: exact
        # beats family matching)
        for d in self.definitions:
            if col_name in d.match_names and d._family_ok(dtype):
                return d
        for d in self.definitions:
            if d.matches(col_name, dtype):
                return d
        return None

    def annotate(self, df: DataFrame) -> DataFrame:
        """Attach semantics to column metadata (survives parquet)."""
        out = df
        for f_ in df.schema.fields:
            sem = self.resolve(f_.name, f_.dataType)
            if sem is not None:
                meta = dict(f_.metadata or {})
                meta[METADATA_KEY] = {"name": sem.name, "privacy": sem.privacy}
                out = out.withMetadata(f_.name, meta)
        return out

    def semantics_of(self, df: DataFrame) -> dict[str, dict]:
        return {
            f_.name: f_.metadata[METADATA_KEY]
            for f_ in df.schema.fields
            if f_.metadata and METADATA_KEY in f_.metadata
        }

    def pii_columns(self, df: DataFrame) -> list[str]:
        return [
            name for name, meta in self.semantics_of(df).items() if meta.get("privacy") == "pii"
        ]

    def validate(self, df: DataFrame) -> DataFrame:
        """Per-column semantic validation verdicts: adds
        `_sem_valid_<col>` booleans for columns with validation rules."""
        out = df
        for f_ in df.schema.fields:
            sem = self.resolve(f_.name, f_.dataType)
            if sem is not None:
                v = sem.validation_column(F.col(f_.name))
                if v is not None:
                    out = out.withColumn(f"_sem_valid_{f_.name}", F.coalesce(v, F.lit(False)))
        return out
