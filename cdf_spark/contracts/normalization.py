"""Identifier normalization policy.

Re-expresses the reference's normalization layer
(`crates/cdf-contract/src/normalization.rs:1-228`; `IdentifierPolicy`
`policy.rs:324-332`): destination-safe column naming — case folding,
charset restriction, length limits, nested-name flattening — applied
as a metadata-only rename pass with a recorded mapping (evidence, so
lineage survives renames).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class IdentifierPolicy:
    case: str = "snake"           # snake | lower | preserve
    max_length: int = 63           # postgres default
    charset: str = r"[^0-9a-zA-Z_]"
    nested_separator: str = "__"
    reserved: frozenset[str] = frozenset({"select", "from", "where", "group", "order", "table", "user"})


@dataclass
class NormalizationResult:
    df: DataFrame
    mapping: dict[str, str] = field(default_factory=dict)  # original -> normalized


def _snake(name: str) -> str:
    # underscore only between a lowercase/digit and an adjacent capital;
    # separators handled by the charset pass so we never double up
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name).lower()


def normalize_identifier(name: str, policy: IdentifierPolicy, taken: set[str] | None = None) -> str:
    out = name.replace(".", policy.nested_separator)
    if policy.case == "snake":
        out = _snake(out)
    elif policy.case == "lower":
        out = out.lower()
    out = re.sub(policy.charset, "_", out)
    if out and out[0].isdigit():
        out = "_" + out
    if out.lower() in policy.reserved:
        out = out + "_"
    out = out[: policy.max_length]
    if taken is not None:
        base, i = out, 1
        while out in taken:
            suffix = f"_{i}"
            out = base[: policy.max_length - len(suffix)] + suffix
            i += 1
        taken.add(out)
    return out


def normalize_columns(df: DataFrame, policy: IdentifierPolicy | None = None) -> NormalizationResult:
    policy = policy or IdentifierPolicy()
    taken: set[str] = set()
    mapping: dict[str, str] = {}
    for c in df.columns:
        mapping[c] = normalize_identifier(c, policy, taken)
    out = df
    for old, new in mapping.items():
        if old != new:
            out = out.withColumnRenamed(old, new)
    return NormalizationResult(df=out, mapping=mapping)
