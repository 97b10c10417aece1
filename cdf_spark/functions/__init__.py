"""Public scalar-function surface.

The engine's reusable column expressions in one namespace — the
deterministic building blocks the oracle-checked queries compose
(`from cdf_spark import functions as CF`). Everything here is a pure
`Column -> Column` constructor over `pyspark.sql.functions`: JVM-side,
codegen-friendly, reproducible in ANSI SQL (the property the DuckDB
correctness gate depends on).

Groups:
- hashing / identity: `hash64` (md5-derived 60-bit, SQL-reproducible),
  `minhash_signature`, `simhash64`, `rhp_signature`
- text: `token_count`, `bpe_token_count`, `hashed_features`, `occurrences`,
  `word_occurrences`, `shingles`
- vectors: `dot`, `norm`, `cosine`
"""

from ..operators.dedup_approx import minhash_signature, shingles, simhash64
from ..operators.similarity import cosine, dot, norm, rhp_signature
from ..operators.text import (
    bpe_token_count,
    hashed_features,
    hash64,
    occurrences,
    token_count,
    word_occurrences,
)

__all__ = [
    "bpe_token_count",
    "cosine",
    "dot",
    "hash64",
    "hashed_features",
    "minhash_signature",
    "norm",
    "occurrences",
    "rhp_signature",
    "shingles",
    "simhash64",
    "token_count",
    "word_occurrences",
]
