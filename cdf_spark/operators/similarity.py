"""Similarity search over embedding columns.

Beyond-reference operators: approximate nearest neighbor over an
`array<float>` embedding column.

- **cosine_topk** — exact brute-force: broadcast the (small) query
  set, score every corpus row with a JVM-side fold (F.aggregate /
  zip_with — sequential left-to-right double adds, bit-identical to a
  sequential SQL evaluation), window-rank per query. The baseline and
  the verifier.
- **rhp_lsh_topk** — random-hyperplane LSH: 16-bit sign signatures
  from deterministic pseudo-random hyperplanes (hash-derived, no RNG
  state), bucket-join on signature prefix, exact re-score inside
  buckets. The 100 TB path: corpus scored only where signatures
  collide.
- **embedding_near_dup_pairs** — corpus self-pairs above a cosine
  threshold (duplicate detection), LSH-bucketed.

Scale: brute-force is O(|Q|×|C|) but shuffle-free (broadcast hash
join); LSH replaces the cross product with a bucket equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import hash64


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, neighbor_id, sim, rank). Ties broken by
    neighbor id for determinism. Self-matches excluded when ids
    collide.
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(cosine(F.col("_qv"), F.col("_cv")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def rhp_signature(vec: Column, bits: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane sign signature.

    Hyperplane b's component d is a deterministic pseudo-random value
    in [-1,1): (hash64("b:d") % 10000)/5000 - 1. No RNG state — the
    same hyperplanes exist on every executor and in the SQL oracle.
    Signature bit b = sign(v · h_b).
    """
    def plane_component(b: Column, d: Column) -> Column:
        h = hash64(F.concat(b.cast("string"), F.lit(":"), d.cast("string")))
        return (F.pmod(h, F.lit(10000)).cast("double") / F.lit(5000.0)) - F.lit(1.0)

    def bit(b):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, d: v.cast("double") * plane_component(F.lit(b), d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(F.lit(0).cast("bigint"))

    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + bit(b)
    return sig


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share at least one `band_bits`-wide
    signature band; candidates re-scored exactly. Recall < 1 by
    construction (that's the trade); rank/sim semantics match
    cosine_topk."""
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1

    def banded(df: DataFrame, idc: str, alias_vec: str) -> DataFrame:
        sig = rhp_signature(F.col(vec_col), bits, dim)
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sig, b * band_bits).bitwiseAND(F.lit(mask)).alias("bh"),
            )
            for b in range(nbands)
        ]
        return df.select(
            F.col(idc).alias(f"{alias_vec}_id"),
            F.col(vec_col).alias(f"_{alias_vec}v"),
            F.explode(F.array(*band_structs)).alias("bb"),
        ).select(f"{alias_vec}_id", f"_{alias_vec}v", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    cb = banded(corpus, corpus_id, "neighbor")
    qb = banded(queries, query_id, "query")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bh"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_queryv", "_neighborv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("sim", F.round(cosine(F.col("_queryv"), F.col("_neighborv")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold (exact, full self-join).
    For very large corpora route through rhp signatures first."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(cosine(F.col("_va"), F.col("_vb")), round_to))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
