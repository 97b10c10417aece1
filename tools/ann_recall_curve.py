"""Measured IVF recall@10 vs probe count — the evidence behind
SCALE.md's graph-ANN (HNSW) adjudication.

Two corpus families at two sizes each:
- ``uniform``: hash-derived i.i.d. vectors (the bench corpus
  construction) — the ADVERSARIAL case for any partition-based ANN:
  high-dim uniform data has near-equidistant neighbors, so true
  top-10 lists straddle Voronoi boundaries maximally.
- ``clustered``: the same construction pulled toward one of 64
  hash-assigned anchors (70% anchor + 30% noise) — the realistic
  shape of real embedding corpora (semantic clusters), which is what
  IVF's cell structure exploits.

For each (family, N) and nprobe in {1, 2, 4, 8, 16}:
  recall@10 = |IVF pairs ∩ exact pairs| / |exact pairs| over
  (query, neighbor) pairs for 256 queries, plus the IVF wall and the
  brute wall for the same batch.

Usage: python tools/ann_recall_curve.py [N ...]   (default 20000 150000)
Prints one JSON line per (family, N, nprobe).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdf_spark.operators.similarity import cosine_topk_fast, ivf_ann_topk_fast  # noqa: E402
from cdf_spark.plans.checkpoint import release_local_checkpoint  # noqa: E402
from cdf_spark.session import get_spark  # noqa: E402

DIM = 256
NQ = 256
NLIST_MOD = 500  # centroid_modulus: ~N/500 lists at N=150k -> 300 lists


def corpus_df(spark, n: int, family: str):
    base = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.xxhash64(F.col("vec_id"), j) % 20001) / F.lit(10000.0),
    )
    if family == "clustered":
        anchor = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda j: (F.xxhash64(F.col("vec_id") % 64, j, F.lit(7)) % 20001)
            / F.lit(10000.0),
        )
        emb = F.zip_with(anchor, base, lambda a, b: a * 0.7 + b * 0.3)
    else:
        emb = base
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("embedding", emb)
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 150_000]
    bad = [n for n in sizes if n < NQ]
    if bad:
        raise SystemExit(
            f"corpus sizes {bad} are below the {NQ}-query sample stride; "
            f"use N >= {NQ}"
        )
    spark = get_spark("ann-recall", master="local[32]")
    for family in ("uniform", "clustered"):
        for n in sizes:
            corpus = corpus_df(spark, n, family)
            qs = corpus.filter(F.col("vec_id") % (n // NQ) == 0)
            t0 = time.perf_counter()
            exact = pairs(cosine_topk_fast(corpus, qs, k=10))
            brute_wall = time.perf_counter() - t0
            for nprobe in (1, 2, 4, 8, 16):
                t0 = time.perf_counter()
                ann = pairs(
                    ivf_ann_topk_fast(
                        corpus, qs, k=10, nprobe=nprobe, centroid_modulus=NLIST_MOD
                    )
                )
                wall = time.perf_counter() - t0
                rec = len(ann & exact) / len(exact)
                print(
                    json.dumps(
                        {
                            "family": family,
                            "n": n,
                            "nlist": max(1, n // NLIST_MOD),
                            "nprobe": nprobe,
                            "recall_at_10": round(rec, 4),
                            "ivf_wall_s": round(wall, 2),
                            "brute_wall_s": round(brute_wall, 2),
                        }
                    ),
                    flush=True,
                )
            release_local_checkpoint(corpus)
    spark.stop()


if __name__ == "__main__":
    main()
