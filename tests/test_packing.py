"""Training-batch assembly: sequence packing + domain mixing
(`cdf_spark/operators/packing.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.packing import domain_mix_sample, pack_sequences


def test_pack_sequences_concat_then_chunk(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens -> pack 0, offset 0
            (2, "d e f g"),        # 4 tokens -> pack 0, offset 3
            (3, "h i j"),          # 3 tokens -> straddles the 8-boundary
            (4, "k"),              # 1 token  -> pack 1
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pack_sequences(docs, budget=8).collect()}
    assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
    assert (out[2].pack_id, out[2].pack_offset) == (0, 3)
    # doc 3 starts at offset 7 of pack 0 and straddles into pack 1 —
    # concatenate-then-chunk places it at its stream offset
    assert (out[3].pack_id, out[3].pack_offset) == (0, 7)
    assert out[3].pack_offset + out[3].n_tokens > 8  # trainer must split
    assert (out[4].pack_id, out[4].pack_offset) == (1, 2)


def test_pack_sequences_shards_are_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", "y"), (3, "e f", "x")],
        ["doc_id", "text", "shard"],
    )
    out = {r.doc_id: r for r in pack_sequences(docs, budget=3, shard_col="shard").collect()}
    # each shard's stream starts at offset 0
    assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
    assert (out[2].pack_id, out[2].pack_offset) == (0, 0)
    assert (out[3].pack_id, out[3].pack_offset) == (0, 2)


def test_domain_mix_binding_domain_keeps_everything(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    targets = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = domain_mix_sample(docs, targets)
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    # the binding domain (min n/p) is kept at rate 1.0
    binding = min(targets, key=lambda d: counts[d] / targets[d])
    assert got[binding] == counts[binding]
    # unlisted domains are dropped entirely
    assert set(got) == set(targets)
    # achieved mixture within hash-gate noise of the target (±20% rel)
    total = sum(got.values())
    for d, p in targets.items():
        assert abs(got[d] / total - p) / p < 0.2, (d, got[d] / total)


def test_domain_mix_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    targets = {"en": 0.6, "zh": 0.4}
    a = {r.doc_id for r in domain_mix_sample(docs, targets).collect()}
    b = {r.doc_id for r in domain_mix_sample(docs, targets).collect()}
    assert a == b and a


def test_training_shuffle_exact_permutation(spark, sf_dir):
    """training_shuffle: positions are exactly 0..n-1 (a permutation,
    no gaps/dups even across partition boundaries), the order follows
    the md5 key, and the result is bit-reproducible across runs and
    partition counts."""
    from pyspark.sql import functions as F

    from cdf_spark.operators.packing import training_shuffle

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    n = d.count()
    out = training_shuffle(d, seed=7, partitions=8)
    assert out.count() == n
    agg = out.agg(
        F.min("position").alias("lo"),
        F.max("position").alias("hi"),
        F.countDistinct("position").alias("nd"),
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.nd) == (0, n - 1, n)
    # order follows the key: position rank == key rank
    rows = out.select("shuffle_key", "position").orderBy("position").collect()
    keys = [r.shuffle_key for r in rows]
    assert keys == sorted(keys)
    # reproducible across partition counts (global order is partition-
    # layout independent)
    out2 = training_shuffle(d, seed=7, partitions=3)
    a = {r.doc_id: r.position for r in out.collect()}
    b = {r.doc_id: r.position for r in out2.collect()}
    assert a == b
    # a different seed is a different permutation
    out3 = training_shuffle(d, seed=8, partitions=8)
    c = {r.doc_id: r.position for r in out3.collect()}
    assert c != a


def test_curriculum_order_positions_and_plan_shape(spark):
    """Positions are exactly 0..n-1, stage-monotone (every bucket-1
    position precedes every bucket-2 position), deterministic across
    runs — and the executed plan contains NO global window (every
    window spec leads with the partition id, the two-phase
    discipline)."""
    from cdf_spark.operators.packing import curriculum_order

    df = spark.createDataFrame(
        [(i, (i % 3) + 1) for i in range(60)], ["doc_id", "ppl_bucket"]
    )
    out = curriculum_order(df, "ppl_bucket")
    rows = out.select("doc_id", "ppl_bucket", "position").collect()
    pos = sorted(r["position"] for r in rows)
    assert pos == list(range(60))
    max_by_bucket = {}
    min_by_bucket = {}
    for r in rows:
        b = r["ppl_bucket"]
        max_by_bucket[b] = max(max_by_bucket.get(b, -1), r["position"])
        min_by_bucket[b] = min(min_by_bucket.get(b, 10**9), r["position"])
    assert max_by_bucket[1] < min_by_bucket[2] < min_by_bucket[3]
    assert max_by_bucket[2] < min_by_bucket[3]
    # deterministic
    rows2 = curriculum_order(df, "ppl_bucket").select("doc_id", "position").collect()
    assert {r["doc_id"]: r["position"] for r in rows2} == {
        r["doc_id"]: r["position"] for r in rows
    }
    # plan shape: no partition-less window
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.strip().startswith("_pid"), spec
