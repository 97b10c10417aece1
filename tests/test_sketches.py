"""HyperLogLog: accuracy against exact distinct counts, and the merge
law (union-of-data == max-of-registers) that makes it a one-pass
partial aggregation at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdf_spark.operators.sketches import (
    hll_cardinality,
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF_DIR = "/root/testdata/sf0.01"


def _est(regs, p=8):
    return regs.agg(hll_estimate(regs, p).alias("e")).collect()[0].e


def test_hll_accuracy_within_expected_error(spark):
    """Raw HLL at p=8 carries ~1.04/sqrt(256) = 6.5% stddev; gate at
    3 sigma against the exact distinct count on real columns."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts
    for table, col in [
        ("lineitem", "l_orderkey"),  # ~15k: HLL regime
        ("orders", "o_custkey"),     # 1.5k: HLL regime
        ("events", "user_id"),       # 150: linear-counting regime
    ]:
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        exact = df.select(col).distinct().count()
        est = hll_cardinality(df, col).collect()[0].hll_estimate
        rel = abs(est - exact) / exact
        assert rel < 0.20, f"{table}.{col}: est {est} vs exact {exact} ({rel:.1%})"


def test_hll_merge_law(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) exactly —
    registers AND estimate — including overlapping data."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    a = df.filter("o_orderkey % 3 != 2")   # overlapping halves
    b = df.filter("o_orderkey % 3 != 0")
    whole = hll_registers(df, "o_custkey")
    merged = hll_merge(hll_registers(a, "o_custkey"), hll_registers(b, "o_custkey"))
    w = {(r.bucket, r.M) for r in whole.collect()}
    m = {(r.bucket, r.M) for r in merged.collect()}
    assert w == m
    assert _est(whole) == _est(merged)


def test_hll_nulls_ignored(spark):
    df = spark.createDataFrame([(1,), (2,), (None,), (2,)], "x int")
    regs = hll_registers(df, "x")
    assert regs.count() <= 2  # two distinct values -> at most 2 registers
    assert _est(regs) > 0


def test_cms_never_undercounts_and_tight_here(spark, sf_dir):
    """CMS one-sided error: est >= true count always; with w=256 and
    only 5 distinct values, collisions are absent and est == true."""
    from cdf_spark.operators.sketches import cms_estimate, cms_registers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    true = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    regs = cms_registers(docs, "lang")
    est = {r.val: r.est for r in cms_estimate(regs, docs.select("lang"), "lang").collect()}
    assert set(est) == set(true)
    for v, c in true.items():
        assert est[v] >= c
        assert est[v] == c  # no collisions at this density


def test_cms_merge_law(spark, sf_dir):
    """cms(A ∪ B) == merge(cms(A), cms(B)) — counter-sum mergeability,
    the property that makes the sketch a one-pass partial aggregate."""
    from cdf_spark.operators.sketches import cms_merge, cms_registers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    merged = {
        (r.r, r.bucket): r.c
        for r in cms_merge(cms_registers(a, "lang"), cms_registers(b, "lang")).collect()
    }
    whole = {(r.r, r.bucket): r.c for r in cms_registers(docs, "lang").collect()}
    assert merged == whole


def test_bloom_no_false_negatives_and_merge_law(spark, orders):
    """Bloom laws: every built value reports maybe_present (no false
    negatives, ever), and the sketch of a union equals the union of
    the sketches (mergeability — the 100 TB partial-aggregation
    property)."""
    from pyspark.sql import functions as F

    from cdf_spark.operators.sketches import bloom_build, bloom_membership

    o = orders.select("o_orderkey")
    built = o.filter(F.col("o_orderkey") <= 900)
    res = bloom_membership(built, "o_orderkey", built, "o_orderkey")
    assert res.filter(~F.col("maybe_present")).count() == 0  # no false negatives

    a = o.filter(F.col("o_orderkey") <= 400)
    b = o.filter((F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 900))
    union_bits = {r.pos for r in bloom_build(a.unionByName(b), "o_orderkey").collect()}
    merged_bits = {r.pos for r in bloom_build(a, "o_orderkey").collect()} | {
        r.pos for r in bloom_build(b, "o_orderkey").collect()
    }
    assert union_bits == merged_bits

    # false-positive rate sanity: keys absent from the build mostly
    # report absent (classical rate at this fill is ~12%)
    absent = o.filter(F.col("o_orderkey") > 900)
    res2 = bloom_membership(built, "o_orderkey", absent, "o_orderkey")
    n = res2.count()
    assert n > 0
    fp = res2.filter(F.col("maybe_present")).count()
    assert fp / n < 0.3


def test_stratified_topk_exact_k_and_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdf_spark.operators.sampling import stratified_topk_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    out = stratified_topk_sample(docs, k=7, strata_cols=["lang"], identity_cols=["doc_id"])
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(7, sizes[lang])  # EXACTLY k (or the stratum size)
    # bit-reproducible across invocations and partitioning
    again = stratified_topk_sample(
        docs.repartition(3), k=7, strata_cols=["lang"], identity_cols=["doc_id"]
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
