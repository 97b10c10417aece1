"""Dedup, keyed effects, late data, sampling, as-of join."""

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators import (
    apply_effects_to_target,
    asof_join,
    classify_late_data,
    dedup_keyed,
    reduce_keyed_effects,
    stratified_hash_sample,
)
from cdf_spark.operators.dedup import DuplicateKeyError


@pytest.fixture()
def dupes(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (2, 1, "d"), (3, 7, "e")],
        ["k", "ord", "v"],
    )


def test_dedup_keep_last(dupes):
    out = dedup_keyed(dupes, ["k"], ["ord"], keep="last")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "b"), (2, "c"), (3, "e")}


def test_dedup_keep_first(dupes):
    out = dedup_keyed(dupes, ["k"], ["ord"], keep="first")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "d"), (3, "e")}


def test_dedup_fail(dupes):
    with pytest.raises(DuplicateKeyError):
        dedup_keyed(dupes, ["k"], ["ord"], keep="fail")
    marked = dedup_keyed(dupes, ["k"], ["ord"], keep="fail", fail_action="mark")
    assert marked.filter("_cdf_duplicate").count() == 4


def test_reduce_and_apply_effects(spark):
    target = spark.createDataFrame([(1, "old1"), (2, "old2"), (3, "old3")], ["k", "v"])
    effects = spark.createDataFrame(
        [
            (1, "new1a", "update", 1),
            (1, "new1b", "update", 2),   # later wins
            (2, None, "delete", 1),
            (4, "new4", "insert", 1),
        ],
        ["k", "v", "op", "seq"],
    )
    reduced = reduce_keyed_effects(effects, ["k"], ["seq"], winner="last")
    assert reduced.count() == 3
    out = apply_effects_to_target(target, reduced, ["k"])
    assert {(r.k, r.v) for r in out.collect()} == {(1, "new1b"), (3, "old3"), (4, "new4")}


def test_late_data_actions(spark):
    df = spark.createDataFrame([(1, 100), (2, 50), (3, 200)], ["id", "t"])
    wm = 100

    s = classify_late_data(df, "t", wm, action="annotate")
    ann = {r.id: r._cdf_late for r in s.admitted_annotated.collect()}
    assert ann == {1: True, 2: True, 3: False}

    s = classify_late_data(df, "t", wm, action="quarantine")
    assert s.quarantined.count() == 2 and s.on_time.count() == 1

    s = classify_late_data(df, "t", wm, action="recapture")
    assert s.recaptured.count() == 2
    assert "_cdf_late" not in s.recaptured.columns


def test_stratified_sample_deterministic(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s1 = stratified_hash_sample(df, ["k"], modulus=100, keep_buckets=10)
    s2 = stratified_hash_sample(df.repartition(7), ["k"], modulus=100, keep_buckets=10)
    ids1 = sorted(r.k for r in s1.collect())
    ids2 = sorted(r.k for r in s2.collect())
    assert ids1 == ids2  # partitioning-independent
    assert 50 < len(ids1) < 200  # ~10%


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 2, 20.0)],
        ["sym", "t", "px"],
    )
    trades = spark.createDataFrame(
        [("A", 3, 100), ("A", 6, 200), ("B", 1, 300), ("B", 4, 400)],
        ["sym", "t", "qty"],
    )
    out = asof_join(trades, quotes, on="t", by=["sym"])
    got = {(r.sym, r.t): r.r_px for r in out.collect()}
    assert got == {("A", 3): 10.0, ("A", 6): 11.0, ("B", 1): None, ("B", 4): 20.0}


def test_asof_join_tolerance(spark):
    quotes = spark.createDataFrame([("A", 1, 10.0)], ["sym", "t", "px"])
    trades = spark.createDataFrame([("A", 3, 100), ("A", 50, 200)], ["sym", "t", "qty"])
    out = asof_join(trades, quotes, on="t", by=["sym"], tolerance=5)
    got = {r.t: r.r_px for r in out.collect()}
    assert got == {3: 10.0, 50: None}


def test_systematic_resample_distribution_and_total(spark):
    from pyspark.sql import functions as F

    from cdf_spark.operators.sampling import systematic_resample

    rows = [(1, 500), (2, 250), (3, 250), (4, 0), (5, -3)] + [
        (i, 1) for i in range(10, 20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    out = systematic_resample(df, weight_col="wt", n=101, id_col="doc_id").collect()
    got = {r["doc_id"]: r["n_copies"] for r in out}
    # total draws are exactly n
    assert sum(got.values()) == 101
    # zero/negative weights can never be drawn
    assert 4 not in got and 5 not in got
    # a doc with half the total weight gets ~half the draws
    total_w = 500 + 250 + 250 + 10
    assert abs(got[1] - 101 * 500 / total_w) <= 1
    assert abs(got[2] - 101 * 250 / total_w) <= 1


def test_systematic_resample_partition_independent(spark):
    from cdf_spark.operators.sampling import systematic_resample

    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    a = spark.createDataFrame(rows, ["doc_id", "wt"]).repartition(11)
    b = spark.createDataFrame(rows, ["doc_id", "wt"]).coalesce(1)
    ra = sorted(map(tuple, systematic_resample(a, "wt", 57).collect()))
    rb = sorted(map(tuple, systematic_resample(b, "wt", 57).collect()))
    assert ra == rb


def test_systematic_resample_refusals(spark):
    import pytest

    from cdf_spark.operators.sampling import systematic_resample

    df = spark.createDataFrame([(1, 5)], ["doc_id", "wt"])
    with pytest.raises(ValueError, match="positive"):
        systematic_resample(df, "wt", 0)
    empty = spark.createDataFrame([(1, 0)], ["doc_id", "wt"])
    with pytest.raises(ValueError, match="total weight"):
        systematic_resample(empty, "wt", 5)


def test_bitext_margin_mining_mutual_best_and_density_norm(spark):
    import math

    from cdf_spark.operators.similarity import margin_bitext_mine

    # planted geometry in 4-d: a0<->b1 are near-identical (true pair);
    # b3 is close to a0 but NOT a0's best; a2 sits in a dense clump
    # with b5/b7 (high local averages -> low margin).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # side A (even)
        (1, [0.99, 0.1, 0.0, 0.0]),       # side B: true pair of 0
        (2, [0.0, 1.0, 0.0, 0.0]),        # side A, dense clump
        (3, [0.7, 0.5, 0.0, 0.0]),        # side B, nearish 0
        (5, [0.0, 0.99, 0.1, 0.0]),       # side B, clump
        (7, [0.0, 0.99, -0.1, 0.0]),      # side B, clump
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )
    out = margin_bitext_mine(
        emb, side_expr="vec_id % 2 = 0", k=2,
        margin_threshold_micro=0, centroid_modulus=5,
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["margin_unat"] for r in out}
    assert (0, 1) in got  # the true pair survives as mutual best
    # every output pair is mutual-best: a_id and b_id each appear once
    assert len({a for a, _ in got}) == len(got) and len({b for _, b in got}) == len(got)
    # margins exceed 1.0 only where the pair beats its local density
    assert got[(0, 1)] > 1_000_000


def test_pmi_collocations_rank_planted_mwe_over_frequent_pair(spark):
    from cdf_spark.operators.text import pmi_collocations

    # "san mateo" always co-occurs (PMI high); "the cat" is frequent
    # but both words appear everywhere (PMI low); low-count perfect
    # pairs are dropped by min_count.
    docs = [
        (i, "san mateo is where the cat sleeps and the dog eats") for i in range(6)
    ] + [(100, "rare pair"), (101, "the cat the dog the bird")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_collocations(df, k=20, min_count=5).collect()
    pmis = {(r["tok_a"], r["tok_b"]): r["pmi_unat"] for r in out}
    # exclusive pairs (san mateo, is where, ...) tie at max PMI;
    # the planted MWE is in that top group
    assert pmis[("san", "mateo")] == max(pmis.values())
    assert ("rare", "pair") not in pmis  # min_count drops it
    # 'the cat' survives min_count but scores below the true MWE:
    # 'the' appears everywhere, so the pair is expected-by-chance
    assert ("the", "cat") in pmis
    assert pmis[("the", "cat")] < pmis[("san", "mateo")]
