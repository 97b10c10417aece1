"""PSI drift + Efraimidis-Spirakis weighted sampling."""

from __future__ import annotations

import math

import pytest

from cdf_spark.operators.drift import psi_drift
from cdf_spark.operators.sampling import weighted_sample_no_replacement


def test_psi_categorical_hand_computed(spark):
    ref = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, ["c"])
    cur = spark.createDataFrame([("a",)] * 2 + [("b",)] * 8, ["c"])
    rows = {r["bin"]: r for r in psi_drift(ref, cur, "c").collect()}
    assert set(rows) == {"a", "b"}
    # add-1 over K=2 bins: pr_a=9/12, pc_a=3/12 -> (0.25-0.75)*ln(1/3)
    exp_a = round((3 / 12 - 9 / 12) * math.log((3 * 12) / (9 * 12)) * 1e6)
    assert rows["a"]["psi_unat"] == exp_a
    assert (rows["a"]["ref_n"], rows["a"]["cur_n"]) == (8, 2)
    # symmetric distributions -> symmetric terms
    assert rows["b"]["psi_unat"] == exp_a
    total = sum(r["psi_unat"] for r in rows.values())
    assert total > 500000  # a hard shift reads as PSI >> 0.25


def test_psi_identical_snapshots_is_zero(spark):
    df = spark.createDataFrame([(float(i % 7),) for i in range(100)], ["x"])
    rows = psi_drift(df, df, "x", bins=5).collect()
    assert all(r["psi_unat"] == 0 for r in rows)
    assert sum(r["ref_n"] for r in rows) == 100


def test_psi_numeric_binning_clamps_and_counts_nulls_out(spark):
    ref = spark.createDataFrame([(0.0,), (10.0,), (5.0,), (None,)], ["x"])
    cur = spark.createDataFrame([(-99.0,), (99.0,), (5.0,)], ["x"])
    rows = {r["bin"]: r for r in psi_drift(ref, cur, "x", bins=2).collect()}
    # ref: 0 -> bin 0; 5 (floor(5*2/10)=1) and 10 (clamped top edge)
    # -> bin 1; NULL excluded
    assert (rows["0"]["ref_n"], rows["1"]["ref_n"]) == (1, 2)
    # cur: -99 clamps to 0, 99 clamps to 1, 5 -> bin 1
    assert (rows["0"]["cur_n"], rows["1"]["cur_n"]) == (1, 2)
    with pytest.raises(ValueError, match="no spread"):
        psi_drift(
            spark.createDataFrame([(1.0,)], ["x"]),
            cur,
            "x",
            bins=2,
        )
    with pytest.raises(ValueError, match="at least 2"):
        psi_drift(ref, cur, "x", bins=1)


def test_weighted_sample_properties(spark):
    rows = [(i, 1 if i != 7 else 100000) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample_no_replacement(df, 20, "w")
    got = out.collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids)) == 20  # without replacement
    assert 7 in ids  # the 100000x weight is effectively certain
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, 21))
    # deterministic under repartition
    again = weighted_sample_no_replacement(df.repartition(17), 20, "w").collect()
    assert {(r["doc_id"], r["rank"]) for r in again} == {
        (r["doc_id"], r["rank"]) for r in got
    }
    with pytest.raises(ValueError, match="positive"):
        weighted_sample_no_replacement(df, 0, "w")


def test_winnow_fingerprint_coverage_and_tie_rule(spark):
    from cdf_spark.operators.curation import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "tiny doc"),  # fewer tokens than k -> no grams, no fingerprints
            (4, "one two three four five"),  # exactly k tokens -> 1 gram
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] == by_doc[2]  # identical docs -> identical fingerprints
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1
    # density: ~2/(w+1) of grams selected, never zero for n >= k
    assert 1 <= len(by_doc[1]) <= 6  # 6 grams, w=4


def test_winnow_near_dups_pairs_and_df_cap(spark):
    from cdf_spark.operators.curation import winnow_near_dups

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra tail tokens here"), (3, "completely different words nothing shared at all whatsoever believe me")],
        ["doc_id", "text"],
    )
    pairs = winnow_near_dups(docs, k=5, w=4, min_shared=2)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got and all(3 not in p for p in got)
    # df_cap=1 drops every fingerprint shared by both docs -> no pairs
    assert winnow_near_dups(docs, k=5, w=4, min_shared=1, df_cap=1).count() == 0


def test_unimax_allocate_waterfill(spark):
    from cdf_spark.operators.packing import unimax_allocate

    # domains with 2 / 10 / 10 tokens; max_epochs=2 -> caps 4/20/20
    rows = (
        [("tiny", "a b")]
        + [("mid", "c d e f g h i j k l")]
        + [("big", "m n o p q r s t u v")]
    )
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r["domain"]: r for r in unimax_allocate(df, 30, max_epochs=2).collect()}
    # uniform share would be 10 each; tiny caps at 4, the spare 6
    # waterfalls: mid/big get 13 each
    assert out["tiny"]["capped"] and out["tiny"]["alloc_tokens"] == 4
    assert not out["mid"]["capped"] and not out["big"]["capped"]
    assert out["mid"]["alloc_tokens"] + out["big"]["alloc_tokens"] == 26
    assert abs(out["mid"]["alloc_tokens"] - out["big"]["alloc_tokens"]) <= 1
    assert sum(r["alloc_tokens"] for r in out.values()) == 30

    # budget above total capacity: everyone capped, total = capacity
    full = {r["domain"]: r for r in unimax_allocate(df, 10_000, max_epochs=2).collect()}
    assert all(r["capped"] for r in full.values())
    assert sum(r["alloc_tokens"] for r in full.values()) == 44

    # remainder tie rule: budget 31 -> one uncapped domain gets the
    # extra token, smallest (cap, domain) first
    odd = {r["domain"]: r for r in unimax_allocate(df, 31, max_epochs=2).collect()}
    assert odd["big"]["alloc_tokens"] == 14 and odd["mid"]["alloc_tokens"] == 13

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-negative"):
        unimax_allocate(df, -1)


def test_psi_numeric_excludes_nan(spark):
    from cdf_spark.operators.drift import psi_drift

    ref = spark.createDataFrame([(0.0,), (10.0,), (float("nan"),)], ["x"])
    cur = spark.createDataFrame([(5.0,), (float("nan"),)], ["x"])
    rows = psi_drift(ref, cur, "x", bins=2).collect()
    assert sum(r["ref_n"] for r in rows) == 2  # NaN excluded both sides
    assert sum(r["cur_n"] for r in rows) == 1


def test_calibration_bins_rejects_out_of_range_scores(spark):
    from pyspark.sql.utils import PythonException

    from cdf_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(1.5, 1)], ["score", "label"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="outside"):
        calibration_bins(df).collect()


def test_psi_categorical_null_bin_merges_once(spark):
    from cdf_spark.operators.drift import psi_drift

    ref = spark.createDataFrame([("a",), (None,), (None,)], ["c"])
    cur = spark.createDataFrame([("a",), (None,)], ["c"])
    rows = psi_drift(ref, cur, "c").collect()
    assert len(rows) == 2  # NULL is ONE bin, not two phantom halves
    null_row = next(r for r in rows if r["bin"] is None)
    assert (null_row["ref_n"], null_row["cur_n"]) == (2, 1)


def test_weighted_sample_refuses_truncated_weights(spark):
    import pytest as _pytest

    from cdf_spark.operators.sampling import weighted_sample_no_replacement

    df = spark.createDataFrame([(1, 0.9), (2, 0.3)], ["doc_id", "w"])
    with _pytest.raises(ValueError, match="micro-units"):
        weighted_sample_no_replacement(df, 1, "w")


def test_calibration_bins_excludes_null_scores(spark):
    from cdf_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(0.5, 1), (None, 0)], ["score", "label"])
    rows = calibration_bins(df).collect()
    assert sum(r["n"] for r in rows) == 1


def test_fleiss_kappa_refuses_empty(spark):
    import pytest as _pytest

    from cdf_spark.operators.evaluation import fleiss_kappa

    empty = spark.createDataFrame([], "item string, label string")
    with _pytest.raises(ValueError, match="empty"):
        fleiss_kappa(empty)


def test_distinct_ngram_ratios_hand_computed(spark):
    from cdf_spark.operators.text import distinct_ngram_ratios

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {r["n"]: r for r in distinct_ngram_ratios(docs, orders=(1, 2)).collect()}
    # unigrams: 7 total, 3 distinct (a, b, c)
    assert (out[1]["distinct_grams"], out[1]["total_grams"]) == (3, 7)
    assert out[1]["ratio_unat"] == 3 * 1000000 // 7
    # bigrams: doc1 -> "a b","b a","a b"; doc2 -> "a b","b c": 5 total,
    # 3 distinct
    assert (out[2]["distinct_grams"], out[2]["total_grams"]) == (3, 5)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        distinct_ngram_ratios(docs, orders=(0,))


def test_kn_bigram_prefers_fluent_order(spark):
    """KN bigram nll: a document whose transitions repeat the corpus's
    dominant word order scores lower (more fluent) than one using the
    same words shuffled into rare transitions."""
    from cdf_spark.operators.curation import lm_kn_bigram_perplexity_scores

    corpus = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    corpus.append((100, "dog lazy the over jumps fox brown quick the"))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {r["doc_id"]: r["nll_nats"] for r in lm_kn_bigram_perplexity_scores(df).collect()}
    assert out[0] < out[100]
    # identical docs score identically, independent of partitioning
    out2 = {
        r["doc_id"]: r["nll_nats"]
        for r in lm_kn_bigram_perplexity_scores(df.repartition(7)).collect()
    }
    assert out == out2


def test_pr_sweep_excludes_null_scores_and_labels(spark):
    from cdf_spark.operators.evaluation import pr_threshold_sweep

    rows = [(0.9, 1), (None, 1), (0.4, None), (0.4, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["threshold"]: r for r in pr_threshold_sweep(df).collect()}
    assert set(out) == {0.9, 0.4}  # NULL score is not a threshold
    assert out[0.4]["fn"] == 0 and out[0.4]["recall_unat"] == 1000000


def test_psi_quantile_bins_equal_population(spark):
    from cdf_spark.operators.drift import psi_drift

    # uniform 0..99: decile edges at 10,20,...,90; identical snapshots
    # -> every bin zero PSI and exactly 10 rows per bin
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    rows = psi_drift(df, df, "x", bins=10, method="quantile").collect()
    assert len(rows) == 10
    assert all(r["psi_unat"] == 0 for r in rows)  # identical -> zero drift
    assert all(9 <= r["ref_n"] <= 11 for r in rows)  # equal-population ±1
    # shifted current: everything above the old p90 lands in the top bin
    hi = spark.createDataFrame([(999.0,)] * 50, ["x"])
    rows = {r["bin"]: r for r in psi_drift(df, hi, "x", bins=10, method="quantile").collect()}
    assert rows["9"]["cur_n"] == 50
    total = sum(r["psi_unat"] for r in rows.values())
    assert total > 250_000  # reads as shifted
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown binning method"):
        psi_drift(df, df, "x", bins=10, method="exotic")
    empty = spark.createDataFrame([], "x double")
    with _pytest.raises(ValueError, match="no binnable"):
        psi_drift(empty, df, "x", bins=10, method="quantile")


def test_calibration_bins_excludes_null_labels(spark):
    from cdf_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(0.55, 1), (0.56, None)], "score double, label int")
    rows = calibration_bins(df).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1 and rows[0]["pos"] == 1


def test_psi_by_stratum_hand_computed(spark):
    """psi_drift_by (r14): each stratum gets its own reference-anchored
    equal-width bins, smoothing K, and totals — independent strata must
    reproduce the single-PSI terms stratum by stratum."""
    from cdf_spark.operators.drift import psi_drift, psi_drift_by

    ref = spark.createDataFrame(
        [("s1", float(i % 10)) for i in range(50)]
        + [("s2", float(i % 4)) for i in range(40)],
        ["src", "x"],
    )
    cur = spark.createDataFrame(
        [("s1", float(i % 10)) for i in range(50)]       # s1 unchanged
        + [("s2", 3.0) for _ in range(40)],               # s2 collapses
        ["src", "x"],
    )
    out = psi_drift_by(ref, cur, "x", by="src", bins=5)
    rows = [(r["stratum"], r["bin"], r["ref_n"], r["cur_n"], r["psi_unat"])
            for r in out.collect()]
    per = {}
    for s, *rest in rows:
        per.setdefault(s, set()).add(tuple(rest))
    # stratum-by-stratum equality with the single-column operator
    for s in ("s1", "s2"):
        single = {
            (r["bin"], r["ref_n"], r["cur_n"], r["psi_unat"])
            for r in psi_drift(
                ref.filter(f"src = '{s}'"), cur.filter(f"src = '{s}'"), "x", bins=5
            ).collect()
        }
        assert per[s] == single
    tot = {s: sum(t[-1] for t in v) for s, v in per.items()}
    assert tot["s1"] == 0 and tot["s2"] > 250_000  # drift isolated to s2


def test_psi_by_stratum_exclusion_rules(spark):
    """Strata absent from the reference, NULL stratum keys, and
    no-spread strata are excluded (documented contract)."""
    from cdf_spark.operators.drift import psi_drift_by

    ref = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("flat", 2.0), ("flat", 2.0), (None, 1.0), (None, 9.0)],
        ["src", "x"],
    )
    cur = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("flat", 2.0), ("new", 7.0), (None, 3.0)],
        ["src", "x"],
    )
    out = psi_drift_by(ref, cur, "x", by="src", bins=4)
    assert {r["stratum"] for r in out.collect()} == {"a"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least 2"):
        psi_drift_by(ref, cur, "x", by="src", bins=1)
