"""Evaluation operators: retrieval metrics, PR threshold sweep,
Fleiss' kappa — hand-computed expectations + partition independence."""

from __future__ import annotations

import pytest

from cdf_spark.operators.evaluation import (
    fleiss_kappa,
    pr_threshold_sweep,
    retrieval_metrics,
)


def test_retrieval_metrics_hand_computed(spark):
    run = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
         ("q2", 20, 1), ("q2", 21, 2)],
        ["qid", "doc_id", "rk"],
    )
    qrels = spark.createDataFrame(
        # q1: 11 grade 2, 12 grade 1, 99 grade 1 (missed)
        # q2: nothing retrieved is relevant
        # q3: judged but not run at all
        [("q1", 11, 2), ("q1", 12, 1), ("q1", 99, 1),
         ("q2", 77, 1), ("q3", 5, 3)],
        ["qid", "doc_id", "grade"],
    )
    rows = {r["qid"]: r for r in retrieval_metrics(run, qrels, k=3).collect()}
    assert set(rows) == {"q1", "q2", "q3"}
    q1 = rows["q1"]
    assert (q1["rel_total"], q1["hits"]) == (3, 2)
    assert q1["mrr_unat"] == 500000  # first relevant at rank 2
    assert q1["recall_unat"] == 666666  # 2/3
    # dcg = 2/log2(3) + 1/log2(4) -> partials round(2e6/1.584963)=1261860? compute:
    # 2*1e6/ (ln(3)/ln(2)) = 2000000/1.5849625 = 1261859.5 -> 1261860 (round)
    # + 1*1e6/2 = 500000 -> dcg=1761860
    # ideal: grades [2,1,1] at ranks 1,2,3 -> 2e6 + 1e6/1.5849625(=630930) + 5e5
    #   = 3130930; ndcg = 1761860*1e6 div 3130930 = 562727...
    assert q1["ndcg_unat"] == 1761860 * 1000000 // 3130930
    q2 = rows["q2"]
    assert q2["hits"] == 0 and q2["mrr_unat"] is None
    assert q2["recall_unat"] == 0 and q2["ndcg_unat"] == 0
    q3 = rows["q3"]
    assert q3["hits"] == 0 and q3["recall_unat"] == 0


def test_pr_threshold_sweep_hand_computed(spark):
    rows = [(0.9, 1), (0.8, 0), (0.8, 1), (0.6, 1), (0.4, 0)]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {r["threshold"]: r for r in pr_threshold_sweep(df).collect()}
    assert set(out) == {0.9, 0.8, 0.6, 0.4}
    assert (out[0.9]["tp"], out[0.9]["fp"], out[0.9]["fn"]) == (1, 0, 2)
    assert out[0.9]["precision_unat"] == 1000000
    assert out[0.9]["recall_unat"] == 333333
    assert (out[0.8]["tp"], out[0.8]["fp"]) == (2, 1)
    assert out[0.8]["precision_unat"] == 666666
    assert (out[0.4]["tp"], out[0.4]["fp"], out[0.4]["fn"]) == (3, 2, 0)
    assert out[0.4]["recall_unat"] == 1000000


def test_pr_threshold_sweep_partition_independent_and_guards(spark):
    rows = [(float(i % 10) / 10.0, i % 3 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, ["score", "label"])
    a = sorted(map(tuple, pr_threshold_sweep(df).collect()))
    b = sorted(map(tuple, pr_threshold_sweep(df.repartition(13)).collect()))
    assert a == b
    with pytest.raises(ValueError, match="positive label"):
        pr_threshold_sweep(spark.createDataFrame([(0.5, 0)], ["score", "label"]))


def test_fleiss_kappa_hand_computed(spark):
    # 3 items x 4 raters, 2 labels:
    # item A: 4x yes          -> cells 4        ; sum sq 16
    # item B: 2 yes 2 no      -> cells 2,2      ; sum sq 8
    # item C: 1 yes 3 no      -> cells 1,3      ; sum sq 10
    # S=34, N=3, n=4: Pbar=(34-12)/(3*4*3)=22/36=0.611111
    # c_yes=7, c_no=5, E=49+25=74; Pe=74/144=0.513889
    # kappa=(0.611111-0.513889)/(1-0.513889)=0.2
    rows = (
        [("A", "y")] * 4
        + [("B", "y")] * 2 + [("B", "n")] * 2
        + [("C", "y")] + [("C", "n")] * 3
    )
    df = spark.createDataFrame(rows, ["item", "label"])
    r = fleiss_kappa(df).collect()[0]
    assert (r["n_items"], r["n_raters"]) == (3, 4)
    assert r["pbar_unat"] == 611111
    assert r["pe_unat"] == 513889
    assert r["kappa_unat"] == 200000


def test_fleiss_kappa_guards(spark):
    uneven = spark.createDataFrame(
        [("A", "y"), ("A", "y"), ("B", "y")], ["item", "label"]
    )
    with pytest.raises(ValueError, match="constant rating count"):
        fleiss_kappa(uneven)
    unanimous = spark.createDataFrame(
        [("A", "y"), ("A", "y"), ("B", "y"), ("B", "y")], ["item", "label"]
    )
    with pytest.raises(ValueError, match="same label"):
        fleiss_kappa(unanimous)
    single = spark.createDataFrame([("A", "y"), ("B", "n")], ["item", "label"])
    with pytest.raises(ValueError, match="at least two"):
        fleiss_kappa(single)


def test_calibration_bins_hand_computed(spark):
    from cdf_spark.operators.evaluation import calibration_bins

    rows = [(0.95, 1), (0.92, 1), (0.9, 0), (0.15, 0), (0.12, 1), (1.0, 1)]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(out) == {1, 9}
    b9 = out[9]  # scores .95 .92 .90 1.0 -> micro sum 3770000, pos 3/4
    assert (b9["n"], b9["pos"]) == (4, 3)
    assert b9["avg_score_unat"] == 942500
    assert b9["pos_rate_unat"] == 750000
    assert b9["gap_unat"] == 192500
    b1 = out[1]  # .15 .12 -> avg 135000, pos 1/2
    assert (b1["n"], b1["pos"], b1["avg_score_unat"], b1["pos_rate_unat"]) == (
        2, 1, 135000, 500000,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least 2"):
        calibration_bins(df, n_bins=1)


def test_retrieval_metrics_plan_is_checkpoint_bounded(spark):
    """Regression guard (r14): retrieval_metrics consumes qrels through
    THREE aggregations and the run through the hits join — both inputs
    are eagerly checkpointed, so the FINAL plan re-derives NEITHER
    upstream pipeline (it was 15 shuffles / 5 corpus scans in the
    retrieval_eval_metrics wrapper when the cuts were left lazy)."""
    import tempfile

    from cdf_spark.operators.evaluation import retrieval_metrics

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"tok{i % 7} alpha beta") for i in range(60)], ["doc_id", "text"]
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        # corpus-scale lineage on BOTH inputs, eval-bounded outputs
        run = (
            docs.filter("doc_id % 7 = 0")
            .selectExpr("'q1' AS qid", "doc_id", "doc_id % 10 + 1 AS rk")
        )
        qrels = docs.filter("doc_id % 3 = 0").selectExpr(
            "'q1' AS qid", "doc_id", "1 AS grade"
        )
        out = retrieval_metrics(run, qrels, k=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "inputs must be checkpointed, not re-derived"
        assert plan.count("Exchange") <= 6
        assert out.count() == 1
