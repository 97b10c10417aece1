"""Evaluation analytics: retrieval quality metrics (MRR / recall@k /
nDCG@k), classifier precision-recall threshold sweeps, and
inter-annotator agreement (Fleiss' kappa).

Why this lives in a data-curation engine: every stage this suite
builds — BM25/ANN retrieval, quality classifiers, preference data —
ships with an EVALUATION loop. Retrieval runs are graded against
qrels (TREC discipline: MRR, recall@k, nDCG@k); model-based filters
are tuned by sweeping the decision threshold over a labeled sample
(the precision-recall curve IS the knob); human labels feeding
Bradley-Terry / reward models are accepted or rejected on
inter-annotator agreement (Fleiss 1971 for n raters). The reference's
surface has contract verdict summaries (`crates/cdf-contract`); these
operators generalize "did the data pass" to "how good is the system
that produced it", the same beyond-ref direction as the retrieval and
preference families.

Determinism discipline (the house rule): every metric leaf is either
pure integer arithmetic (reciprocal ranks and recalls are integer
floor-divisions in micro-units) or ONE double expression over exact
integer inputs with identical operand order on both engines, rounded
to micro-units at the leaf (the BM25/kappa pattern) — so per-query
sums are exact integer sums, immune to partition order, and a DuckDB
oracle replays everything bit-for-bit.

Scale posture (a 100 TB corpus evaluated continuously):
- `retrieval_metrics`: the run is a top-k cut (O(queries x k) by
  construction); qrels join on (qid, doc) and the per-query aggs are
  map-side combinable. The ideal-DCG ranking windows by qid — bounded
  by the eval set's per-query judgment count, never corpus-sized.
- `pr_threshold_sweep`: thresholds are the DISTINCT scores, cumulated
  in descending score order by the suite's two-phase exact-cumsum
  pattern (`packing.token_budget_sample`): range-repartition tiles
  the score order across partitions, an O(partitions) driver collect
  turns subtotals into offsets, and a per-partition local window
  finishes — no single-reducer global window at any cardinality.
- `fleiss_kappa`: two map-side-combinable count aggregations
  (item x label, then label) + 1-row bounded collects; the kappa
  itself is one double expression over five exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _dcg_partial_unat(grade, rank) -> F.Column:
    """round(grade * 1e6 / (ln(rank + 1.0) / ln(2.0))) — the graded
    log2-discounted gain in integer micro-units, operand order
    mirrored token for token by the SQL oracle."""
    return F.round(
        grade.cast("double")
        * F.lit(1000000.0)
        / (F.log(rank.cast("double") + F.lit(1.0)) / F.log(F.lit(2.0)))
    ).cast("long")


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    rank_col: str = "rk",
    grade_col: str = "grade",
) -> DataFrame:
    """Grade a retrieval run against relevance judgments — the TREC
    evaluation loop for the suite's BM25/ANN/hybrid retrievers.

    ``run``: (qid, doc, rank) — a top-k cut from any retriever.
    ``qrels``: (qid, doc, grade) with positive integer grades; docs
    absent from qrels are irrelevant (grade 0), the standard pooling
    assumption.

    Returns one row per qid IN QRELS (a query the run skipped scores
    zero, honestly): (qid, rel_total, hits, mrr_unat, recall_unat,
    ndcg_unat) where mrr_unat = 1e6 DIV first-relevant-rank (NULL when
    nothing relevant was retrieved), recall_unat = hits*1e6 DIV
    rel_total, and ndcg_unat = DCG*1e6 DIV ideal-DCG with both DCGs
    exact integer sums of micro-unit log2-discounted partials (ideal
    ranking ties break by doc id ascending, pinned on both engines).
    """
    if k < 1:
        raise ValueError("k must be positive")
    # Both inputs are eval-set-bounded BY CONTRACT (the run is a top-k
    # cut, qrels are human/pooled judgments) but their LINEAGE is not:
    # a run arrives as a whole retriever pipeline and qrels often as a
    # corpus-scale derivation. qr feeds THREE consumers below (hits,
    # ideal, totals) and r's subtree is re-entered through the hits
    # join — left lazy, the final plan re-derives each upstream
    # pipeline per consumer (measured r13: 15 shuffles / 5 corpus scans
    # in the retrieval_eval_metrics wrapper). Eager checkpoints pin the
    # tiny normalized cuts once — the PRF/MMR discipline
    # (`retrieval.bm25_prf_expand`), guarded by
    # tests/test_evaluation.py::test_retrieval_metrics_plan_is_checkpoint_bounded.
    r = (
        run.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("_id"),
            F.col(rank_col).cast("long").alias("_rk"),
        )
        .filter(F.col("_rk") <= k)
        .localCheckpoint(eager=True)
    )
    qr = (
        qrels.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("_id"),
            F.col(grade_col).cast("long").alias("_g"),
        )
        .filter(F.col("_g") > 0)
        .localCheckpoint(eager=True)
    )

    hits = r.join(qr, on=["qid", "_id"]).select(
        "qid", "_rk", _dcg_partial_unat(F.col("_g"), F.col("_rk")).alias("_p")
    )
    got = hits.groupBy("qid").agg(
        F.count(F.lit(1)).alias("hits"),
        F.min("_rk").alias("_minrk"),
        F.sum("_p").alias("_dcg"),
    )
    iw = Window.partitionBy("qid").orderBy(F.col("_g").desc(), F.col("_id").asc())
    ideal = (
        qr.withColumn("_irk", F.row_number().over(iw))
        .filter(F.col("_irk") <= k)
        .select("qid", _dcg_partial_unat(F.col("_g"), F.col("_irk")).alias("_ip"))
        .groupBy("qid")
        .agg(F.sum("_ip").alias("_idcg"))
    )
    totals = qr.groupBy("qid").agg(F.count(F.lit(1)).alias("rel_total"))
    return (
        totals.join(ideal, on="qid")
        .join(got, on="qid", how="left")
        .select(
            "qid",
            "rel_total",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.expr(f"{MICRO} div _minrk").alias("mrr_unat"),
            F.expr(f"coalesce(hits, 0) * {MICRO} div rel_total").alias("recall_unat"),
            F.expr(f"coalesce(_dcg, 0) * {MICRO} div _idcg").alias("ndcg_unat"),
        )
    )


def pr_threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision-recall curve over every distinct score threshold —
    the tuning loop for model-based filters (`quality_clf_filter`):
    predict positive when score >= threshold, one output row per
    distinct score with exact integer confusion counts.

    Returns (threshold, tp, fp, fn, precision_unat, recall_unat)
    where precision/recall are integer micro-unit floor divisions.
    Raises when the sample carries no positive labels (a PR curve
    over zero positives is undefined, not zero).

    Scale: one groupBy(score) compresses the sample to its distinct
    scores; the descending cumulation is the suite's two-phase exact
    cumsum — range-repartition on score desc, O(partitions) driver
    offsets, per-partition local window. No global single-partition
    window at any score cardinality.
    """
    sc = F.col(score_col).cast("double")
    g = (
        scored
        # NULL/NaN scores and NULL labels are missing-rate concerns,
        # excluded like the calibration/PSI siblings — a NULL score
        # must not become a phantom threshold nor skew total positives
        .filter(sc.isNotNull() & ~F.isnan(sc) & F.col(label_col).isNotNull())
        .select(
            F.col(score_col).alias("threshold"),
            F.col(label_col).cast("long").alias("_l"),
        )
        .groupBy("threshold")
        .agg(F.sum("_l").alias("_pos"), F.count(F.lit(1)).alias("_tot"))
    )
    spark = scored.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    # eager checkpoint pins the range partitioning across the offsets
    # action and the output action (and runs the grouping once)
    keyed = (
        g.repartitionByRange(n_parts, F.col("threshold").desc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotals = (
        keyed.groupBy("_pid")
        .agg(F.sum("_pos").alias("_p"), F.sum("_tot").alias("_t"))
        .collect()
    )
    total_pos = sum(int(r._p) for r in subtotals)
    if total_pos == 0:
        raise ValueError("pr_threshold_sweep needs at least one positive label")
    offsets, pos_acc, tot_acc = [], 0, 0
    for r in sorted(subtotals, key=lambda r: r._pid):
        offsets.append((int(r._pid), pos_acc, tot_acc))
        pos_acc += int(r._p)
        tot_acc += int(r._t)
    off_df = spark.createDataFrame(offsets, "_pid int, _pos_off long, _tot_off long")
    w = Window.partitionBy("_pid").orderBy(F.col("threshold").desc())
    cum = (
        keyed.join(F.broadcast(off_df), on="_pid")
        .withColumn("tp", F.col("_pos_off") + F.sum("_pos").over(w))
        .withColumn("_ctot", F.col("_tot_off") + F.sum("_tot").over(w))
    )
    return cum.select(
        "threshold",
        "tp",
        (F.col("_ctot") - F.col("tp")).alias("fp"),
        (F.lit(total_pos) - F.col("tp")).alias("fn"),
        F.expr(f"tp * {MICRO} div _ctot").alias("precision_unat"),
        F.expr(f"tp * {MICRO} div {total_pos}").alias("recall_unat"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971): chance-corrected agreement for n
    raters assigning categorical labels to items — the acceptance
    gate for human-labeled preference/quality data before it feeds
    Bradley-Terry or a reward model.

    ``ratings``: one row per (item, rater assignment); every item
    must carry the SAME number of ratings n >= 2 (the statistic is
    undefined otherwise — refused loudly, never silently averaged).

    Returns one row: (n_items, n_raters, pbar_unat, pe_unat,
    kappa_unat) in integer micro-units. The observed agreement
    P-bar = (S - N*n) / (N*n*(n-1)) with S = sum of squared cell
    counts, and chance agreement P-e = sum_j (c_j / (N*n))^2, are each
    ONE double expression over exact integer aggregates (operand order
    mirrored by the SQL oracle); kappa = (P-bar - P-e) / (1 - P-e).
    Refuses the degenerate all-one-label case (P-e = 1).
    """
    cells = (
        ratings.groupBy(F.col(item_col).alias("_i"), F.col(label_col).alias("_j"))
        .agg(F.count(F.lit(1)).alias("_n"))
        # three consumers below (per-item check, S, label masses) —
        # checkpoint so the ratings scan runs once (the c12 rule)
        .localCheckpoint(eager=True)
    )
    per_item = cells.groupBy("_i").agg(F.sum("_n").alias("_ni"))
    lo, hi, n_items = per_item.agg(
        F.min("_ni"), F.max("_ni"), F.count(F.lit(1))
    ).collect()[0]
    if not n_items:
        raise ValueError("fleiss_kappa: the ratings frame is empty")
    if lo != hi:
        raise ValueError(
            f"fleiss_kappa needs a constant rating count per item (saw {lo}..{hi})"
        )
    n = int(lo)
    if n < 2:
        raise ValueError("fleiss_kappa needs at least two ratings per item")
    N = int(n_items)
    s_val = int(cells.agg(F.sum(F.col("_n") * F.col("_n"))).collect()[0][0])
    e_val = int(
        cells.groupBy("_j")
        .agg(F.sum("_n").alias("_c"))
        .agg(F.sum(F.col("_c") * F.col("_c")))
        .collect()[0][0]
    )
    if e_val == (N * n) ** 2:
        raise ValueError("fleiss_kappa undefined: every rating is the same label")
    spark = ratings.sparkSession
    return spark.createDataFrame(
        [(N, n, s_val, e_val)], "n_items long, n_raters long, _s long, _e long"
    ).select(
        "n_items",
        "n_raters",
        F.round(
            (F.col("_s") - F.lit(N * n)).cast("double")
            / F.lit(float(N * n * (n - 1)))
            * F.lit(1000000.0)
        ).cast("long").alias("pbar_unat"),
        F.round(
            F.col("_e").cast("double") / F.lit(float((N * n) ** 2)) * F.lit(1000000.0)
        ).cast("long").alias("pe_unat"),
        F.round(
            (
                (F.col("_s") - F.lit(N * n)).cast("double") / F.lit(float(N * n * (n - 1)))
                - F.col("_e").cast("double") / F.lit(float((N * n) ** 2))
            )
            / (F.lit(1.0) - F.col("_e").cast("double") / F.lit(float((N * n) ** 2)))
            * F.lit(1000000.0)
        ).cast("long").alias("kappa_unat"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration companion to `pr_threshold_sweep` (a quality filter
    whose 0.9 means 60% is mis-weighted long before its threshold is
    mis-picked; ECE = sum over bins of n_b/N * gap is one aggregate
    away from this output).

    Scores must lie in [0, 1]; bin = min(floor(score * n_bins),
    n_bins - 1) so score 1.0 lands in the top bin. Scores become
    exact micro-unit integers at the leaf (round(score * 1e6)), so
    per-bin sums and both micro-unit rates are exact integer
    arithmetic — order-immune and SQL-replayable.

    Returns one row per non-empty bin: (bin, n, pos,
    avg_score_unat = sum of micro scores DIV n, pos_rate_unat =
    pos * 1e6 DIV n, gap_unat = |pos_rate - avg_score|).
    One map-side-combinable aggregation; O(n_bins) output.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be at least 2")
    s = F.col(score_col).cast("double")
    # NULL/NaN scores AND NULL labels are missing-rate concerns,
    # excluded like the pr_threshold_sweep sibling (a NULL label would
    # count into n but not pos, silently deflating the positive rate);
    # a NON-NULL score outside [0, 1] is a caller bug — raise in the
    # expression (the cid-packing rule), never a silent edge-bin merge
    scored = scored.filter(
        s.isNotNull() & ~F.isnan(s) & F.col(label_col).isNotNull()
    )
    s = F.when((s >= 0.0) & (s <= 1.0), s).otherwise(
        F.raise_error(F.lit("calibration_bins: score outside [0, 1]"))
    )
    binned = scored.select(
        F.least(F.floor(s * n_bins).cast("long"), F.lit(n_bins - 1)).alias("bin"),
        F.round(s * F.lit(1000000.0)).cast("long").alias("_su"),
        F.col(label_col).cast("long").alias("_l"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_l").alias("pos"),
            F.sum("_su").alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "pos",
            F.expr("_ssum div n").alias("avg_score_unat"),
            F.expr(f"pos * {MICRO} div n").alias("pos_rate_unat"),
            F.expr(f"abs(pos * {MICRO} div n - _ssum div n)").alias("gap_unat"),
        )
    )
