"""Distributed Naive Bayes text classification — train AND score as
pure relational aggregation.

The missing member of the model-training trio this suite builds
(BPE tokenizer training in `operators/bpe.py`, n-gram LM training in
`operators/curation.py`): a multinomial Naive Bayes classifier — the
jar-free relational analog of fastText's linear text classifier, the
standard language-ID / quality-label stage of an LLM data pipeline
(CCNet classifies language before perplexity bucketing; DCLM/FineWeb
gate on a trained quality classifier).

Why Naive Bayes and not logistic regression: NB training is CLOSED
FORM — per-(label, token) counts plus per-label totals, i.e. two
map-side-combinable aggregations. No iterations, no gradient state,
no driver round-trips; the whole fit is one Spark job at any corpus
size. That makes it the honest 100 TB choice AND exactly replayable
in ANSI SQL, so the oracle gate verifies the full train+predict
pipeline end to end.

Determinism discipline (why this oracles exactly): every log-prob is
scaled to integer MICRO-NATS — round(ln(...) * 1e6) AS BIGINT — at
the leaf, the same trick `lm_perplexity_scores` proves out; per-doc
per-label sums are exact integer arithmetic, immune to float
summation order across partitions/engines, and the argmax over
labels compares integers (ties broken by label asc).

Reference frame: the reference's contract layer classifies rows by
declarative rules (`crates/cdf-contract/src/policy.rs`); a trained
classifier is the beyond-ref generalization its curation story needs.

Scale posture (100 TB corpus):
- train: tokenize+explode is a narrow map; ONE groupBy on
  (label, token) with map-side partial aggregation — the model is
  O(vocab × labels) rows, a fixed-size artifact like the LM vocab.
- predict: the model broadcast-joins back to the token stream
  (tokens × |labels| candidate scores via a broadcast of the tiny
  label list), one groupBy on (doc, label), one per-doc window for
  the argmax. 2 shuffles total, zero Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from .index_base import IndexArtifact

MICRO = 1_000_000.0


def _toks(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One token row per (doc, token) occurrence — the shared
    lowercase [a-z0-9]+ tokenizer every text op in this suite uses
    (so a classifier trained here scores the same token stream the
    LM and BPE stages see)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("tok"),
    )


def _unat(ln_col: Column) -> Column:
    """Integer micro-nats: round(ln * 1e6) AS BIGINT — the exact
    cross-engine aggregation currency."""
    return F.round(ln_col * F.lit(MICRO)).cast("long")


def _fit(df: DataFrame, text_col: str, label_col: str):
    """Shared closed-form fit: returns (counts, n_label, v) — the
    per-(label, token) occurrence table, per-label token totals, and
    the global vocabulary size. One tokenize pass + one groupBy; the
    totals are a second tiny agg over the counts table (rows = vocab,
    not corpus)."""
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("tok"),
    )
    counts = toks.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("c"))
    # the counts table fans out to THREE consumers (model, per-label
    # totals, OOV floors) — without truncation Spark re-tokenizes the
    # corpus once per consumer (~4 corpus scans in the executed plan).
    # An eager localCheckpoint materializes the O(vocab x labels)
    # table once, so every consumer reads the checkpoint: exactly one
    # corpus tokenize pass no matter how the model is consumed. (The
    # fit already pays one action here for the vocab size, so the
    # checkpoint adds no extra job.) Tradeoff, stated: the checkpoint
    # block (bounded by vocabulary size, a few MB) stays pinned in
    # executor storage for the session — a session that re-fits in a
    # tight loop should prefer NBIndex, whose model lives on disk.
    counts = counts.localCheckpoint(eager=True)
    v = counts.select("tok").distinct().count()
    n_label = counts.groupBy("label").agg(F.sum("c").alias("n_label"))
    return counts, n_label, v


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Fit a multinomial NB model: one row per (label, token) with
    the add-one-smoothed log P(token | label) in integer micro-nats.

    Output: (label, tok, c, lp_unat) where
    lp_unat = round(ln((c+1)/(N_label+V)) * 1e6), N_label = token
    occurrences under the label, V = GLOBAL vocabulary size (shared
    smoothing denominator across labels, the textbook estimator).

    The model table is O(vocab × labels) — a broadcastable fixed-size
    artifact at any corpus scale."""
    counts, n_label, v = _fit(df, text_col, label_col)
    return (
        counts.join(F.broadcast(n_label), on="label")
        .select(
            "label",
            "tok",
            "c",
            _unat(
                F.log(F.col("c") + F.lit(1.0))
                - F.log(F.col("n_label").cast("double") + F.lit(float(v)))
            ).alias("lp_unat"),
        )
    )


def nb_predict(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on the labeled corpus and score every document:
    predicted label = argmax_label [ ln P(label) + Σ_tok ln P(tok|label) ],
    all terms in integer micro-nats, OOV tokens under a label falling
    back to the smoothed floor ln(1/(N_label+V)).

    Output: (id, label, predicted, score_unat, margin_unat) — `label`
    is the training label (so accuracy is one agg away), margin is the
    integer gap to the runner-up (0 when only one label exists).

    Shape: token stream × broadcast(label list) candidate pairs,
    left-join the broadcast model on (label, tok), coalesce to the
    per-label OOV floor, groupBy (doc, candidate) integer sum + prior,
    per-doc window argmax. 2 shuffles + broadcasts, zero Python.

    The training label RIDES the token stream (guide §2.4, r14):
    label is functionally dependent on the doc id, so carrying it
    through the explode and the (doc, label) agg key is free — the
    earlier `ranked ⋈ truth` re-join on doc_id was a corpus-scale
    SortMergeJoin (2 exchanges + 1 extra document scan) that existed
    only to re-attach a column the scan already had.

    ONE corpus tokenize feeds train AND predict (guide §1.2, r14):
    train-and-score used to tokenize the corpus twice — once in the
    fit's (label, token) count, once in the scoring stream. The
    per-(doc, label, token) tf table subsumes both: summing tf by
    (label, token) IS the fit's occurrence count, and scoring weights
    each distinct (doc, token) row by tf (Σ over occurrences of
    lp == tf · lp exactly — integer micro-nats), which also shrinks
    the token × label candidate fan-out from per-occurrence to
    per-distinct-token rows before the scoring aggregate (§2.3)."""
    # the total document count RIDES the tokd pin as an observed
    # metric over the pre-explode (one row per doc, zero-token docs
    # included) projection — the separate df.count() was one more
    # full-corpus job (r14, the §9.3 observe-on-checkpoint pattern)
    obs = Observation()
    tokd = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).alias("label"),
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
            ).alias("_ts"),
        )
        .observe(obs, F.count(F.lit(1)).alias("d_tot"))
        .select("_id", "label", F.explode("_ts").alias("tok"))
        .groupBy("_id", "label", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    counts = (
        tokd.groupBy("label", "tok").agg(F.sum("tf").alias("c")).localCheckpoint(eager=True)
    )
    v = counts.select("tok").distinct().count()
    n_label = counts.groupBy("label").agg(F.sum("c").alias("n_label"))
    d_tot = int(obs.get["d_tot"])
    doc_counts = df.groupBy(F.col(label_col).alias("_cand")).agg(
        F.count(F.lit(1)).alias("d_l")
    )
    model, lab = _model_tables(
        counts.withColumnRenamed("label", "_cand"),
        n_label.withColumnRenamed("label", "_cand"),
        v,
        doc_counts,
        math.log(d_tot),
    )
    # lab feeds two broadcast builds in _score (OOV floors + priors);
    # left lazy each re-runs the doc_counts scan — the pin is
    # O(labels) rows
    lab = lab.localCheckpoint(eager=True)
    return _score(tokd, model, lab, id_col, carry=("label",), weight="tf").select(
        id_col, "label", "predicted", "score_unat", "margin_unat"
    )


def _model_tables(counts, n_label, v: int, doc_counts, ln_d_tot: float):
    """The two broadcastable model tables from the fitted counts:
    `model` = (_cand, tok, lp_unat) add-one log-probs, `lab` =
    (_cand, prior_unat, oov_unat) priors + smoothed OOV floors. Shared
    by the one-shot fit and the persisted index so the scoring rule
    can never diverge between them (the bit-identity the incremental
    oracle relies on)."""
    model = counts.join(F.broadcast(n_label), on="_cand").select(
        "_cand",
        "tok",
        _unat(
            F.log(F.col("c") + F.lit(1.0))
            - F.log(F.col("n_label").cast("double") + F.lit(float(v)))
        ).alias("lp_unat"),
    )
    lab = doc_counts.join(F.broadcast(n_label), on="_cand").select(
        "_cand",
        _unat(F.log(F.col("d_l").cast("double")) - F.lit(ln_d_tot)).alias(
            "prior_unat"
        ),
        _unat(-F.log(F.col("n_label").cast("double") + F.lit(float(v)))).alias(
            "oov_unat"
        ),
    )
    return model, lab


def _score(
    toks: DataFrame, model, lab, id_col: str, carry: tuple = (), weight: str | None = None
) -> DataFrame:
    """Score a token stream against broadcast model tables and take
    the per-doc argmax: token x label candidates, left-join the model
    with the per-label OOV floor, one (doc, label) integer-sum agg,
    one per-doc window. Output (id, *carry, predicted, score_unat,
    margin_unat). `carry` names token-stream columns functionally
    dependent on the doc id (e.g. the training label) that ride the
    agg key instead of being re-joined afterwards — free in the agg
    (cardinality unchanged), saves the caller a doc-level join.
    `weight` names an integer term-frequency column when `toks` is a
    pre-aggregated (doc, token, tf) table instead of per-occurrence
    rows: Σ over tf occurrences of lp == tf · lp exactly (integer
    micro-nats), so both forms score bit-identically."""
    carry = list(carry)
    per_tok = F.coalesce(F.col("lp_unat"), F.col("oov_unat"))
    contrib = per_tok if weight is None else F.col(weight) * per_tok
    scored = (
        toks.crossJoin(F.broadcast(lab.select("_cand", "oov_unat")))
        .join(F.broadcast(model), on=["_cand", "tok"], how="left")
        .groupBy("_id", *carry, "_cand")
        .agg(F.sum(contrib).alias("_s"))
        .join(F.broadcast(lab.select("_cand", "prior_unat")), on="_cand")
        .select(
            "_id",
            *carry,
            "_cand",
            (F.col("_s") + F.col("prior_unat")).alias("score_unat"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score_unat").desc(), F.col("_cand").asc()
    )
    return (
        scored.select(
            "_id",
            *carry,
            "_cand",
            "score_unat",
            F.row_number().over(w).alias("_rn"),
            (F.col("score_unat") - F.lead("score_unat", 1, None).over(w)).alias("_gap"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            *carry,
            F.col("_cand").alias("predicted"),
            "score_unat",
            F.coalesce(F.col("_gap"), F.lit(0)).cast("long").alias("margin_unat"),
        )
    )


class NBIndex(IndexArtifact):
    """Persisted INCREMENTAL Naive Bayes model for a GROWING corpus —
    the classifier member of this suite's incremental-index family
    (`curation.LMIndex` for LM scores, `curation.ExactSubstrIndex` and
    `dedup_approx.MinHashLSHIndex` for dedup): `nb_predict` re-fits
    over the whole corpus per call, the wrong shape under continuous
    ingestion. NB sufficient statistics are pure counts, so folding a
    batch is exact: per-(label, token) occurrence counts and per-label
    document counts ADD — the fully-folded index is bit-identical to a
    one-shot fit, which is what lets the incremental query share the
    one-shot SQL oracle.

    Layout under `root/`: `counts_v<N>/` parquet (label, tok, c),
    `labels_v<N>/` parquet (label, d_l) + `meta.json` {version, v,
    d_tot} — updates write the NEXT version directories and swap the
    meta pointer last, so a crashed update leaves the previous version
    live (the suite's staged-commit discipline). update() is O(batch)
    token work + an O(vocab x labels) merge rewrite, amortized
    constant for a bounded vocabulary; predict() touches only the
    stored model and the scored batch."""

    def update(
        self,
        spark,
        df: DataFrame,
        text_col: str = "text",
        label_col: str = "lang",
        epoch: int | None = None,
    ) -> dict:
        """Fold a labeled batch. `epoch` is the AT-LEAST-ONCE fence for
        streaming folds (foreachBatch retries redeliver a batch): an
        epoch at or below the recorded watermark is skipped, so a
        replayed fold cannot double its counts — NB counts are not
        idempotent under re-addition, the fence is what makes the
        streaming drain exactly-once. foreachBatch epoch ids are
        monotone, so the watermark is one integer (O(1) meta at any
        epoch count), the checkpoint-ledger discipline the streaming
        destinations already use."""
        meta0 = self._meta()
        if (
            epoch is not None
            and meta0 is not None
            and int(epoch) <= meta0.get("last_epoch", -1)
        ):
            return meta0  # replayed fold — already counted
        batch = (
            df.select(
                F.col(label_col).alias("label"),
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                        lambda x: x != "",
                    )
                ).alias("tok"),
            )
            .groupBy("label", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        bdocs = df.groupBy(F.col(label_col).alias("label")).agg(
            F.count(F.lit(1)).alias("d_l")
        )
        meta = meta0
        if meta is None:
            merged, mdocs, version = batch, bdocs, 1
        else:
            cur = spark.read.parquet(str(self.root / f"counts_v{meta['version']}"))
            merged = cur.unionByName(batch).groupBy("label", "tok").agg(
                F.sum("c").alias("c")
            )
            curd = spark.read.parquet(str(self.root / f"labels_v{meta['version']}"))
            mdocs = curd.unionByName(bdocs).groupBy("label").agg(
                F.sum("d_l").alias("d_l")
            )
            version = int(meta["version"]) + 1
        outc, outl = self.root / f"counts_v{version}", self.root / f"labels_v{version}"
        merged.write.mode("overwrite").parquet(str(outc))
        mdocs.write.mode("overwrite").parquet(str(outl))
        v = spark.read.parquet(str(outc)).select("tok").distinct().count()
        d_tot = spark.read.parquet(str(outl)).agg(F.sum("d_l")).collect()[0][0]
        last = (meta or {}).get("last_epoch", -1)
        new_meta = {
            "version": version,
            "v": int(v),
            "d_tot": int(d_tot),
            "last_epoch": int(epoch) if epoch is not None else last,
        }
        self._swap_meta(new_meta)
        self._reclaim(version)
        return new_meta

    def _reclaim(self, live_version: int) -> None:
        """Drop superseded version directories after the meta swap,
        keeping live and live-1 (a reader that loaded the previous
        meta an instant before the swap may still be scanning N-1).
        Also sweeps any orphaned FUTURE dirs a crash left between the
        parquet writes and a meta swap that never happened — without
        this, a streaming drain (one fold per epoch) accumulates
        O(vocab x labels) parquet copies without bound."""
        import shutil

        for d in self.root.iterdir():
            if not d.is_dir():
                continue
            for prefix in ("counts_v", "labels_v"):
                if d.name.startswith(prefix):
                    try:
                        ver = int(d.name[len(prefix):])
                    except ValueError:
                        continue
                    if ver < live_version - 1 or ver > live_version:
                        shutil.rmtree(d, ignore_errors=True)

    def predict(
        self,
        spark,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise ValueError("NBIndex is empty — update() first")
        v = int(meta["v"])
        counts = spark.read.parquet(str(self.root / f"counts_v{meta['version']}"))
        docs_l = spark.read.parquet(str(self.root / f"labels_v{meta['version']}"))
        counts = counts.withColumnRenamed("label", "_cand")
        n_label = counts.groupBy("_cand").agg(F.sum("c").alias("n_label"))
        model, lab = _model_tables(
            counts,
            n_label,
            v,
            docs_l.withColumnRenamed("label", "_cand"),
            math.log(int(meta["d_tot"])),
        )
        return _score(_toks(df, text_col, id_col), model, lab, id_col)
