"""Corpus-curation operators: decontamination, repetition signals, PII.

Beyond-reference operators a large-scale training-data pipeline needs
(SURVEY §7 step 8 family, alongside operators/text.py and
operators/dedup_approx.py). All three follow the house rules:

- pure `pyspark.sql.functions` expressions (whole-stage codegen, zero
  Python in the row path),
- every construction has an exact ANSI-SQL twin for the DuckDB oracle
  (md5-derived hashing, explicit rounding, deterministic tie-breaks).

Scale notes (100 TB):
- decontamination: the eval/benchmark side is tiny (thousands of docs)
  versus the corpus — its distinct n-gram set is broadcast, so the
  corpus side is scanned once with a map-side join; the only shuffle
  is the per-doc hit aggregation (map-side partial combine applies).
- repetition / PII: narrow per-row projections, no shuffle at all;
  cost is O(doc length) per row regardless of corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import pinned_scalars
from .index_base import IndexArtifact
from .text import hash64, spread_compute

MICRO = 1_000_000.0

# ---------------------------------------------------------------------------
# word n-grams


def _gram_join(toks: Column, n: int) -> Column:
    """Overlapping word n-grams of a token array, re-joined with a
    single space. Guarded: docs shorter than n yield an empty array —
    NB `sequence(1, greatest(len-n+1, 0))` is NOT safe for that case
    (Spark infers a descending step, yielding [1, 0] and a slice(0)
    error)."""
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Overlapping word n-grams of single-space-separated text, as
    strings re-joined with a single space. Empty-safe: shorter docs
    yield an empty array."""
    toks = F.filter(F.split(F.trim(col), " "), lambda t: F.length(t) > 0)
    return _gram_join(toks, n)


def word_ngram_hashes(col: Column, n: int = 5, hash_fn: str = "md5") -> Column:
    """Distinct 60/64-bit hashes of the word n-grams — the join key
    for decontamination. hash_fn="md5" is the SQL-parity construction
    (`hash64`) the oracle reproduces; "xxhash64" is the JVM-native
    fast path (~3× cheaper per gram) for deployment — identical join
    semantics barring hash collisions."""
    # NOTE (r6): a word-hash-then-combine construction (hash each word
    # once, xxhash64 over n consecutive longs, no gram string) measured
    # 3.7x SLOWER than this one: Catalyst does not CSE a captured array
    # expression across higher-order-function lambdas, so the word-hash
    # array was recomputed per gram — O(words^2). Gram-string hashing
    # keeps the plan linear.
    grams = word_ngrams(col, n)
    if hash_fn == "xxhash64":
        return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))
    return F.array_distinct(F.transform(grams, hash64))


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontamination_overlap(
    candidates: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.05,
    hash_fn: str = "md5",
) -> DataFrame:
    """Benchmark decontamination: for each candidate document, the
    fraction of its word n-grams that also occur anywhere in the
    eval/benchmark set (the standard train-set hygiene check before
    pretraining — e.g. 13-gram overlap in GPT-3/PaLM data cards; n is
    a parameter here).

    Returns (id, n_grams, hits, overlap_frac, contaminated) for every
    candidate that has at least one n-gram, ordered semantics left to
    the caller.

    Plan shape: the eval side is reduced to its distinct gram-hash set
    and broadcast (benchmarks are ≤ millions of grams — MBs — versus a
    100 TB corpus), so candidates are scanned once; explode → broadcast
    left-semi-style join → per-doc count with map-side partial agg.

    Parallelism guard: gram hashing is compute-bound (~1 ms/doc), and a
    small corpus file arrives as ONE input split — measured 4s single
    -core at sf0.1 with zero warm-up gain. When the scan's parallelism
    is below shuffle.partitions, the candidate text is spread first; at
    real scale the input already has thousands of splits and the guard
    is a no-op (no shuffle added).
    """
    candidates = spread_compute(candidates)  # r14: the shared guard
    # NO .filter(n_grams > 0): the explode below already yields zero
    # rows for gram-less docs (identical output), and the filter was
    # actively harmful — Catalyst pushed it below the spread exchange,
    # dragging the whole gram-hash expression into the single-split
    # scan stage AND re-evaluating it after the shuffle (r14; the
    # pure-JVM analog of guide §4.4's duplicated-UDF pushdown).
    cand = candidates.select(
        F.col(id_col).alias("id"),
        word_ngram_hashes(F.col(text_col), n, hash_fn).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))

    eval_grams = (
        eval_set.select(F.explode(word_ngram_hashes(F.col(text_col), n, hash_fn)).alias("g"))
        .distinct()
    )

    exploded = cand.select("id", "n_grams", F.explode("grams").alias("g"))
    hits = (
        exploded.join(
            F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), on="g", how="left"
        )
        .groupBy("id", "n_grams")
        .agg(F.count("_hit").alias("hits"))  # count() skips nulls = matched grams
    )
    return hits.select(
        F.col("id").alias(id_col),
        "n_grams",
        "hits",
        F.round(F.col("hits").cast("double") / F.col("n_grams"), 6).alias("overlap_frac"),
        (F.col("hits").cast("double") / F.col("n_grams") >= threshold).alias("contaminated"),
    )


def decontamination_pairs(
    candidates: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    n: int = 4,
    threshold: float = 0.1,
    hash_fn: str = "md5",
) -> DataFrame:
    """PER-PAIR decontamination report — `decontamination_overlap`
    pools the eval set into one gram bag and answers "is this doc
    contaminated"; a data card also needs WHICH benchmark item leaked
    into WHICH training doc and how badly. For every (candidate, eval
    item) pair sharing >= 1 distinct n-gram: the shared-gram count and
    exact Jaccard over distinct gram sets, flagged at `threshold`.

    Plan shape: same broadcast discipline — the eval side (bounded by
    benchmark size, never by corpus size) explodes to (eval_id, gram)
    and BROADCASTS; candidates explode once and equi-join on the gram
    hash, then ONE per-(doc, eval) aggregation. Output is sparse:
    pairs with zero shared grams never materialize.

    Output: (id_col, eval_id_col, n_shared, jaccard, contaminated).
    """
    # no size>0 filters: explode + inner join already drop gram-less
    # docs (identical output; the filters pushed the gram-hash below
    # the scan exchange — see decontamination_overlap, r14)
    cand = candidates.select(
        F.col(id_col).alias("_id"),
        word_ngram_hashes(F.col(text_col), n, hash_fn).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    ev = eval_set.select(
        F.col(eval_id_col).alias("_eid"),
        word_ngram_hashes(F.col(text_col), n, hash_fn).alias("egrams"),
    ).withColumn("n_eval", F.size("egrams"))
    ev_ex = ev.select("_eid", "n_eval", F.explode("egrams").alias("g"))
    cand_ex = cand.select("_id", "n_grams", F.explode("grams").alias("g"))
    pairs = (
        cand_ex.join(F.broadcast(ev_ex), on="g")
        .groupBy("_id", "_eid", "n_grams", "n_eval")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_grams") + F.col("n_eval") - F.col("n_shared")
    ).cast("double")
    return pairs.select(
        F.col("_id").alias(id_col),
        F.col("_eid").alias(eval_id_col),
        "n_shared",
        F.round(jac, 6).alias("jaccard"),
        (F.round(jac, 6) >= threshold).alias("contaminated"),
    )


def embedding_decontamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    eval_id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """EMBEDDING-SPACE decontamination — the semantic sibling of the
    n-gram `decontamination_overlap`: n-grams catch verbatim and
    near-verbatim benchmark leakage, but a paraphrased eval item
    shares no 4-gram with its source. Flag every corpus vector whose
    max cosine similarity against ANY eval-set vector reaches
    `threshold` (the SemDeDup/Phi-style semantic-contamination gate).

    Output: (id_col, matched_eval_id, max_sim, contaminated) — one row
    per corpus vector, matched_eval_id = the argmax eval item (ties by
    eval id asc), so the data card can name the leaking benchmark row.

    Scale: the eval set is bounded by benchmark size (thousands), the
    corpus is not — so the eval side BROADCASTS and the corpus streams
    through one narrow crossJoin + per-vector COMBINABLE argmax
    aggregation (`min_by` over the (-sim, eval_id) struct key): the
    corpus×|eval| scored fan is reduced to ONE row per corpus vector
    map-side BEFORE the shuffle, so shuffle volume is corpus-sized —
    a window argmax would have shuffled the full corpus×|eval| blowup
    (×|eval| more IO for the same answer). Cosine parity with the SQL
    oracle follows the suite's proven round(sim, 4) discipline
    (cosine_topk)."""
    from .similarity import cosine

    ev = eval_set.select(
        F.col(eval_id_col).alias("_eid"), F.col(vec_col).alias("_ev")
    )
    # LEFT join on a true condition (not crossJoin): an EMPTY eval set
    # must still yield one row per corpus vector (contaminated=false,
    # null match) — the documented contract; with a non-empty eval set
    # the two are identical
    scored = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_cv"))
        .join(F.broadcast(ev), F.lit(True), "left")
        .select(
            "_id",
            "_eid",
            F.round(cosine(F.col("_cv"), F.col("_ev")), round_to).alias("_sim"),
        )
    )
    # argmax as a COMBINABLE aggregate: min_by over the key struct
    # (-sim, eval_id) picks max sim with ties broken by eval id asc —
    # identical output to the row_number() window, but HashAggregate
    # gets a map-side partial pass, so only one row per corpus vector
    # ever crosses the shuffle (a window ships the full corpus×|eval|
    # fan). The key struct includes _eid, so the key is unique per
    # scored row and the pick is deterministic. Empty-eval-set rows
    # (null _sim/_eid from the left join) still aggregate to one
    # null-match row per vector — the documented contract.
    best = scored.groupBy("_id").agg(
        F.min_by(
            F.struct(F.col("_eid"), F.col("_sim")),
            # null sims (empty eval set / null vectors) rank LAST —
            # same as the former window's `sim DESC` nulls-last order
            F.struct(
                F.coalesce(-F.col("_sim"), F.lit(float("inf"))).alias("_k1"),
                F.col("_eid").alias("_k2"),
            ),
        ).alias("_best")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_best._eid").alias("matched_eval_id"),
        F.col("_best._sim").alias("max_sim"),
        F.coalesce(F.col("_best._sim") >= F.lit(threshold), F.lit(False)).alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# repetition / lexical-diversity signals (Gopher-style quality rules)


def _top_run_count(arr: Column) -> Column:
    """Count of the most frequent element of a string array, computed
    per row as array_sort + one run-length fold — O(n log n) in the
    array length, no explode, no shuffle. (A naive nested scan —
    `transform(distinct, w -> count-in-array)` — is O(types × tokens)
    per row and measured 30× slower on long documents; an
    explode→groupBy shape works but shuffles every token string.)
    Assumes elements are non-empty strings (tokenizers here guarantee
    it); empty arrays yield 0."""
    run1 = F.lit(1).cast("long")

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(run1)
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    return F.aggregate(F.array_sort(arr), acc0, step, lambda a: a["best"])


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition and lexical-diversity signals, the
    Gopher/RefinedWeb-style quality rules that catch boilerplate and
    degenerate (looping) text:

    - distinct_word_ratio: |types| / |tokens| (type-token ratio),
    - top_word_frac: count of the most frequent word / |tokens|,
    - dup_2gram_frac: 1 − |distinct 2-grams| / |2-grams|,
    - top_2gram_frac: count of the most frequent 2-gram / |2-grams|,
    - keep: drop verdict when repetition dominates (fixed thresholds).

    All ratios round(…, 6); docs with no tokens yield zero ratios and
    therefore keep = false (empty text fails the diversity rule —
    consistent across engines).

    Shape: a pure per-row projection — token/gram arrays sorted and
    run-length-folded in place. Zero shuffles, embarrassingly parallel,
    per-doc cost bounded by document length: the form that holds at
    100 TB. A repartition spreads the compute-bound scan across cores
    when the input arrives in few splits.
    """
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.filter(F.split(F.trim(F.col(text_col)), " "), lambda t: F.length(t) > 0)
    base = (
        df.repartition(nparts)
        .select(F.col(id_col).alias("id"), toks.alias("_ts"))
        .withColumn("_gs", _gram_join(F.col("_ts"), 2))
    )
    nt = F.size("_ts")
    ng = F.size("_gs")
    z = F.lit(0.0)
    dwr = F.round(
        F.when(nt > 0, F.size(F.array_distinct("_ts")).cast("double") / nt).otherwise(z), 6
    )
    twf = F.round(
        F.when(nt > 0, _top_run_count(F.col("_ts")).cast("double") / nt).otherwise(z), 6
    )
    d2f = F.round(
        F.when(ng > 0, F.lit(1.0) - F.size(F.array_distinct("_gs")).cast("double") / ng).otherwise(z),
        6,
    )
    t2f = F.round(
        F.when(ng > 0, _top_run_count(F.col("_gs")).cast("double") / ng).otherwise(z), 6
    )
    return base.select(
        F.col("id").alias(id_col),
        nt.cast("long").alias("n_tokens"),
        dwr.alias("distinct_word_ratio"),
        twf.alias("top_word_frac"),
        d2f.alias("dup_2gram_frac"),
        t2f.alias("top_2gram_frac"),
        (~((dwr < 0.2) | (twf > 0.3) | (t2f > 0.18))).alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction

# Dialect-portable patterns (valid and equivalent in Java regex and RE2):
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_counts(col: Column) -> dict[str, Column]:
    """Count email addresses and phone numbers in free text."""
    return {
        "emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        "phones": F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
    }


def pii_redact(col: Column) -> Column:
    """Replace every email with [EMAIL] and every phone with [PHONE].
    Spark's regexp_replace is global by default; the DuckDB twin needs
    the explicit 'g' flag."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )


def scan_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-row PII profile: counts + redacted text + has_pii flag."""
    c = F.col(text_col)
    counts = pii_counts(c)
    return df.select(
        F.col(id_col),
        counts["emails"].alias("emails"),
        counts["phones"].alias("phones"),
        (counts["emails"] + counts["phones"] > 0).alias("has_pii"),
        pii_redact(c).alias("redacted"),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 5,
) -> DataFrame:
    """Exact SPAN dedup at sub-document granularity (the Dolma /
    RefinedWeb paragraph-dedup shape, expressed over fixed `width`-word
    segments because the synthetic corpus has no paragraph breaks):
    every duplicated segment keeps only its FIRST occurrence by
    (doc, position) order; documents are reassembled from their
    surviving segments. Near-boilerplate (repeated headers, footers,
    licence blocks) disappears corpus-wide without dropping whole
    documents.

    Scale shape: one posexplode (no shuffle), ONE shuffle for the
    first-occurrence window over the segment value, one shuffle for
    the per-doc reassembly — same plan family as exact_dedup but at
    segment granularity. Segment values hash-partition evenly (128-bit
    content); a pathological corpus of one repeated segment would skew
    a single key, which AQE splits.

    Output: (id_col, text_deduped, n_segments, n_kept), one row per
    input document (a document whose every segment was seen before
    keeps an empty string — evidence, not silent drop).
    """
    from pyspark.sql import Window

    ws = F.split(F.col(text_col), " ")
    n_seg = F.ceil(F.size(ws) / F.lit(width)).cast("int")
    seg = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(F.slice(ws, i * width + 1, width), " "),
                )
            ).alias("i", "segment"),
        )
    )
    w = Window.partitionBy("segment").orderBy(F.col(id_col), F.col("i"))
    ranked = seg.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") == 1, F.struct(F.col("i"), F.col("segment")))
                        )
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("n_segments"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style rule filter


# Stopword presence list (Rae et al. 2021 use a fixed 8-word list; the
# fixture corpus vocabulary covers this 4-word subset).
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of")


def gopher_rules(
    col: Column,
    *,
    min_words: int = 30,
    max_words: int = 90,
    min_mean_word_len: float = 3.9,
    max_mean_word_len: float = 5.1,
    min_distinct_stopwords: int = 2,
    min_alpha_word_ratio: float = 0.8,
) -> dict[str, Column]:
    """Gopher-style per-document quality rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", appendix A1.1 — the
    rule-based filter every later curation stack inherits): word-count
    bounds, mean-word-length window, minimum distinct stopwords,
    minimum fraction of words containing an alphabetic character.

    Returns named boolean rule columns plus the shared features, all
    in pure built-in arithmetic (split/aggregate/length — identical in
    ANSI SQL) so the oracle replays the thresholds bit-for-bit.
    Zero-shuffle narrow map at any corpus size."""
    trimmed = F.trim(col)
    n_chars = F.length(trimmed)
    n_words = F.when(n_chars == 0, F.lit(0)).otherwise(
        (n_chars - F.length(F.replace(trimmed, F.lit(" "), F.lit("")))).cast("long")
        + 1
    )
    mean_wl = F.round(
        F.when(
            n_words > 0, (n_chars - (n_words - 1)).cast("double") / n_words
        ).otherwise(F.lit(0.0)),
        4,
    )
    words = F.filter(F.split(trimmed, " "), lambda w: F.length(w) > 0)
    alpha_words = F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    alpha_ratio = F.round(
        F.when(
            n_words > 0, F.size(alpha_words).cast("double") / n_words
        ).otherwise(F.lit(0.0)),
        6,
    )
    padded = F.concat(F.lit(" "), trimmed, F.lit(" "))
    n_stop_distinct = sum(
        (
            F.when(F.contains(padded, F.lit(f" {w} ")), F.lit(1)).otherwise(F.lit(0))
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "alpha_word_ratio": alpha_ratio,
        "n_stopwords_distinct": n_stop_distinct.cast("int"),
        "rule_min_words": n_words >= min_words,
        "rule_max_words": n_words <= max_words,
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_stopwords": n_stop_distinct >= min_distinct_stopwords,
        "rule_alpha_words": alpha_ratio >= min_alpha_word_ratio,
    }


def gopher_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply the Gopher rules and emit a disposition per document:
    kept + the FIRST violated rule (fixed evaluation order, so the
    disposition is deterministic and SQL-replayable)."""
    r = gopher_rules(F.col(text_col))
    first_violation = (
        F.when(~r["rule_min_words"], F.lit("min_words"))
        .when(~r["rule_max_words"], F.lit("max_words"))
        .when(~r["rule_mean_word_len"], F.lit("mean_word_len"))
        .when(~r["rule_stopwords"], F.lit("stopwords"))
        .when(~r["rule_alpha_words"], F.lit("alpha_words"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        id_col,
        r["n_words"].alias("n_words"),
        r["mean_word_len"].alias("mean_word_len"),
        r["n_stopwords_distinct"].alias("n_stopwords_distinct"),
        first_violation.isNull().alias("kept"),
        first_violation.alias("first_violation"),
    )


# ---------------------------------------------------------------------------
# linear quality classifier


# Fixed, documented logistic-regression weights over the deterministic
# quality features (operators/text.quality_features). The coefficients
# are illustrative constants — the OPERATOR contract is "score a doc
# with a linear model someone trained elsewhere", which is the
# classifier-filter shape (fastText/DCLM-style) every modern curation
# stack runs after rule filters. Keeping them fixed makes the sigmoid
# bit-replayable in the SQL oracle.
QUALITY_CLF_WEIGHTS: dict[str, float] = {
    "bias": -1.5,
    "n_tokens": 0.02,
    "avg_token_len": 0.35,
    "stopword_ratio": 6.0,
    "punct_ratio": -4.0,
}


def quality_clf_score(col: Column, round_to: int = 6) -> Column:
    """Model-based quality score: sigmoid(w . features + b) over the
    deterministic text features. Pure built-in arithmetic end-to-end
    (exp/round are IEEE-double-identical across Spark and DuckDB, so
    the oracle replays the exact score); zero-shuffle narrow map."""
    from .text import quality_features

    f = quality_features(col)
    w = QUALITY_CLF_WEIGHTS
    z = (
        F.lit(w["bias"])
        + f["n_tokens"].cast("double") * w["n_tokens"]
        + f["avg_token_len"] * w["avg_token_len"]
        + f["stopword_ratio"] * w["stopword_ratio"]
        + f["punct_ratio"] * w["punct_ratio"]
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)


def quality_clf_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.75,
) -> DataFrame:
    """Classifier-based keep/drop with the score carried for
    inspection — the stage that runs AFTER rule filters (gopher_filter)
    in a curation pipeline: rules catch structural garbage, the model
    ranks the remainder."""
    score = quality_clf_score(F.col(text_col))
    return df.select(
        id_col,
        score.alias("clf_score"),
        (score >= threshold).alias("kept"),
    )


def lm_perplexity_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """N-gram LANGUAGE-MODEL quality signal (r10) — the CCNet/Gopher
    curation stage this suite was missing: documents scored by the
    mean negative log-probability of their tokens under a unigram LM
    with add-one smoothing, trained on the corpus itself (CCNet trains
    a 5-gram KenLM on a reference corpus and buckets docs by
    perplexity; a unigram LM over the corpus is the jar-free
    relational analog — same signal shape: gibberish and boilerplate
    score high, fluent text low). Returns (id, n_tokens, nll_bits):
    nll_bits = mean -ln P(token) in 1e-6-bit units / 1e6 — the log2
    perplexity exponent up to the ln->log2 constant.

    Determinism discipline (the reason this oracles exactly): the
    per-token log-prob is computed ONCE as a double, then scaled to
    integer MICRO-NATS (round(ln * 1e6) as BIGINT) BEFORE any
    aggregation — per-doc sums are exact integer arithmetic, immune
    to float summation order across partitions and runs; the single
    final division + round is the only float op after aggregation.
    DuckDB replays the identical pipeline.

    Scale: tokenize + explode is a narrow map; the LM is one groupBy
    on tokens (1 shuffle, map-side combined) whose result joins back
    BROADCAST (a natural-language vocabulary is ~1e5-1e6 rows at any
    corpus size — the fixed-LM property CCNet relies on); per-doc
    aggregation is 1 shuffle on doc id. At 100 TB: 2 shuffles + 1
    broadcast, zero Python anywhere."""
    # ONE corpus tokenize feeds the LM fit, its totals and the scoring
    # pass (r14, guide §1.2 — the lm_bigram pin discipline applied to
    # the unigram LM): the per-(doc, tok) tf table subsumes all three
    # consumers, which used to re-tokenize the corpus each (2 scans in
    # the AQE-final plan + 1 more in the totals collect). Scoring
    # weights each distinct (doc, tok) row by tf — Σ over occurrences
    # of lp == tf · lp exactly in integer micro-nats.
    # NOT size-gated (r15 measured rejection): the interleaved A/B at
    # sf0.1 showed the lazy re-tokenize ~2x SLOWER than the pin
    # (1.74-2.06s vs 1.06-1.08s solo median) — the tokenize+explode is
    # already the dominant cost at bench scale, so the pin crossover
    # sits below sf0.1 and the unconditional pin is correct.
    tokd = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
                )
            ).alias("tok"),
        )
        .groupBy("_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    # vocabulary totals RIDE the counts-pin job as observed metrics
    # (r14, the §9.3 observe-on-checkpoint pattern) — the separate
    # totals agg was one more job over the just-pinned table
    counts, _stats = pinned_scalars(
        tokd.groupBy("tok").agg(F.sum("tf").alias("c")),
        [F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")],
    )
    n_total, v = int(_stats["n_total"]), int(_stats["v"])
    # micro-nat integer log-prob per vocab entry: round(ln((c+1)/(N+V)) * 1e6)
    lm = counts.select(
        "tok",
        F.round(
            (F.log(F.col("c") + F.lit(1.0)) - F.lit(float(__import__("math").log(n_total + v))))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp_unat"),
    )
    scored = (
        tokd.join(F.broadcast(lm), on="tok", how="left")  # corpus-trained: no OOV
        .groupBy("_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_unat")).alias("_sum_unat"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens"),
            F.round(
                -F.col("_sum_unat").cast("double")
                / (F.col("n_tokens").cast("double") * F.lit(1_000_000.0)),
                round_to,
            ).alias("nll_nats"),
        )
    )
    return scored


def lm_bigram_perplexity_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """BIGRAM LM perplexity (r10) — one order up from
    `lm_perplexity_scores`, the n-gram generalization CCNet's 5-gram
    KenLM sits on: each document scored by the mean negative log-prob
    of its token sequence under P(w2|w1) with add-one smoothing over
    the corpus-trained bigram table (first token scored by the unigram
    LM). Fluent word ORDER now matters, not just word choice — a
    bag-of-common-words doc that reads as gibberish scores high here
    and low on the unigram signal.

    Same micro-nat integer discipline as the unigram LM (exact
    order-independent sums, engine-exact oracle). Scale: tokenize +
    lead() pair building costs one shuffle on doc id; the bigram table
    is NOT broadcast (distinct bigrams grow with the corpus, unlike
    the unigram vocabulary) — the transition scoring join is a plain
    shuffle equi-join on (w1, w2), the deploy lever at 100 TB being a
    top-K bigram cap + backoff. 4 shuffles total, zero Python."""
    import math

    from pyspark.sql.window import Window

    # the token table feeds the unigram counts, the transition builder
    # and the first-token cut — left lazy each consumer re-tokenizes
    # the corpus; one eager checkpoint pins it, and the transition
    # table (consumed by both the count training and the scoring join)
    # gets the same pin (the PRF/tfidf discipline, r14)
    # NOT size-gated (r15 measured rejection, see lm_perplexity_scores:
    # the lazy re-tokenize loses to the pin even at sf0.1).
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("pos", "tok"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("_id").orderBy("pos")
    seq = toks.withColumn("w2", F.lead("tok").over(w))
    trans = (
        seq.filter(F.col("w2").isNotNull())
        .select("_id", F.col("tok").alias("w1"), "w2")
        .localCheckpoint(eager=True)
    )
    # the unigram table has TWO consumers (the totals below and the
    # lm1 broadcast build in the final plan) — unpinned, its token-
    # scale groupBy ran once per consumer; a vocab-sized pin with the
    # totals riding as observed metrics makes it one job (r14, the
    # §9.3 observe-on-checkpoint pattern)
    uni, _stats = pinned_scalars(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")),
        [F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")],
    )
    n_total, v = int(_stats["n"]), int(_stats["v"])
    c12 = trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    lm2 = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.round(
            (
                F.log(F.col("c12") + F.lit(1.0))
                - F.log((F.col("c1") + F.lit(v)).cast("double"))
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp2"),
    )
    lm1 = uni.select(
        "tok",
        F.round(
            (F.log(F.col("c") + F.lit(1.0)) - F.lit(float(math.log(n_total + v))))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp1"),
    )
    first = (
        # from toks, not seq: the first-token cut never reads the
        # lead() column, so it must not pay the per-doc window sort
        toks.filter(F.col("pos") == 0)
        .join(F.broadcast(lm1), on="tok")
        .groupBy("_id")
        .agg(F.sum("lp1").alias("s1"))
    )
    tr = (
        trans.join(lm2, on=["w1", "w2"])
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_trans"), F.sum("lp2").alias("s2"))
    )
    return (
        first.join(tr, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            (F.coalesce(F.col("n_trans"), F.lit(0)) + F.lit(1)).alias("n_tokens"),
            F.round(
                -(F.col("s1") + F.coalesce(F.col("s2"), F.lit(0))).cast("double")
                / (
                    (F.coalesce(F.col("n_trans"), F.lit(0)) + F.lit(1)).cast("double")
                    * F.lit(1_000_000.0)
                ),
                round_to,
            ).alias("nll_nats"),
        )
    )


class LMIndex(IndexArtifact):
    """Persisted INCREMENTAL unigram LM for a GROWING corpus (r10) —
    the quality-scoring analog of `dedup_approx.MinHashLSHIndex`:
    `lm_perplexity_scores` re-trains the LM over the whole corpus per
    call, which is the wrong shape once the corpus is continuously
    ingested; this index stores the vocabulary counts once and folds
    each new batch in with O(batch) token work + an O(vocab) merge
    rewrite (a natural-language vocabulary is bounded, so the rewrite
    amortizes to a constant), then scores any batch against the
    CURRENT LM without touching the corpus.

    Layout under `root/`: `counts_v<N>/` parquet (tok, c) + `meta.json`
    {version, n_total, v} — updates write the NEXT version directory
    and swap the meta pointer last, so a crashed update leaves the
    index at the old version (same staged-commit discipline as the
    destinations). Scoring uses the identical micro-nat integer
    log-prob pipeline as `lm_perplexity_scores`; tokens the index has
    never seen score at the add-one floor 1/(N+V)."""

    @staticmethod
    def _toks(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("tok"),
        )

    def update(
        self,
        spark,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch: int | None = None,
    ) -> dict:
        """Fold a batch's token counts. `epoch` is the same monotone
        at-least-once replay fence the rest of the index family uses
        (r12): LM counts are not idempotent under re-addition, so an
        unfenced redelivery (foreachBatch retry, a declarative index
        job crashing between its fold and its cursor write) would
        silently double every folded token's mass."""
        meta = self._meta()
        if (
            epoch is not None
            and meta is not None
            and int(epoch) <= meta.get("last_epoch", -1)
        ):
            return meta  # replayed fold — already counted
        batch = self._toks(df, text_col, id_col).groupBy("tok").agg(
            F.count(F.lit(1)).alias("c")
        )
        if meta is None:
            merged, version = batch, 1
        else:
            cur = spark.read.parquet(str(self.root / f"counts_v{meta['version']}"))
            merged = (
                cur.unionByName(batch).groupBy("tok").agg(F.sum("c").alias("c"))
            )
            version = int(meta["version"]) + 1
        out = self.root / f"counts_v{version}"
        merged.write.mode("overwrite").parquet(str(out))
        # coalesce: a batch whose docs all tokenize to zero tokens
        # yields an EMPTY counts table — sum() would return null and
        # int(None) would crash after the parquet write
        stats = spark.read.parquet(str(out)).agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("n"),
            F.count(F.lit(1)).alias("v"),
        ).collect()[0]
        last = (meta or {}).get("last_epoch", -1)
        new_meta = {
            "version": version,
            "n_total": int(stats["n"]),
            "v": int(stats["v"]),
            "last_epoch": int(epoch) if epoch is not None else last,
        }
        self._swap_meta(new_meta)
        return new_meta

    def score(self, spark, df: DataFrame, text_col: str = "text", id_col: str = "doc_id", round_to: int = 6) -> DataFrame:
        import math

        meta = self._meta()
        if meta is None:
            raise ValueError("LMIndex is empty — update() first")
        n_total, v = int(meta["n_total"]), int(meta["v"])
        counts = spark.read.parquet(str(self.root / f"counts_v{meta['version']}"))
        ln_denom = float(math.log(n_total + v))
        lm = counts.select(
            "tok",
            F.round(
                (F.log(F.col("c") + F.lit(1.0)) - F.lit(ln_denom)) * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lp_unat"),
        )
        oov = int(round((0.0 - ln_denom) * 1_000_000.0))  # add-one floor ln(1/(N+V))
        toks = self._toks(df, text_col, id_col)
        return (
            toks.join(F.broadcast(lm), on="tok", how="left")
            .groupBy("_id")
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum(F.coalesce(F.col("lp_unat"), F.lit(oov))).alias("_s"),
            )
            .select(
                F.col("_id").alias(id_col),
                "n_tokens",
                F.round(
                    -F.col("_s").cast("double")
                    / (F.col("n_tokens").cast("double") * F.lit(1_000_000.0)),
                    round_to,
                ).alias("nll_nats"),
            )
        )


def lm_perplexity_scores_by_lang(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """PER-LANGUAGE LM perplexity (r10) — CCNet's actual shape: one LM
    per language (a French doc scored under the English LM reads as
    noise; cross-language scoring is the classic curation bug this
    variant removes). Counts key on (lang, token); each doc scores
    under ITS language's add-one unigram LM. Same micro-nat integer
    discipline; denominators ln(N_lang + V_lang) compute row-wise from
    the broadcast per-language totals, so adding a language never
    touches another language's scores. Shuffle shape identical to the
    global LM (the lang key rides the same aggregations)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(lang_col).alias("_lang"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("_lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("_lang").agg(
        F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    lm = counts.join(F.broadcast(totals), on="_lang").select(
        "_lang",
        "tok",
        F.round(
            (
                F.log(F.col("c") + F.lit(1.0))
                - F.log((F.col("_n") + F.col("_v")).cast("double"))
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp_unat"),
    )
    return (
        toks.join(F.broadcast(lm), on=["_lang", "tok"])
        .groupBy("_id", "_lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_unat").alias("_s"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_lang").alias(lang_col),
            "n_tokens",
            F.round(
                -F.col("_s").cast("double")
                / (F.col("n_tokens").cast("double") * F.lit(1_000_000.0)),
                round_to,
            ).alias("nll_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Exact cross-document substring dedup (sliding k-gram spans)


def dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """Exact SUBSTRING dedup — the ExactSubstr discipline of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better": remove any >= k-token run that appears verbatim more than
    once in the corpus), re-expressed for Spark. The paper's suffix
    array is a single-machine structure; the distributed equivalent
    is SLIDING k-gram fingerprints: every length-k token window is
    hashed, a window is duplicated when its hash occurs anywhere else
    in the corpus, the FIRST occurrence (by doc, position) survives,
    and each doc's flagged windows merge into MAXIMAL spans
    (gaps-and-islands) — a shared 37-token run shows up as one
    (start, end) span, not 28 window rows. Reference frame: the
    reference's dedup surface is row-level (crates/cdf-contract
    dedup policies); sub-row span dedup is beyond-ref, first-class
    for LLM curation.

    Scale shape: grams materialize only transiently inside codegen
    (posexplode of a transform over positions) — what shuffles is
    (md5, doc, pos) ≈ 48 B/token. Two shuffles total: one window over
    the gram hash (count + first-occurrence rank), one per-doc window
    for the island merge. No self-join, no all-pairs, no suffix
    array; a 100 TB corpus costs ~2 sort-shuffles of 48 B/token.
    hash_fn="md5" (default) keeps fingerprints SQL-reproducible for
    the oracle; hash_fn="xxhash64" is the deploy/bench twin — words
    pre-hash to longs ONCE and each window fingerprint is xxhash64
    over the k-long slice, so no k-word gram STRING is ever built
    (the md5 path's dominant cost). Same dedup semantics modulo
    64-bit collisions; span parity is test-gated at fixture scale.

    Output: (id_col, span_start, span_end) — token intervals
    [start, end) of non-first duplicated runs, one row per maximal
    span. Feed to `remove_dup_spans` to cut them.
    """
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    if hash_fn == "xxhash64":
        wsh = F.transform(ws, lambda w: F.xxhash64(w))
        gram = lambda i: F.xxhash64(F.slice(wsh, i + 1, k))  # noqa: E731
    else:
        gram = lambda i: F.md5(F.array_join(F.slice(ws, i + 1, k), " "))  # noqa: E731
    # gram hashing is the dominant CPU and runs in the SCAN stage — a
    # single-split input would hash the whole corpus on one core (r14,
    # guide §2.5 input parallelism; no-op at real scale)
    grams = spread_compute(df.filter(F.col(text_col).isNotNull() & (n >= k))).select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n - k), gram)
        ).alias("p", "h"),
    )
    # Hot-gram safe: first-occurrence via COMBINABLE aggregates
    # (count + min(struct)) instead of a window over the gram hash — a
    # corpus-boilerplate gram with 10^9 occurrences would pile every
    # row into one window partition with no mitigation, while partial
    # aggregation collapses it map-side and the join back is only
    # against DUPLICATED grams (AQE skew-join applies to joins).
    dup_stats = (
        grams.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col), F.col("p"))).alias("_first"),
        )
        .filter(F.col("_c") > 1)
        .select("h", "_first")
    )
    flagged = (
        grams.join(dup_stats, on="h")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("p") == F.col("_first.p"))
            )
        )
        .select(id_col, "p")
    )
    return _windows_to_spans(flagged, id_col, k)


def _windows_to_spans(flagged: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge flagged window positions (id_col, p) into maximal
    [start, end) token spans — gaps-and-islands over one per-doc
    window shuffle."""
    from pyspark.sql import Window

    wd = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + k).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_end.isNull() | (F.col("p") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = flagged.withColumn(
        "island",
        F.sum(new_island).over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") + k).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_dup_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut the spans `dup_spans` found: tokens inside any flagged
    [start, end) interval drop, the rest reassemble in order. Spans
    collapse to ONE small array per doc (a doc has few maximal spans),
    so the cut is a broadcast-friendly equi-join + a higher-order
    filter over token positions — no range join, no explode of the
    corpus. Docs with no spans pass through unchanged.

    Output: (id_col, text_cut, n_tokens, n_cut).
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    ws = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(ws) - 1)
    keep = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("_spans"),
            lambda s: (s["span_start"] <= i) & (i < s["span_end"]),
        ),
    )
    joined = df.join(per_doc, on=id_col, how="left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    return joined.select(
        id_col,
        F.array_join(
            F.transform(keep, lambda i: F.element_at(ws, i + 1)), " "
        ).alias("text_cut"),
        F.size(ws).alias("n_tokens"),
        (F.size(ws) - F.size(keep)).alias("n_cut"),
    )


class ExactSubstrIndex:
    """Persisted EXACT-SUBSTRING index for INCREMENTAL ExactSubstr —
    the growing-corpus form of `dup_spans`: the corpus's distinct
    k-gram fingerprints persist once, and each new ingest batch PROBES
    the index instead of re-hashing and re-shuffling the whole corpus
    (plain `dup_spans` re-pays two corpus-scale shuffles every run).

    Layout under `root/`: `grams/` — one row per DISTINCT gram hash
    ever seen, written partitioned by `hb = pmod(h, 16)` so the probe
    and fold joins co-partition against stable buckets; `meta.json`
    pins k (a probe with a different k would fingerprint different
    windows against meaningless buckets).

    Semantics contract (pinned by the registry fixture): when batches
    arrive in ascending id order, `probe(batch)` returns EXACTLY the
    spans the full-corpus `dup_spans` would assign to the batch's
    docs — a batch window is a non-first occurrence iff its gram is
    already in the index (an earlier batch had it) or an earlier
    (doc, p) within the batch has it. First occurrences stay unflagged
    and are folded in by `add()`.

    Cost: probe = one gram projection over the BATCH (narrow) + one
    membership join against the bucket-partitioned index + the batch's
    own hash window + one per-doc island window — O(batch + touched
    buckets), never O(corpus). add() = distinct batch grams anti-join
    the index, append — the index stays gram-unique so it grows with
    the corpus's NOVELTY, not its size.
    """

    def __init__(self, root):
        from pathlib import Path

        self.root = Path(root)

    @staticmethod
    def _grams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
        """(id, p, h, hb) sliding k-gram fingerprints of a batch —
        the same construction `dup_spans` shuffles, with the bigint
        SQL-parity hash and the bucket column."""
        from .text import hash64

        ws = F.split(F.col(text_col), " ")
        n = F.size(ws)
        g = df.filter(F.col(text_col).isNotNull() & (n >= k)).select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda i: hash64(F.array_join(F.slice(ws, i + 1, k), " ")),
                )
            ).alias("p", "h"),
        )
        return g.withColumn("hb", F.pmod(F.col("h"), F.lit(16)).cast("int"))

    def _meta(self) -> dict:
        import json as _json

        return _json.loads((self.root / "meta.json").read_text())

    def build(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 10
    ) -> dict:
        import json as _json

        g = self._grams(df, text_col, id_col, k)
        g.select("hb", "h").distinct().withColumn(
            "epoch", F.lit(0)
        ).write.mode("overwrite").partitionBy("hb").parquet(str(self.root / "grams"))
        self.root.mkdir(parents=True, exist_ok=True)
        meta = {"k": k}
        # atomic tmp+rename (the family's meta-swap discipline): a
        # crash mid-write must not leave a torn meta.json
        tmp_meta = self.root / "meta.json.tmp"
        tmp_meta.write_text(_json.dumps(meta))
        tmp_meta.replace(self.root / "meta.json")
        return meta

    def _read_grams(self, spark) -> DataFrame:
        """Index gram table; an index built over zero docs (the
        streaming-from-nothing start) has no part files, so fall back
        to an explicit-schema empty frame instead of letting parquet
        schema inference fail."""
        from pathlib import Path

        root = self.root / "grams"
        if not any(Path(root).rglob("*.parquet")):
            return spark.createDataFrame([], "hb int, h bigint, epoch int")
        return spark.read.parquet(str(root)).select("hb", "h", "epoch")

    def add(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch: int | None = None,
    ) -> None:
        """Fold a batch's NOVEL grams in (distinct anti-join append —
        the index stays gram-unique, stamped with the ingest epoch of
        its FIRST fold). `epoch` is the replay fence: a streaming
        caller passes its micro-batch epoch so a replayed `probe`
        can exclude the batch's own earlier (crashed) fold; batch
        callers omit it and get max+1 (one bounded 1-row agg)."""
        spark = df.sparkSession
        k = self._meta()["k"]
        g = self._grams(df, text_col, id_col, k).select("hb", "h").distinct()
        idx = self._read_grams(spark)
        if epoch is None:
            row = idx.agg(F.max("epoch").alias("m")).collect()[0]
            epoch = (row.m if row.m is not None else 0) + 1
        novel = g.join(idx, on=["hb", "h"], how="left_anti").withColumn(
            "epoch", F.lit(int(epoch))
        )
        novel.write.mode("append").partitionBy("hb").parquet(str(self.root / "grams"))

    def probe(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        before_epoch: int | None = None,
    ) -> DataFrame:
        """Dup spans of the batch against everything ingested before
        it (plus within-batch repeats): (id_col, span_start, span_end),
        the exact spans full-corpus `dup_spans` would assign these
        docs. `before_epoch` is the AT-LEAST-ONCE replay fence: a
        retried micro-batch whose crashed first attempt already folded
        its grams (epoch e) probes with before_epoch=e so its own
        replayed grams don't flag every window as seen-before."""
        spark = df.sparkSession
        k = self._meta()["k"]
        g = self._grams(df, text_col, id_col, k)
        idx = self._read_grams(spark)
        if before_epoch is not None:
            idx = idx.filter(F.col("epoch") < F.lit(int(before_epoch)))
        idx = idx.select("hb", "h").withColumn("_seen", F.lit(1))
        joined = g.join(idx, on=["hb", "h"], how="left")
        # hot-gram safe, same shape as dup_spans: within-batch
        # first-occurrence via combinable aggregates, not a window
        batch_stats = (
            g.groupBy("h")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(F.struct(F.col(id_col), F.col("p"))).alias("_first"),
            )
            .select("h", "_c", "_first")
        )
        flagged = (
            joined.join(batch_stats, on="h")
            .filter(
                F.col("_seen").isNotNull()
                | (
                    (F.col("_c") > 1)
                    & ~(
                        (F.col(id_col) == F.col(f"_first.{id_col}"))
                        & (F.col("p") == F.col("_first.p"))
                    )
                )
            )
            .select(id_col, "p")
        )
        return _windows_to_spans(flagged, id_col, k)


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling


def _hashed_ngram_features(col: Column, dim: int, hash_fn: str = "md5") -> Column:
    """DSIR's feature map: hashed word UNIGRAMS + BIGRAMS into `dim`
    buckets (Xie et al. 2023 §3.2 use exactly this — hashed n-grams of
    unigrams and bigrams into 10k buckets). Tokens are the suite's
    shared lowercase [a-z0-9]+ stream (the same stream the NB
    classifier / LM / BPE stages see). hash_fn="md5" buckets via the
    md5-parity `hash64` so the oracle replays bit-for-bit;
    "xxhash64" is the JVM-native deploy/bench twin (~10× cheaper per
    gram; the same estimator under a different hash — bucket
    collisions differ, rankings agree up to hash choice, the
    simhash/minhash twin discipline). Empty-safe: <2-token docs
    contribute no bigrams; 0-token docs no features at all."""
    toks = F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != "")
    if hash_fn == "xxhash64":
        h = lambda c: F.pmod(F.xxhash64(c), F.lit(dim))  # noqa: E731
    else:
        h = lambda c: hash64(c) % dim  # noqa: E731
    # bigrams via the gram-STRING slice construction (_gram_join), NOT
    # element_at(toks, i) lambdas: Catalyst does not CSE a captured
    # array expression across HOF lambdas (the r6 measurement in
    # word_ngram_hashes), so the element_at form recomputed the token
    # split per bigram — O(words²) per doc, measured 44s at sf0.1
    # where this form is ~3s. Same output strings either way.
    unis = F.transform(toks, h)
    bis = F.transform(_gram_join(toks, 2), h)
    return F.concat(unis, bis)


def _hashed_bucket_lm(feats: DataFrame, dim: int) -> tuple[DataFrame, int]:
    """Add-one-smoothed bag-of-hashed-ngrams model over bucket rows
    (`b`): returns (model, oov_floor_unat) where model = (b, lp_unat),
    lp_unat = round(ln((c+1)/(N+dim)) * 1e6) AS BIGINT and the floor
    is the never-seen-bucket log-prob ln(1/(N+dim)). The model is at
    most `dim` rows — a broadcastable fixed-size artifact at any
    corpus size; the 1-row total collect is bounded driver state.

    The counts table is eagerly localCheckpoint-ed (the NB-fit
    discipline): it has two consumers (the total collect here, the
    model join in the scoring plan), and without truncation the
    second consumer re-runs the FULL corpus feature explode+hash —
    measured ~1/3 of dsir wall at sf0.1. The pinned block is ≤ dim
    rows (KBs)."""
    # the total RIDES the counts-pin job as an observed metric (r14,
    # the §9.3 observe-on-checkpoint pattern) — the separate agg was
    # one more job over the just-pinned table
    obs = Observation()
    counts = (
        feats.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .observe(obs, F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_total = int(obs.get["n"])
    ln_denom = math.log(n_total + dim)
    model = counts.select(
        "b",
        F.round((F.log(F.col("c") + F.lit(1.0)) - F.lit(ln_denom)) * F.lit(MICRO))
        .cast("long")
        .alias("lp_unat"),
    )
    floor = int(round((0.0 - ln_denom) * MICRO))
    return model, floor


def dsir_importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every raw-corpus document by how much more likely its hashed
    n-gram bag is under a TARGET-domain bag model than under the raw
    model — log w(x) = log p_target(features) − log p_raw(features).
    The standard pick-pretraining-data-that-looks-like-the-target op
    (GPT-3/PaLM-style quality resampling, formalized); the suite's
    n-gram/embedding decontamination REMOVES target lookalikes, this
    SELECTS them.

    Returns (id_col, n_feats, lw_unat): feature count and the exact
    integer micro-nat log weight. Docs with zero features (no
    [a-z0-9] tokens) carry no evidence and are excluded — stated
    contract.

    Determinism: per-bucket log-probs round to integer micro-nats at
    the leaf (the proven lm_perplexity discipline), so per-doc sums
    are order-independent exact integers and the oracle matches
    bit-for-bit.

    Scale posture (100 TB raw corpus):
    - both bucket models are ≤ dim rows → BROADCAST; the target set
      is bounded by definition (a benchmark / curated seed corpus).
    - scoring = narrow feature explode + two broadcast joins + ONE
      map-side-combinable groupBy(doc). 1 shuffle at any corpus size;
      no corpus×corpus or corpus×target pair ever materializes.
    Reference frame: the reference gates rows by declarative contract
    policies (crates/cdf-contract/src/policy.rs); a distribution-
    matching selector is the beyond-ref generalization its curation
    story needs for training-data assembly."""
    t_feats = target.select(
        F.explode(_hashed_ngram_features(F.col(text_col), dim, hash_fn)).alias("b")
    )
    t_model, t_floor = _hashed_bucket_lm(t_feats, dim)
    t_model = t_model.withColumnRenamed("lp_unat", "_lp_t")
    # ONE corpus pass (r12 reshape): aggregate per-(doc, bucket)
    # counts FIRST — the raw model (groupBy b), its total, and the
    # per-doc scoring all consume the SAME (doc, bucket) exchange, so
    # Catalyst's ReusedExchange executes the corpus feature
    # explode+hash once where the per-occurrence form paid it twice
    # (model-count pass + scoring pass — measured ~2x the wall).
    # Scoring over bucket counts is the identical integer math:
    # lw = Σ_b cnt_b · (lp_t(b) − lp_r(b)), n_feats = Σ_b cnt_b.
    # The raw totals ride 1-row BROADCAST frames (not driver
    # collects) so everything stays one action — floors compute
    # in-row with F.round (HALF_UP = away-from-zero on these
    # negative values, exactly DuckDB's round, strictly tighter
    # parity than the Python-round literal it replaces).
    # feature hashing runs in the scan stage — spread a single-split
    # corpus first (r14, guide §2.5; no-op at real scale)
    # r12's reshape trusted ReusedExchange to share the (doc, bucket)
    # exchange across the model and scoring branches — the AQE-final
    # plan proves it does NOT fire (measured r14: 4 corpus scans, the
    # explode+hash re-derived per broadcast build: scoring + r_model +
    # two r_tot frames). Pin the per-(doc, bucket) counts once — the
    # tfidf/PRF checkpoint discipline; the pin is 3 longs per distinct
    # (doc, bucket), strictly smaller than the exchange bytes the old
    # plan shuffled per pass — and pin the ≤ dim-row bucket model so
    # its three consumers never re-aggregate the corpus-scale fdoc.
    fdoc = (
        spread_compute(corpus)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(_hashed_ngram_features(F.col(text_col), dim, hash_fn)).alias("b"),
        )
        .groupBy("_id", "b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    r_counts = (
        fdoc.groupBy("b").agg(F.sum("_c").alias("c")).localCheckpoint(eager=True)
    )
    r_tot = r_counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_n_r"))
    ln_r = F.log(F.col("_n_r") + F.lit(float(dim)))
    r_model = r_counts.crossJoin(F.broadcast(r_tot)).select(
        "b",
        F.round((F.log(F.col("c") + F.lit(1.0)) - ln_r) * F.lit(MICRO))
        .cast("long")
        .alias("_lp_r"),
    )
    r_floor_col = F.round((F.lit(0.0) - ln_r) * F.lit(MICRO)).cast("long")
    return (
        fdoc.join(F.broadcast(t_model), on="b", how="left")
        .join(F.broadcast(r_model), on="b", how="left")
        .crossJoin(F.broadcast(r_tot))
        .select(
            "_id",
            "_c",
            (
                F.coalesce(F.col("_lp_t"), F.lit(t_floor))
                - F.coalesce(F.col("_lp_r"), r_floor_col)
            ).alias("_d"),
        )
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_feats"),
            F.sum(F.col("_c") * F.col("_d")).alias("lw_unat"),
        )
        .select(F.col("_id").alias(id_col), "n_feats", "lw_unat")
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """Select the top-k raw documents by DSIR importance weight —
    the paper's deterministic top-k variant (its §4 ablation; the
    Gumbel-noise resampler differs only by adding per-doc noise,
    which a reproducible data pipeline pins anyway). Ties break by
    id asc so selection is total-order deterministic.

    Output (id_col, n_feats, lw_unat, rk). Scale: the weight table is
    one row per corpus doc; global top-k is a sort-limit Spark
    executes as TakeOrderedAndProject (per-partition heap + driver
    merge of k·partitions rows — no global sort shuffle)."""
    w = dsir_importance_weights(corpus, target, text_col, id_col, dim, hash_fn)
    return (
        w.orderBy(F.col("lw_unat").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("lw_unat").desc(), F.col(id_col).asc())
            ),
        )
    )


class DSIRIndex(IndexArtifact):
    """Persisted INCREMENTAL DSIR selector for a GROWING raw corpus —
    the data-selection member of the incremental-index family
    (`NBIndex`, `LMIndex`, `ExactSubstrIndex`, `MinHashLSHIndex`,
    `similarity.IVFIndex`, `retrieval.InvertedIndex`):
    `dsir_importance_weights` re-fits the raw bag model over the whole
    corpus per call, the wrong shape under continuous ingestion — and
    DSIR's raw model exists precisely to track the corpus it selects
    from, so it SHOULD fold as the corpus grows.

    Both models are bucket-count tables (≤ dim rows), and counts ADD:
    a fully-folded raw model is bit-identical to a one-shot fit, which
    is what lets the incremental query share the one-shot SQL oracle.

    Layout under `root/`: `target/` parquet (b, c) — the FIXED
    reference-set model, written once at build() (the target corpus
    is a curated seed / benchmark, not a stream); `raw_v<N>/` parquet
    (b, c); `meta.json` {version, dim, n_target, n_raw, last_epoch} —
    atomic tmp+rename swap last, superseded versions reclaimed
    keep-live-minus-one (the NBIndex discipline). update() is
    O(batch) feature work + an O(dim) merge rewrite; weights() reads
    only the two stored models (KBs) plus the scored batch."""

    @staticmethod
    def _bucket_counts(df: DataFrame, text_col: str, dim: int, hash_fn: str) -> DataFrame:
        return (
            df.select(F.explode(_hashed_ngram_features(F.col(text_col), dim, hash_fn)).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def build(
        self,
        spark,
        target: DataFrame,
        text_col: str = "text",
        dim: int = 4096,
        hash_fn: str = "md5",
    ) -> dict:
        """Freeze the target reference model; the raw model starts
        empty (an empty raw model is the textbook add-one floor —
        every bucket at ln(1/dim) mass — so weights() is defined from
        the first fold on)."""
        if self._meta() is not None:
            raise ValueError("DSIRIndex already built — use update()")
        tc = self._bucket_counts(target, text_col, dim, hash_fn)
        tc.write.mode("overwrite").parquet(str(self.root / "target"))
        n_t = spark.read.parquet(str(self.root / "target")).agg(
            F.coalesce(F.sum("c"), F.lit(0))
        ).collect()[0][0]
        self._swap_meta(
            {
                "version": 0,
                "dim": int(dim),
                "hash_fn": hash_fn,
                "n_target": int(n_t),
                "n_raw": 0,
                "last_epoch": -1,
            }
        )
        return self._meta()

    def update(
        self,
        spark,
        batch: DataFrame,
        text_col: str = "text",
        epoch: int | None = None,
    ) -> dict:
        """Fold a raw-corpus batch: feature-hash ONLY these rows, add
        their bucket counts into the raw model (O(dim) merge). Same
        monotone at-least-once `epoch` fence as the family (count
        folds are not idempotent under replay)."""
        meta = self._meta()
        if meta is None:
            raise ValueError("DSIRIndex is empty — build() first")
        if epoch is not None and int(epoch) <= meta.get("last_epoch", -1):
            return meta  # replayed fold — already counted
        dim, hash_fn = int(meta["dim"]), meta["hash_fn"]
        bc = self._bucket_counts(batch, text_col, dim, hash_fn)
        version = int(meta["version"]) + 1
        if meta["version"] > 0:
            cur = spark.read.parquet(str(self.root / f"raw_v{meta['version']}"))
            bc = cur.unionByName(bc).groupBy("b").agg(F.sum("c").alias("c"))
        out = self.root / f"raw_v{version}"
        bc.write.mode("overwrite").parquet(str(out))
        n_add = spark.read.parquet(str(out)).agg(
            F.coalesce(F.sum("c"), F.lit(0))
        ).collect()[0][0]
        new_meta = {
            **meta,
            "version": version,
            "n_raw": int(n_add),
            "last_epoch": int(epoch) if epoch is not None else meta.get("last_epoch", -1),
        }
        self._swap_meta(new_meta)
        self._reclaim(version)
        return new_meta

    def _reclaim(self, live_version: int) -> None:
        """Drop superseded raw_v dirs after the meta swap, keeping
        live and live-1; sweep crash-orphaned future dirs."""
        import shutil

        for d in self.root.iterdir():
            if d.is_dir() and d.name.startswith("raw_v"):
                try:
                    ver = int(d.name[len("raw_v"):])
                except ValueError:
                    continue
                if ver < live_version - 1 or ver > live_version:
                    shutil.rmtree(d, ignore_errors=True)

    def weights(
        self,
        spark,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """DSIR log weights for a batch against the CURRENT models —
        bit-identical to `dsir_importance_weights(all folded raw,
        target)` scoring the same batch. Both models broadcast; one
        shuffle over the batch."""
        meta = self._meta()
        if meta is None:
            raise ValueError("DSIRIndex is empty — build() first")
        dim, hash_fn = int(meta["dim"]), meta["hash_fn"]
        ln_t = math.log(int(meta["n_target"]) + dim)
        ln_r = math.log(int(meta["n_raw"]) + dim)

        def _model(df: DataFrame, ln_denom: float, out: str) -> DataFrame:
            return df.select(
                "b",
                F.round((F.log(F.col("c") + F.lit(1.0)) - F.lit(ln_denom)) * F.lit(MICRO))
                .cast("long")
                .alias(out),
            )

        t_model = _model(spark.read.parquet(str(self.root / "target")), ln_t, "_lp_t")
        if meta["version"] > 0:
            r_model = _model(
                spark.read.parquet(str(self.root / f"raw_v{meta['version']}")), ln_r, "_lp_r"
            )
        else:
            r_model = spark.createDataFrame([], "b long, _lp_r long")
        t_floor = int(round((0.0 - ln_t) * MICRO))
        r_floor = int(round((0.0 - ln_r) * MICRO))
        feats = batch.select(
            F.col(id_col).alias("_id"),
            F.explode(_hashed_ngram_features(F.col(text_col), dim, hash_fn)).alias("b"),
        )
        return (
            feats.join(F.broadcast(t_model), on="b", how="left")
            .join(F.broadcast(r_model), on="b", how="left")
            .select(
                "_id",
                (
                    F.coalesce(F.col("_lp_t"), F.lit(t_floor))
                    - F.coalesce(F.col("_lp_r"), F.lit(r_floor))
                ).alias("_d"),
            )
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("_d").alias("lw_unat"))
            .select(F.col("_id").alias(id_col), "n_feats", "lw_unat")
        )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every k-token gram, slide a
    w-gram window, and keep each window's MINIMUM hash — a guaranteed-
    coverage, position-robust fingerprint set whose size is ~2/(w+1)
    of the gram count. The canonical "document fingerprinting"
    primitive: MinHash answers "how similar", ExactSubstr answers
    "which exact spans" — winnowing answers "which documents share
    ANY sufficiently long run" at a tunable density, the plagiarism/
    provenance shape. Distinct from `dedup_approx.
    fingerprint_containment_pairs`' mod-16 hash sampler: window-min
    selection GUARANTEES every w-gram window contributes a
    fingerprint (the paper's coverage theorem), where mod-sampling
    can miss arbitrarily long runs whose gram hashes all land off
    the residue.

    Determinism discipline: gram hashes are 40-bit integers from the
    suite's md5 stream; window selection packs (hash, position) into
    ONE comparable integer `h * 2^20 + (2^20 - 1 - pos)` so the
    window MIN itself implements the tie rule (smallest hash,
    RIGHTMOST position — the paper's robust-winnowing choice) in
    pure integer arithmetic, bit-identical in SQL. Positions are
    guarded to 2^20 grams per document (a ~1M-token doc — raise, not
    silent key collision; the rag-chunk packing rule).

    Selection variant (documented): every window START contributes —
    including the ragged tail windows shorter than w — so every
    document with >= 1 gram carries >= 1 fingerprint and n < w
    degrades gracefully. The per-doc window is position-ordered and
    streaming (rowsBetween(0, w-1)); fingerprints dedup per doc.

    Output: (id_col, fp) — distinct 40-bit fingerprints per document.
    Scale: one narrow gram pass (grams live only inside codegen), one
    per-doc window sort, one dedup — no joins, no corpus-wide state.
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be positive")
    from pyspark.sql import Window as _W

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    n = F.size(toks)
    gram = lambda i: F.concat_ws(" ", F.slice(toks, i, k))  # noqa: E731
    h40 = lambda g: F.conv(F.substring(F.md5(g), 1, 10), 16, 10).cast("long")  # noqa: E731
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .filter(n >= k)
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.transform(F.sequence(F.lit(1), n - (k - 1)), lambda i: h40(gram(i)))
            ).alias("pos", "_h"),
        )
    )
    guarded_pos = F.when(F.col("pos") < F.lit(1 << 20), F.col("pos")).otherwise(
        F.raise_error(F.lit("winnowing position overflows the 2^20 packing"))
    )
    packed = grams.select(
        "_id",
        "pos",
        (F.col("_h") * (1 << 20) + (F.lit((1 << 20) - 1) - guarded_pos)).alias("_c"),
    )
    win = _W.partitionBy("_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        packed.select("_id", F.min("_c").over(win).alias("_sel"))
        .select(F.col("_id").alias(id_col), F.expr(f"_sel div {1 << 20}").alias("fp"))
        .distinct()
    )


def winnow_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 5,
    df_cap: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints: two
    documents sharing >= ``min_shared`` selected fingerprints share
    that many (approximately position-independent) k-token runs.

    Fingerprints whose document frequency exceeds ``df_cap`` are
    dropped BEFORE the pair join (boilerplate runs shared by everyone
    carry no pairing signal and would make the fingerprint-bucket join
    quadratic in the hottest bucket — the LSH-band discipline). The
    join is bucketed by fingerprint: cost is sum over fingerprints of
    docfreq^2 with docfreq <= df_cap, never corpus x corpus.

    Output: (a, b, shared) with a < b by document id.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be positive")
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w).localCheckpoint(
        eager=True
    )
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") > df_cap
    )
    cool = fps.join(hot, on="fp", how="left_anti")
    a = cool.select(F.col("fp"), F.col(id_col).alias("a"))
    b = cool.select(F.col("fp"), F.col(id_col).alias("b"))
    return (
        a.join(b, on="fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def lm_kn_bigram_perplexity_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form with the standard fixed
    discount D = 0.75) — the smoothing every production n-gram filter
    (KenLM/CCNet) actually runs, one theory step up from the sibling
    `lm_bigram_perplexity_scores`' add-one estimate:

        P(w2|w1) = (c12 - D)/c1 + D * N1+(w1,.)/c1 * Pcont(w2)
        Pcont(w2) = N1+(., w2) / |distinct bigrams|

    Continuation probability fixes add-one's classic failure: a token
    frequent only inside one collocation ("francisco") stops inheriting
    the mass its raw unigram count claims. Self-scoring (the corpus is
    the training set) keeps every transition observed, so c12 >= 1 and
    the discounted term is strictly positive — no max() clamp and no
    unseen-backoff branch in the hot path.

    Determinism: counts are exact integers; the per-transition log-prob
    is ONE fixed-order double over five integers, micro-nat rounded at
    the leaf (the suite's LM discipline), so per-doc sums are exact.
    First tokens score under the sibling's add-one unigram (stated —
    a 1-token boundary consistency choice, not a KN term). Scale: the
    same 4-shuffle shape as the sibling + one combinable
    distinct-count per side of the bigram table; the bigram join stays
    a shuffle equi-join (never broadcast — distinct bigrams grow with
    the corpus); the two corpus scalars are a 1-row bounded collect.

    Output: (id_col, n_tokens, nll_nats).
    """
    import math

    from pyspark.sql.window import Window

    # the token table feeds the unigram counts, the transition builder
    # and the first-token cut — left lazy each consumer re-tokenizes
    # the corpus; one eager checkpoint pins it, and the transition
    # table (consumed by both the count training and the scoring join)
    # gets the same pin (the PRF/tfidf discipline, r14)
    # NOT size-gated (r15 measured rejection, see lm_perplexity_scores:
    # the lazy re-tokenize loses to the pin even at sf0.1).
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("pos", "tok"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("_id").orderBy("pos")
    seq = toks.withColumn("w2", F.lead("tok").over(w))
    trans = (
        seq.filter(F.col("w2").isNotNull())
        .select("_id", F.col("tok").alias("w1"), "w2")
        .localCheckpoint(eager=True)
    )
    # same two-consumer unigram table as lm_bigram_perplexity_scores:
    # pin it vocab-sized and ride the totals as observed metrics (r14)
    uni, _ustats = pinned_scalars(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")),
        [F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")],
    )
    n_total, v = int(_ustats["n"]), int(_ustats["v"])
    # n_types (distinct bigram count) rides the c12 pin the same way —
    # the separate count() was one more job over the pinned table
    c12, _cstats = pinned_scalars(
        trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")),
        [F.count(F.lit(1)).alias("n_types")],
    )  # three consumers below
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    n_types = int(_cstats["n_types"])
    lp2 = (
        c12.join(left, "w1")
        .join(cont, "w2")
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (
                        F.col("c12").cast("double")
                        - F.lit(0.75)
                        + F.lit(0.75)
                        * F.col("n1p")
                        * (F.col("ncont").cast("double") / F.lit(float(n_types)))
                    )
                    / F.col("c1")
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("lp2"),
        )
    )
    lp1 = uni.select(
        "tok",
        F.round(
            (F.log(F.col("c") + F.lit(1.0)) - F.lit(float(math.log(n_total + v))))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lp1"),
    )
    first = (
        # from toks, not seq: the first-token cut never reads the
        # lead() column, so it must not pay the per-doc window sort
        toks.filter(F.col("pos") == 0)
        .join(F.broadcast(lp1), on="tok")
        .groupBy("_id")
        .agg(F.sum("lp1").alias("s1"))
    )
    tr = (
        trans.join(lp2, on=["w1", "w2"])
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_trans"), F.sum("lp2").alias("s2"))
    )
    return (
        first.join(tr, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            (F.coalesce(F.col("n_trans"), F.lit(0)) + F.lit(1)).alias("n_tokens"),
            F.round(
                -(F.col("s1") + F.coalesce(F.col("s2"), F.lit(0))).cast("double")
                / (
                    (F.coalesce(F.col("n_trans"), F.lit(0)) + F.lit(1)).cast("double")
                    * F.lit(1_000_000.0)
                ),
                round_to,
            ).alias("nll_nats"),
        )
    )
