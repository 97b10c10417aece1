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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64

# ---------------------------------------------------------------------------
# word n-grams


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Overlapping word n-grams of single-space-separated text, as
    strings re-joined with a single space. Empty-safe: shorter docs
    yield an empty array."""
    toks = F.filter(F.split(F.trim(col), " "), lambda t: F.length(t) > 0)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def word_ngram_hashes(col: Column, n: int = 5) -> Column:
    """Distinct md5-derived 60-bit hashes of the word n-grams — the
    join key for decontamination (SQL-parity via `hash64`)."""
    return F.array_distinct(F.transform(word_ngrams(col, n), hash64))


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontamination_overlap(
    candidates: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.05,
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
    """
    cand = candidates.select(
        F.col(id_col).alias("id"),
        word_ngram_hashes(F.col(text_col), n).alias("grams"),
    ).withColumn("n_grams", F.size("grams")).filter(F.col("n_grams") > 0)

    eval_grams = (
        eval_set.select(F.explode(word_ngram_hashes(F.col(text_col), n)).alias("g"))
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


# ---------------------------------------------------------------------------
# repetition / lexical-diversity signals (Gopher-style quality rules)


def repetition_features(col: Column) -> dict[str, Column]:
    """Per-document repetition and lexical-diversity signals, the
    Gopher/RefinedWeb-style quality rules that catch boilerplate and
    degenerate (looping) text:

    - distinct_word_ratio: |types| / |tokens| (type-token ratio),
    - top_word_frac: count of the most frequent word / |tokens|,
    - dup_2gram_frac: 1 − |distinct 2-grams| / |2-grams|,
    - top_2gram_frac: count of the most frequent 2-gram / |2-grams|.

    All ratios round(…, 6); empty docs yield zeros. Cost is
    O(types × tokens) per row via higher-order folds — bounded by
    document length, independent of corpus size, no shuffle.
    """
    toks = F.filter(F.split(F.trim(col), " "), lambda t: F.length(t) > 0)
    nt = F.size(toks)
    dtoks = F.array_distinct(toks)
    top_word = F.array_max(
        F.transform(dtoks, lambda w: F.size(F.filter(toks, lambda x: x == w)))
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(nt - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    ng = F.size(grams)
    dgrams = F.array_distinct(grams)
    top_gram = F.array_max(
        F.transform(dgrams, lambda w: F.size(F.filter(grams, lambda x: x == w)))
    )
    z = F.lit(0.0)
    return {
        "n_tokens": nt.cast("long"),
        "distinct_word_ratio": F.round(
            F.when(nt > 0, F.size(dtoks).cast("double") / nt).otherwise(z), 6
        ),
        "top_word_frac": F.round(
            F.when(nt > 0, top_word.cast("double") / nt).otherwise(z), 6
        ),
        "dup_2gram_frac": F.round(
            F.when(ng > 0, F.lit(1.0) - F.size(dgrams).cast("double") / ng).otherwise(z), 6
        ),
        "top_2gram_frac": F.round(
            F.when(ng > 0, top_gram.cast("double") / ng).otherwise(z), 6
        ),
    }


def repetition_flag(col: Column) -> Column:
    """Gopher-style keep/drop verdict from the repetition signals:
    drop when the text is dominated by repeated tokens or bigrams.
    Thresholds are fixed and documented for oracle parity."""
    f = repetition_features(col)
    return ~(
        (f["distinct_word_ratio"] < 0.2)
        | (f["top_word_frac"] > 0.3)
        | (f["top_2gram_frac"] > 0.18)
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
