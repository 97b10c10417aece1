"""Distributed BPE tokenizer training (Sennrich et al. 2016).

A large-scale training-data pipeline doesn't just CONSUME a tokenizer —
it trains one on the corpus it curated. Classic byte-pair encoding
iterates: count adjacent symbol pairs across the corpus, merge the most
frequent pair everywhere, repeat. The reference engine has no tokenizer
surface (its dedup/contract ops are row-level; see
crates/cdf-contract); this module is beyond-ref, first-class for LLM
data work.

Distribution shape: the corpus collapses to the DISTINCT-WORD table
once (one tokenize + count shuffle over the raw text — the only
corpus-scale pass), and every BPE iteration runs over that word table:
tens of millions of rows at 100 TB corpus scale, not trillions. Each
iteration is one pair-count aggregation (explode adjacent pairs,
groupBy sum — partial aggregation map-side) plus a 1-ROW collect (the
argmax pair; bounded driver state: n_merges rows total) plus a narrow
`replace` over the word table. No UDFs anywhere.

Exactness: words are represented as paren-wrapped symbol strings —
"low" -> "(l)(o)(w)" — because literal left-to-right non-overlapping
`replace("(a)(b)" -> "(ab)")` is EXACTLY BPE's greedy merge-application
semantics, and Spark's `replace`, DuckDB's `replace`, and Python's
`str.replace` all implement that same scan (verified: "(a)(a)(a)" ->
"(aa)(a)" in all three). Pair counting counts every adjacent occurrence
(overlapping, like the reference get_stats of Sennrich's paper). Ties
break deterministically by (count DESC, left ASC, right ASC). A SQL
oracle therefore replays the whole training loop stage by stage.

Words are restricted to a symbol-safe alphabet (default ^[a-z0-9]+$) so
'(' / ')' cannot collide with corpus bytes; a production deployment
would wrap raw bytes in an escape first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["corpus_words", "learn_bpe", "bpe_merges_df", "apply_bpe", "segmentation"]

WORD_PATTERN = "^[a-z0-9]+$"


def corpus_words(
    df: DataFrame, text_col: str = "text", word_pattern: str = WORD_PATTERN
) -> DataFrame:
    """Distinct-word table: (word, c). The ONE corpus-scale pass."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word").rlike(word_pattern))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _wrap(word: Column) -> Column:
    """'low' -> '(l)(o)(w)'."""
    return F.concat(F.lit("("), F.array_join(F.split(word, ""), ")("), F.lit(")"))


def _symbols(w: Column) -> Column:
    """'(l)(o)(w)' -> ['l','o','w']."""
    return F.split(F.substring(w, 2, F.length(w) - 2), "\\)\\(")


def _pair_counts(cur: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the word table, weighted by word
    count; every adjacent occurrence counts (the paper's get_stats)."""
    syms = _symbols(F.col("w"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b"),
        ),
    )
    return (
        cur.filter(F.size(syms) >= 2)
        .select("c", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("c").alias("cnt"))
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    word_pattern: str = WORD_PATTERN,
) -> list[tuple[int, str, str, str, int]]:
    """Train `n_merges` BPE merges on the corpus. Returns the merge
    table [(step, lhs, rhs, merged, cnt)] — the learned model, small
    by definition (driver state = n_merges rows; each step's argmax is
    a 1-row collect, the same bounded pattern as watermark reads)."""
    words = corpus_words(df, text_col, word_pattern)
    cur = words.select(_wrap(F.col("word")).alias("w"), "c").persist()
    cur.count()  # materialize once; iterations replan from here
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0].a, top[0].b, top[0].cnt
            merges.append((step, a, b, a + b, int(cnt)))
            nxt = cur.select(
                F.replace(
                    F.col("w"), F.lit(f"({a})({b})"), F.lit(f"({a}{b})")
                ).alias("w"),
                "c",
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_merges_df(
    spark: SparkSession, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, cnt bigint"
    )


def apply_bpe(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Segment each word with the learned merges, applied in training
    order (chained narrow replaces — the exact inference rule of BPE).
    Output: (word_col, segmented) with symbols space-joined."""
    w = _wrap(F.col(word_col))
    for _step, a, b, _m, _c in merges:
        w = F.replace(w, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
    seg = F.array_join(_symbols(w), " ")
    return words.select(word_col, seg.alias("segmented"))


def segmentation(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Train-and-apply: the distinct corpus words with their final BPE
    segmentation after `n_merges` learned merges."""
    merges = learn_bpe(df, text_col, n_merges, word_pattern)
    words = corpus_words(df, text_col, word_pattern).select("word")
    return apply_bpe(words, merges)
