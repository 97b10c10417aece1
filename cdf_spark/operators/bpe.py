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


def _exact_batch(
    rows: list, vocab: set[str], k: int, exhausted: bool
) -> list[tuple[str, str, int]]:
    """The EXACT batching rule: from the (cnt DESC, a, b)-sorted pair
    prefix, accept a maximal PREFIX of pairwise-independent merges
    that sequential BPE would provably pick in the same order.

    Walk in sorted order, accepting (a, b) until the first STOP pair —
    one that (i) shares a symbol with an accepted merge's {lhs, rhs,
    merged}, or (ii) whose merged string already exists as a corpus
    symbol (merging would then INCREASE existing pairs involving that
    symbol — the 'ing' via in+g vs i+ng collision). Then drop accepted
    pairs whose count ties the stop pair's.

    Why this is exact (batched merges == sequential merges):
    - Accepted pairs are mutually independent, so applying any of them
      leaves the others' counts unchanged; sequential visits them in
      exactly this sorted order.
    - Every pair whose count CHANGES under the batch involves an
      accepted symbol or merged string, i.e. is a stop-class pair, and
      the prefix rule puts all of those at/after the stop — T0 count
      <= the stop count. Old stop-class pairs can only DECREASE
      (gains require a pre-existing merged-string symbol, excluded by
      (ii)). A NEW pair like (x, merged_j) descends from an occurrence
      of (x, lhs_j) — itself stop-class — so its count is bounded by
      the stop count too.
    - Dropping ties with the stop count makes every accepted count
      STRICTLY greater than any changed pair's, so no changed pair
      can overtake on count or on tie-order mid-batch.
    If the collected prefix runs out before a stop (`exhausted` False),
    the last row's count bounds everything below the horizon and acts
    as the stop count."""
    accepted: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    stop_cnt: int | None = None
    for r in rows:
        a, b, cnt = r.a, r.b, int(r.cnt)
        if len(accepted) >= k:
            stop_cnt = cnt
            break
        m = a + b
        if a in touched or b in touched or m in touched or m in vocab:
            stop_cnt = cnt
            break
        accepted.append((a, b, cnt))
        touched.update((a, b, m))
    if stop_cnt is None and not exhausted and rows:
        stop_cnt = int(rows[-1].cnt)  # horizon bound: unseen pairs <= this
    if stop_cnt is not None:
        accepted = [p for p in accepted if p[2] > stop_cnt]
    return accepted


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    word_pattern: str = WORD_PATTERN,
    batch: int = 1,
) -> list[tuple[int, str, str, str, int]]:
    """Train `n_merges` BPE merges on the corpus. Returns the merge
    table [(step, lhs, rhs, merged, cnt)] — the learned model, small
    by definition (driver state = n_merges rows).

    batch=1 (default) is the classic loop: each step is one pair-count
    aggregation + a 1-ROW collect (argmax) + one narrow replace.

    batch=K is the real-vocab regime (30k-50k merges): per ROUND, the
    top pairwise-INDEPENDENT merges from one pair-count pass apply in
    ONE chained replace — driver round-trips drop from O(n_merges) to
    O(n_merges / <batch yield>) with EXACTNESS PRESERVED (see
    `_exact_batch`; the property gate asserts batched == sequential on
    adversarial corpora). The symbol vocabulary needed for the
    collision guard is maintained driver-side: one distinct-symbol
    pass up front (alphabet-sized), then each merge adds its own
    string — no per-round vocabulary scan."""
    words = corpus_words(df, text_col, word_pattern)
    cur = words.select(_wrap(F.col("word")).alias("w"), "c").persist()
    cur.count()  # materialize once; iterations replan from here
    merges: list[tuple[int, str, str, str, int]] = []
    vocab: set[str] = set()
    if batch > 1:
        vocab = {
            r.s
            for r in cur.select(
                F.explode(_symbols(F.col("w"))).alias("s")
            ).distinct().collect()
        }
    try:
        while len(merges) < n_merges:
            want = min(batch, n_merges - len(merges))
            if want <= 1:
                top = (
                    _pair_counts(cur)
                    .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
                    .limit(1)
                    .collect()
                )
                picked = [(r.a, r.b, int(r.cnt)) for r in top]
            else:
                horizon = max(4 * want, 64)
                rows = (
                    _pair_counts(cur)
                    .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
                    .limit(horizon)
                    .collect()
                )
                picked = _exact_batch(rows, vocab, want, exhausted=len(rows) < horizon)
                if not picked and rows:
                    # conflict at the very top: fall back to the plain
                    # argmax for this round (always exact)
                    r = rows[0]
                    picked = [(r.a, r.b, int(r.cnt))]
            if not picked:
                break
            expr = F.col("w")
            for a, b, cnt in picked:
                merges.append((len(merges) + 1, a, b, a + b, cnt))
                vocab.add(a + b)
                expr = F.replace(expr, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
            nxt = cur.select(expr.alias("w"), "c").persist()
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
