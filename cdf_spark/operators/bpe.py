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

__all__ = [
    "apply_bpe",
    "apply_bpe_fast",
    "bpe_merges_df",
    "corpus_words",
    "learn_bpe",
    "segmentation",
]

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

    Independence is DIRECTIONAL, not shares-a-symbol: merging
    (a, b) -> m only changes the counts of pairs with y == a (an
    "x a b" occurrence loses its (x, a)), x == b ("a b y" loses
    (b, y) — and (b, a) in abab chains), or a member equal to m.
    A later pair (a, c) or (x, b) is UNCHANGED — its shared symbol is
    never the one consumed — so the head-of-Zipf families like
    (e, r), (e, n), (e, s) batch together. The walk stops at the first
    pair that (i) has y in {lhs_j}, x in {rhs_j}, or a member in
    {merged_j} of the accepted set, or (ii) whose own merged string
    already exists as a corpus symbol or an accepted merged string
    (merging would then INCREASE pairs involving that symbol — the
    'the' via th+e vs t+he collision). Then accepted pairs tying the
    stop pair's count drop — except the first, the global argmax,
    which is exact unconditionally.

    Why this is exact (batched merges == sequential merges):
    - Accepted pairs are pairwise count-independent under the
      directional rule, so sequential visits them in exactly this
      sorted order with exactly these counts.
    - Every T0 pair whose count CHANGES under the batch is stop-class,
      and the prefix rule puts all of those at/after the stop — T0
      count <= the stop count — and they only DECREASE (gains require
      a merged-string collision, excluded by (ii)).
    - Every NEW pair (x, m_j) descends from an occurrence of
      (x, lhs_j) — itself stop-class — so its count is also <= the
      stop count; (m_j, m_k) descends from (rhs_j, lhs_k), likewise.
    - Dropping ties with the stop count makes every accepted count
      STRICTLY greater than any changed or new pair's, so nothing can
      overtake on count or tie-order mid-batch.
    If the collected prefix runs out before a stop (`exhausted`
    False), the last row's count bounds everything below the horizon
    and acts as the stop count."""
    accepted: list[tuple[str, str, int]] = []
    lhs_set: set[str] = set()
    rhs_set: set[str] = set()
    merged_set: set[str] = set()
    stop_cnt: int | None = None
    for r in rows:
        a, b, cnt = r.a, r.b, int(r.cnt)
        if len(accepted) >= k:
            stop_cnt = cnt
            break
        m = a + b
        if (
            b in lhs_set
            or a in rhs_set
            or a in merged_set
            or b in merged_set
            or m in vocab
            or m in merged_set
        ):
            stop_cnt = cnt
            break
        accepted.append((a, b, cnt))
        lhs_set.add(a)
        rhs_set.add(b)
        merged_set.add(m)
    if stop_cnt is None and not exhausted and rows:
        stop_cnt = int(rows[-1].cnt)  # horizon bound: unseen pairs <= this
    if stop_cnt is not None and accepted:
        head, rest = accepted[0], accepted[1:]
        accepted = [head] + [p for p in rest if p[2] > stop_cnt]
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
    from ..plans.checkpoint import release_local_checkpoint

    words = corpus_words(df, text_col, word_pattern)
    # localCheckpoint (not persist): each round's chained replaces nest
    # in the LOGICAL plan, and at real-vocab merge counts the
    # accumulated expression tree OOMs the driver during planning —
    # truncating lineage per round keeps every round's plan O(batch),
    # at the cost of pinning one word-table copy in executor storage
    # (released one round behind the materialization frontier)
    cur = words.select(_wrap(F.col("word")).alias("w"), "c").localCheckpoint(eager=True)
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
            nxt = cur.select(expr.alias("w"), "c").localCheckpoint(eager=True)
            release_local_checkpoint(cur)
            cur = nxt
    finally:
        release_local_checkpoint(cur)
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


def apply_bpe_fast(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """`apply_bpe` for the real-vocab regime: the chained-replace
    apply nests one expression per merge — at 30k-50k merges the plan
    tree is the same driver-heap bomb the training loop hit. This twin
    BROADCASTS the merge-rank table (the learned model is tiny by
    definition) into ONE vectorized mapInPandas kernel that segments
    each word by iterative lowest-rank merging — the classic BPE
    inference loop every production tokenizer runs.

    Equivalence with training-order chained replaces (the oracled
    semantics): a pair containing a merged symbol m_r can only have
    been LEARNED after m_r existed, so its rank is > r — applying
    merge r can never create an occurrence of an earlier-rank pair,
    hence one LTR pass per rank in training order and iterative
    lowest-rank-first produce identical segmentations (parity-gated in
    tests/test_bpe.py).

    Plan shape: zero shuffle, zero joins — a narrow map over the word
    table with an O(model) broadcast; per word the loop is
    O(len * merges_applied), and corpus-scale tokenization should run
    it over DISTINCT words (vocabulary-sized work) then broadcast-join
    segmentations back."""
    import pandas as pd  # noqa: F811

    from pyspark.sql import types as T

    ranks: dict[tuple[str, str], int] = {
        (a, b): step for step, a, b, _m, _c in merges
    }

    out_schema = T.StructType(
        [
            T.StructField(word_col, T.StringType()),
            T.StructField("segmented", T.StringType()),
        ]
    )

    def segment_word(word: str) -> str:
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return " ".join(syms)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "segmented": pdf[word_col].map(segment_word),
                }
            )

    return words.select(word_col).mapInPandas(run, schema=out_schema)


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
