"""Distributed unigram-LM (SentencePiece-style) tokenizer training —
Kudo 2018, "Subword Regularization", the trainer Llama/T5-class
pipelines actually ship. Completes the tokenizer family next to
`operators/bpe.py` (Sennrich 2016): BPE grows a vocabulary bottom-up
by merging; the unigram trainer starts from an over-complete seed of
frequent substrings and SHRINKS it by EM — segment the corpus with the
current piece model (E), re-estimate piece probabilities from the
segmentation (M), prune the weakest pieces, repeat.

The reference engine has no tokenizer surface (its text ops are
row-level contracts; see crates/cdf-contract) — beyond-ref,
first-class for LLM data work.

Exactness discipline (the house rule, shared with the BPE/KN-LM
oracles): this is HARD EM (Viterbi segmentation, the dominant
production configuration) with every model weight an exact INTEGER —
piece costs are micro-nats, round(1e6 * ln((total + K) / (cnt + 1)))
over exact integer counts with Laplace add-1 smoothing (zero-count
kept pieces stay finite), so a Viterbi path cost is an exact integer
sum and the argmin tie-breaks on (cost, segmentation string) — pure
integer/ASCII comparisons that DuckDB replays bit-for-bit. The SQL
oracle re-trains the ENTIRE loop (seed counts, selection, costs, an
unrolled per-position DP, re-estimation, pruning): a wrong count, a
wrong tie-break, or a wrong DP transition at any stage diverges every
later stage and hash-mismatches.

Training filters (stated contract): words are symbol-safe
(^[a-z0-9]+$, the BPE alphabet rule) and capped at ``max_word_len``
characters (SentencePiece itself length-filters training sentences and
caps piece length); longer words are excluded from TRAINING only —
inference covers them through the always-kept single-character pieces.

Scale posture (100 TB corpus):
- The corpus collapses to the DISTINCT-WORD table once (one
  tokenize+count shuffle — the only corpus-scale pass, shared with
  `bpe.learn_bpe`); every EM round runs over that vocabulary-sized
  table.
- Seed counting is one combinable aggregation over exploded
  substrings (<= max_word_len * max_piece_len per word); seed
  selection is a distributed top-k (TakeOrderedAndProject), never a
  global sort.
- The E-step is a ZERO-SHUFFLE narrow `mapInPandas` Viterbi kernel
  with the O(model) piece-cost table broadcast in the closure — the
  `bpe.apply_bpe_fast` shape; per word the DP is
  O(len * max_piece_len).
- The M-step is one combinable piece-count aggregation + a
  distributed top-k prune. Driver state per round is the model itself
  (O(vocab) rows) plus a 1-row totals collect — bounded by
  definition, exactly like the BPE merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import WORD_PATTERN

__all__ = [
    "learn_unigram",
    "seed_piece_counts",
    "segment_corpus",
    "unigram_vocab_df",
    "viterbi_segment",
]

MICRO = 1_000_000


def corpus_words_capped(
    df: DataFrame,
    text_col: str = "text",
    word_pattern: str = WORD_PATTERN,
    max_word_len: int = 12,
) -> DataFrame:
    """Distinct-word table (word, c) under the training filters."""
    w = F.col("word")
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(w.rlike(word_pattern) & (F.length(w) <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def seed_piece_counts(words: DataFrame, max_piece_len: int = 4) -> DataFrame:
    """Occurrence counts of every substring of length 1..max_piece_len
    across the word table, weighted by word count — the over-complete
    seed candidate pool (Kudo 2018 seeds from frequent substrings).
    One combinable aggregation; the explode fan-out is bounded by
    max_word_len * max_piece_len per word."""
    ln = F.length("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), ln),
            lambda s: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), ln - s + 1)),
                lambda k: F.substring(F.col("word"), s, k),
            ),
        )
    )
    return (
        words.select("c", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("c").alias("cnt"))
    )


def _costed(sel: DataFrame) -> DataFrame:
    """Attach integer micro-nat costs: round(1e6 * ln((total + K) /
    (cnt + 1))) with total/K over the SELECTED pieces — Laplace add-1
    keeps zero-count kept pieces finite. The ln runs as a Spark (JVM)
    expression so the oracle's `ln` replays it bit-for-bit; the 1-row
    totals collect is bounded driver state."""
    total, k = sel.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)), F.count(F.lit(1))
    ).collect()[0]
    if not k:
        raise ValueError("empty piece selection — no trainable corpus words")
    return sel.select(
        "piece",
        "cnt",
        F.round(
            F.log(
                F.lit(float(int(total) + int(k)))
                / (F.col("cnt") + F.lit(1)).cast("double")
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("cost_unat"),
    )


def viterbi_segment(
    words: DataFrame,
    vocab: list[tuple[str, int]],
    max_piece_len: int = 4,
) -> DataFrame:
    """Hard-EM E-step: per word, the min-cost segmentation under the
    integer piece costs; ties break on the smaller segmentation
    STRING (ASCII bytewise — identical in Python and SQL). Zero
    shuffles: a narrow vectorized kernel over the word table with the
    O(model) cost table broadcast in the closure. Words containing a
    character outside the vocabulary are dropped (cannot happen in
    training, where every corpus character is a kept piece).

    Output: (word, c, seg) with pieces space-joined."""
    import pandas as pd
    from pyspark.sql import types as T

    costs: dict[str, int] = {p: int(c) for p, c in vocab}

    def segment(word: str) -> str | None:
        n = len(word)
        # dp[j] = (cost, seg) of the best segmentation of word[:j]
        dp: list[tuple[int, str] | None] = [None] * (n + 1)
        dp[0] = (0, "")
        for j in range(1, n + 1):
            best: tuple[int, str] | None = None
            for k in range(1, min(max_piece_len, j) + 1):
                prev = dp[j - k]
                if prev is None:
                    continue
                pc = costs.get(word[j - k : j])
                if pc is None:
                    continue
                seg = word[j - k : j] if j == k else prev[1] + " " + word[j - k : j]
                cand = (prev[0] + pc, seg)
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        return dp[n][1] if dp[n] is not None else None

    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("c", T.LongType()),
            T.StructField("seg", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            segs = pdf["word"].map(segment)
            keep = segs.notna()
            yield pd.DataFrame(
                {
                    "word": pdf["word"][keep],
                    "c": pdf["c"][keep],
                    "seg": segs[keep],
                }
            )

    return words.select("word", F.col("c").cast("long")).mapInPandas(
        run, schema=out_schema
    )


def learn_unigram(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_multi: int = 48,
    keep_multi: int = 32,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Train a unigram-LM piece vocabulary. Returns the final model as
    a DataFrame (piece, cnt, cost_unat).

    Loop: seed = every single character (coverage guarantee) + the
    ``seed_multi`` most frequent multi-character substrings (ties by
    piece ascending). Each of the ``rounds`` EM rounds Viterbi-segments
    the word table under the current costs, re-counts piece usage
    (weighted by word count), prunes to every single character + the
    ``keep_multi`` best multi-character pieces by (count DESC, piece
    ASC) — the Kudo shrink schedule with a deterministic loss proxy
    (usage count; zero-usage chars survive through smoothing) — and
    re-estimates costs."""
    if rounds < 1:
        raise ValueError("rounds must be positive")
    if not 1 <= max_piece_len <= max_word_len:
        raise ValueError("need 1 <= max_piece_len <= max_word_len")
    if keep_multi < 1 or seed_multi < 1:
        raise ValueError("seed_multi and keep_multi must be positive")
    from ..plans.checkpoint import release_local_checkpoint

    words = corpus_words_capped(df, text_col, word_pattern, max_word_len)
    # every round's E-step re-reads the word table — pin it once
    # (released when the last round's counts are materialized)
    words = words.localCheckpoint(eager=True)
    # the seed aggregation is the widest pre-EM pass (explode fan-out
    # up to max_word_len * max_piece_len per word) and feeds three
    # consumers (chars, the top-k, the cost/collect) — pin it once,
    # released as soon as the initial model is collected
    seed = seed_piece_counts(words, max_piece_len).localCheckpoint(eager=True)
    chars = seed.filter(F.length("piece") == 1).localCheckpoint(eager=True)
    multi0 = (
        seed.filter(F.length("piece") >= 2)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_multi)
    )
    vocab_df = _costed(multi0.unionByName(chars.select("piece", "cnt")))
    model = [(r["piece"], int(r["cost_unat"])) for r in vocab_df.collect()]
    release_local_checkpoint(seed)
    prev_cnt: DataFrame | None = None
    for _ in range(rounds):
        seg = viterbi_segment(words, model, max_piece_len)
        cnt = (
            seg.select("c", F.explode(F.split("seg", " ")).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("c").alias("cnt"))
            .localCheckpoint(eager=True)  # feeds the prune + char heal twice
        )
        if prev_cnt is not None:
            release_local_checkpoint(prev_cnt)
        prev_cnt = cnt
        multi = (
            cnt.filter(F.length("piece") >= 2)
            .orderBy(F.col("cnt").desc(), F.col("piece").asc())
            .limit(keep_multi)
        )
        kept_chars = (
            chars.select("piece")
            .join(cnt, on="piece", how="left")
            .select("piece", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        )
        vocab_df = _costed(multi.unionByName(kept_chars))
        model = [(r["piece"], int(r["cost_unat"])) for r in vocab_df.collect()]
    release_local_checkpoint(words)
    return vocab_df


def unigram_vocab_df(
    spark: SparkSession, model: list[tuple[str, int, int]]
) -> DataFrame:
    return spark.createDataFrame(model, "piece string, cnt bigint, cost_unat bigint")


def segment_corpus(
    df: DataFrame,
    model: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Corpus tokenization with a trained unigram model — the apply
    path users run after `learn_unigram`, shaped for 100 TB: the
    corpus collapses to DISTINCT words (one shuffle), the Viterbi
    kernel runs over that vocabulary-sized table (narrow, model
    broadcast), and segmentations broadcast-join back onto the
    position-exploded word stream, re-assembled per document in
    original word order.

    Contract: words outside the symbol-safe pattern or containing a
    character the model lacks pass through UNSEGMENTED as a single
    piece (the <unk> passthrough — loud in the output, never dropped,
    so detokenization round-trips). Documents with no words yield an
    empty piece stream.

    Output: (id_col, pieces) with pieces space-joined across the whole
    document in word order.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .withColumn("c", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)  # feeds the kernel + the size gate
    )
    segmentable = words.filter(
        F.col("word").rlike(word_pattern)
    )
    segs = viterbi_segment(segmentable, model, max_piece_len).select(
        "word", F.col("seg")
    )
    # the seg map is DISTINCT-WORD-sized, not model-sized: broadcast
    # under the suite's 2M-row gate (the PageRank/Bradley-Terry rule),
    # shuffle-join above it
    hint = F.broadcast if words.count() <= 2_000_000 else (lambda d: d)
    stream = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .join(hint(segs), on="word", how="left")
        .select(
            id_col,
            "pos",
            F.coalesce(F.col("seg"), F.col("word")).alias("_p"),  # unk passthrough
        )
    )
    return (
        stream.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_p"))),
                    lambda s: s["_p"],
                ),
                " ",
            ).alias("pieces")
        )
    )
