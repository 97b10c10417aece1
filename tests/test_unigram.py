"""Unigram-LM (SentencePiece-style) tokenizer training
(operators/unigram.py, r14 — Kudo 2018, hard-EM configuration).

Pins exact parity with a pure-Python reference implementation (seed
substring counts, (count DESC, piece ASC) selection, integer micro-nat
costs with Laplace add-1 smoothing, Viterbi with (cost, segmentation
string) tie-break, per-round shrink), on the same fixture corpus the
BPE trainer's parity test uses.
"""

from __future__ import annotations

import collections
import math
import re

import pytest

TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest lowest",
]


def _ref_unigram(
    texts: list[str],
    rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    seed_multi: int = 48,
    keep_multi: int = 32,
) -> dict[str, tuple[int, int]]:
    """Reference trainer: {piece: (cnt, cost_unat)} after `rounds`."""
    words: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if re.match(r"^[a-z0-9]+$", w) and len(w) <= max_word_len:
                words[w] += 1

    def costed(sel: dict[str, int]) -> dict[str, tuple[int, int]]:
        total, k = sum(sel.values()), len(sel)
        return {
            p: (c, round(math.log((total + k) / (c + 1)) * 1e6))
            for p, c in sel.items()
        }

    seed: collections.Counter = collections.Counter()
    for w, c in words.items():
        for s in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - s) + 1):
                seed[w[s : s + k]] += c
    chars = {p for p in seed if len(p) == 1}
    multi = sorted(
        (p for p in seed if len(p) >= 2), key=lambda p: (-seed[p], p)
    )[:seed_multi]
    vocab = costed({p: seed[p] for p in list(chars) + multi})

    def viterbi(w: str) -> str:
        dp: list[tuple[int, str] | None] = [None] * (len(w) + 1)
        dp[0] = (0, "")
        for j in range(1, len(w) + 1):
            best = None
            for k in range(1, min(max_piece_len, j) + 1):
                prev, piece = dp[j - k], w[j - k : j]
                if prev is None or piece not in vocab:
                    continue
                seg = piece if j == k else prev[1] + " " + piece
                cand = (prev[0] + vocab[piece][1], seg)
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        assert dp[len(w)] is not None
        return dp[len(w)][1]

    for _ in range(rounds):
        cnt: collections.Counter = collections.Counter()
        for w, c in words.items():
            for p in viterbi(w).split(" "):
                cnt[p] += c
        multi = sorted(
            (p for p in cnt if len(p) >= 2), key=lambda p: (-cnt[p], p)
        )[:keep_multi]
        vocab = costed({p: cnt.get(p, 0) for p in chars} | {p: cnt[p] for p in multi})
    return vocab


def test_learn_unigram_matches_reference(spark):
    from cdf_spark.operators.unigram import learn_unigram

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {
        r["piece"]: (r["cnt"], r["cost_unat"])
        for r in learn_unigram(df, rounds=2, seed_multi=10, keep_multi=6).collect()
    }
    assert got == _ref_unigram(TEXTS, rounds=2, seed_multi=10, keep_multi=6)
    # multi-char pieces won vocabulary slots (the trainer learned something)
    assert any(len(p) >= 2 for p in got)


def test_viterbi_tie_breaks_on_segmentation_string(spark):
    """Two cost-equal paths for 'abab': ('ab','ab') and ('abab') can't
    tie (different lengths), so force one: cost(abab) == cost(ab)*2 —
    'ab ab' < 'abab' bytewise (space 0x20 sorts first)."""
    from cdf_spark.operators.unigram import viterbi_segment

    words = spark.createDataFrame([("abab", 1)], "word string, c long")
    vocab = [("a", 500), ("b", 500), ("ab", 100), ("abab", 200)]
    (row,) = viterbi_segment(words, vocab).collect()
    assert row["seg"] == "ab ab"


def test_viterbi_covers_all_training_words(spark):
    """Every trained word segments (single chars are always kept);
    a word with an out-of-vocabulary character is dropped, not
    mis-segmented."""
    from cdf_spark.operators.unigram import (
        corpus_words_capped,
        learn_unigram,
        viterbi_segment,
    )

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = [
        (r["piece"], int(r["cost_unat"]))
        for r in learn_unigram(df, rounds=1, seed_multi=5, keep_multi=3).collect()
    ]
    words = corpus_words_capped(df)
    segs = viterbi_segment(words, model)
    assert segs.count() == words.count()
    joined = {r["word"]: r["seg"] for r in segs.collect()}
    assert all(s.replace(" ", "") == w for w, s in joined.items())
    # OOV character: dropped
    oov = spark.createDataFrame([("zzz", 1)], "word string, c long")
    assert viterbi_segment(oov, [("a", 10)]).count() == 0


def test_viterbi_estep_is_shuffle_free(spark):
    """Plan guard: the E-step is a narrow mapInPandas over the word
    table with the model broadcast in the closure — ZERO exchanges."""
    from cdf_spark.operators.unigram import viterbi_segment

    words = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(20)], "word string, c long"
    ).localCheckpoint(eager=True)
    out = viterbi_segment(words, [("w", 10)] + [(str(d), 20) for d in range(10)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0


def test_learn_unigram_guards(spark):
    from cdf_spark.operators.unigram import learn_unigram

    df = spark.createDataFrame([("low",)], "text string")
    with pytest.raises(ValueError, match="rounds"):
        learn_unigram(df, rounds=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        learn_unigram(df, max_piece_len=20, max_word_len=12)
    empty = spark.createDataFrame([("ÜBER",)], "text string")  # no symbol-safe words
    with pytest.raises(ValueError, match="no trainable"):
        learn_unigram(empty)


def test_learn_unigram_property_random_corpora(spark):
    """Property gate: on randomized corpora (skewed Zipf-ish words,
    shared stems, repeated chars — the tie-heavy shapes), the Spark
    trainer equals the pure-Python reference exactly. Catches
    tie-break, selection-order, and smoothing divergences the fixture
    corpus may not exercise."""
    import random

    from cdf_spark.operators.unigram import learn_unigram

    rng = random.Random(14)
    stems = ["ab", "abc", "ba", "aa", "xyz", "x"]
    for trial in range(4):
        vocab_words = [
            s + rng.choice(["", "a", "ab", "ba", "s", "es"])
            for s in stems
            for _ in range(2)
        ]
        texts = [
            " ".join(rng.choices(vocab_words, k=rng.randint(3, 9)))
            for _ in range(6)
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = {
            r["piece"]: (r["cnt"], r["cost_unat"])
            for r in learn_unigram(
                df, rounds=2, max_piece_len=3, seed_multi=6, keep_multi=4
            ).collect()
        }
        want = _ref_unigram(
            texts, rounds=2, max_piece_len=3, seed_multi=6, keep_multi=4
        )
        assert got == want, f"trial {trial}: {got} != {want}"


def test_segment_corpus_order_unk_and_empty(spark):
    """segment_corpus: pieces concatenate in original word order;
    pattern-violating and OOV-character words pass through unsegmented
    (the <unk> passthrough, so detokenization round-trips); documents
    collapse to one row each."""
    from cdf_spark.operators.unigram import learn_unigram, segment_corpus

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = [
        (r["piece"], int(r["cost_unat"]))
        for r in learn_unigram(df, rounds=1, seed_multi=8, keep_multi=4).collect()
    ]
    corpus = spark.createDataFrame(
        [(1, "low lower ÜBER low"), (2, "zzqz new"), (3, "  ")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pieces"] for r in segment_corpus(corpus, model).collect()}
    # word order preserved; ÜBER passes through verbatim
    toks1 = out[1].split(" ")
    assert "ÜBER" in toks1
    assert "".join(toks1) == "lowlowerÜBERlow"
    # detokenization round-trip: stripping spaces re-yields the words
    left = out[1].replace(" ", "")
    assert left == "low lower ÜBER low".replace(" ", "")
    # zzqz has chars the model may lack -> verbatim or segmented, but
    # always reassembles; 'new' segments over kept chars/pieces
    assert "".join(out[2].split(" ")) == "zzqznew"
    # doc 3 has no words -> absent (no piece stream), not a crash
    assert 3 not in out
