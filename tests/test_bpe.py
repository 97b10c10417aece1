"""Distributed BPE tokenizer training (operators/bpe.py, r10).

Pins exact parity with a pure-Python reference implementation of
Sennrich et al. 2016 (overlapping pair counts, deterministic
(count DESC, pair ASC) tie-break, greedy left-to-right non-overlapping
merge application), plus the paren-wrapped replace trick's semantics.
"""

from __future__ import annotations

import collections
import re


def _ref_bpe(texts: list[str], n: int) -> list[tuple[int, str, str, str, int]]:
    """Reference BPE: dict-of-symbol-tuples, explicit greedy merge."""
    words: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if re.match(r"^[a-z0-9]+$", w):
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, n + 1):
        stats: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        mx = max(stats.values())
        a, b = sorted(p for p, c in stats.items() if c == mx)[0]
        merges.append((step, a, b, a + b, mx))
        new: dict = {}
        for syms, c in vocab.items():
            out: list = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_learn_bpe_matches_reference(spark):
    from cdf_spark.operators.bpe import learn_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lowest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert learn_bpe(df, n_merges=6) == _ref_bpe(texts, 6)


def test_learn_bpe_repeated_symbol_greedy(spark):
    """'aaaa' counts (a,a) overlapping (3 per word) but merges
    non-overlapping left-to-right: aaaa -> (aa)(aa), aaa -> (aa)(a)."""
    from cdf_spark.operators.bpe import apply_bpe, learn_bpe

    texts = ["aaaa aaa aaaa"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = learn_bpe(df, n_merges=1)
    assert merges == _ref_bpe(texts, 1)
    # overlapping counts: aaaa has 3 (a,a) pairs and appears twice, aaa has 2
    assert merges[0][1:] == ("a", "a", "aa", 8)
    words = spark.createDataFrame([("aaaa",), ("aaa",)], "word string")
    seg = {r.word: r.segmented for r in apply_bpe(words, merges).collect()}
    assert seg == {"aaaa": "aa aa", "aaa": "aa a"}


def test_apply_bpe_training_order(spark):
    """Merges apply in training order: with merges (l,o)->(lo),(lo,w)
    the word 'low' becomes one token; without the first merge the
    second can never fire."""
    from cdf_spark.operators.bpe import apply_bpe

    words = spark.createDataFrame([("low",), ("owl",)], "word string")
    merges = [(1, "l", "o", "lo", 5), (2, "lo", "w", "low", 4)]
    seg = {r.word: r.segmented for r in apply_bpe(words, merges).collect()}
    assert seg["low"] == "low"
    assert seg["owl"] == "o w l"


def test_learn_bpe_random_corpora_match_reference(spark):
    """Randomized parity: tiny alphabets force heavy pair ties (the
    tie-break path) and repeated symbols (the overlap-count vs
    non-overlap-merge distinction)."""
    import random

    rng = random.Random(42)
    for trial in range(4):
        alpha = "ab" if trial % 2 == 0 else "abc"
        texts = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(rng.randint(2, 5))
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        from cdf_spark.operators.bpe import learn_bpe

        got = learn_bpe(df, n_merges=5)
        want = _ref_bpe(texts, 5)
        assert got == want, f"trial {trial}: {texts}"


def test_learn_bpe_batched_matches_sequential(spark):
    """r11 batched training: per round, a pairwise-independent top-K
    batch applies in one pass. EXACTNESS is the contract — batched
    merge lists must equal the pure-Python sequential reference
    byte-for-byte, including tie-breaks and the collision guard (a
    merged string that already exists as a symbol must stop the
    batch: 'ing' via in+g vs i+ng)."""
    from cdf_spark.operators.bpe import learn_bpe

    corpora = [
        # the fixture corpus: real-word structure, deep merges
        [
            "low lower lowest low low",
            "new newer newest new",
            "wide wider widest lowest",
        ],
        # dual-path collision bait: 'abc' reachable via (ab,c) and
        # (a,bc); heavy repetition makes both paths competitive
        [
            "abc abc abc ab ab ab bc bc bc a b c",
            "xabc xabc abcx cab cab",
        ],
        # tie-heavy tiny alphabet
        ["ab ba ab ba aab abb bba baa", "aba bab aba bab"],
    ]
    for texts in corpora:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        want = _ref_bpe(texts, 12)
        for batch in (2, 4, 8):
            got = learn_bpe(df, n_merges=12, batch=batch)
            assert got == want, f"batch={batch}: {texts}"


def test_learn_bpe_batched_random_adversarial(spark):
    """Randomized batched parity on small alphabets — maximal pair
    conflicts (batches collapse to the single-argmax fallback) and
    constant symbol-string collisions; any inexactness in the batch
    rule trips here."""
    import random

    from cdf_spark.operators.bpe import learn_bpe

    rng = random.Random(7)
    for trial in range(4):
        alpha = "abc" if trial % 2 == 0 else "abcd"
        texts = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
                for _ in range(rng.randint(4, 12))
            )
            for _ in range(rng.randint(2, 4))
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        want = _ref_bpe(texts, 8)
        got = learn_bpe(df, n_merges=8, batch=4)
        assert got == want, f"trial {trial}: {texts}"


def test_apply_bpe_fast_matches_chained_replace(spark):
    """The real-vocab inference kernel (broadcast ranks, iterative
    lowest-rank merging) must segment EXACTLY like the oracled
    chained-replace apply, including on the saturation-trained model
    (every merge the corpus supports) — the equivalence proof in the
    docstring, measured."""
    from cdf_spark.operators.bpe import (
        apply_bpe,
        apply_bpe_fast,
        corpus_words,
        learn_bpe,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lowest",
        "abc abc ab bc a b c abcabc",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (4, 12, 64):  # 64 > available merges: saturation model
        merges = learn_bpe(df, n_merges=n, batch=4)
        words = corpus_words(df).select("word")
        slow = {r.word: r.segmented for r in apply_bpe(words, merges).collect()}
        fast = {r.word: r.segmented for r in apply_bpe_fast(words, merges).collect()}
        assert fast == slow, f"n={n}"


def test_apply_bpe_fast_random_parity(spark):
    import random

    from cdf_spark.operators.bpe import apply_bpe, apply_bpe_fast, corpus_words, learn_bpe

    rng = random.Random(11)
    for trial in range(3):
        texts = [
            " ".join(
                "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(4, 10))
            )
            for _ in range(3)
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        merges = learn_bpe(df, n_merges=10)
        words = corpus_words(df).select("word")
        slow = {r.word: r.segmented for r in apply_bpe(words, merges).collect()}
        fast = {r.word: r.segmented for r in apply_bpe_fast(words, merges).collect()}
        assert fast == slow, f"trial {trial}: {texts}"
