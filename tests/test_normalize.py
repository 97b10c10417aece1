"""Edge-case tests for `operators/normalize` — HTML boilerplate
stripping, control-char cleanup, Unicode NFC, URL canonicalization.

The registry queries (`html_boilerplate_strip`, `unicode_nfc_normalize`,
`url_canonicalize_dedup`) prove oracle parity over the corpus; these
tests pin the hazards the fixtures cannot reach: entity double-decode
order, nested/multiline script bodies, null propagation, URL corner
forms (root slash, tracking-only query, param-name prefix traps).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.normalize import (
    canonical_url,
    clean_text,
    nfc,
    strip_html,
    url_host,
)


def _one(spark, col_expr, value: str | None) -> str | None:
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col_expr(F.col("v")).alias("out")).collect()[0].out


# ---------------------------------------------------------------- HTML


def test_strip_html_entity_decode_order(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — one decode, not two.
    assert _one(spark, strip_html, "a &amp;lt; b") == "a &lt; b"
    assert _one(spark, strip_html, "x &amp; y &lt; z") == "x & y < z"


def test_strip_html_script_style_wholesale(spark):
    html = (
        "<p>keep</p><script type='t'>\nvar a = '<b>not text</b>';\n</script>"
        "<style media='all'>.c { color: red }</style><p>also</p>"
    )
    assert _one(spark, strip_html, html) == "keep also"


def test_strip_html_plain_text_passthrough(spark):
    assert _one(spark, strip_html, "no tags at all") == "no tags at all"


def test_strip_html_whitespace_collapse_and_null(spark):
    assert _one(spark, strip_html, "<div>a</div>\n\n<div>b</div>") == "a b"
    assert _one(spark, strip_html, None) is None


# ---------------------------------------------------------------- clean


def test_clean_text_control_and_zero_width(spark):
    raw = "a\x00b\x08\x7f c​d ⁠e﻿ f"
    # ⁠ (word joiner) is NOT in the strip set — only zwsp/zwnj/zwj/bom.
    assert _one(spark, clean_text, raw) == "ab cd ⁠e f"


def test_clean_text_keeps_tab_newline_as_whitespace(spark):
    assert _one(spark, clean_text, "a\tb\nc\r\nd") == "a b c d"


# ----------------------------------------------------------------- NFC


def test_nfc_composes_and_is_idempotent(spark):
    decomposed = "café Å"
    composed = _one(spark, nfc, decomposed)
    assert composed == "café Å"
    assert _one(spark, nfc, composed) == composed
    assert _one(spark, nfc, None) is None


# ----------------------------------------------------------------- URL


@pytest.mark.parametrize(
    "raw,want",
    [
        # tracking-only query -> dangling '?' dropped
        ("https://Ex.com/a?utm_source=x", "https://ex.com/a"),
        # tracking first, survivor promoted to '?'
        ("http://h.io/p?utm_a=1&q=2", "http://h.io/p?q=2"),
        # tracking in the middle
        ("http://h.io/p?a=1&fbclid=z&b=2", "http://h.io/p?a=1&b=2"),
        # fragment dropped, trailing slash stripped on non-root path
        ("http://h.io/a/b/#frag", "http://h.io/a/b"),
        # root slash kept
        ("http://h.io/", "http://h.io/"),
        # param NAMES that merely contain 'ref' are kept
        ("http://h.io/p?pref=1&xref=2", "http://h.io/p?pref=1&xref=2"),
        # scheme+host lowered, path case preserved
        ("HTTPS://WWW.Ex.COM/CaseSensitive", "https://www.ex.com/CaseSensitive"),
    ],
)
def test_canonical_url(spark, raw, want):
    assert _one(spark, canonical_url, raw) == want


def test_url_host_drops_port_and_lowers(spark):
    assert _one(spark, url_host, "https://Ex.COM:8443/p?a=1") == "ex.com"
    assert _one(spark, url_host, "http://sub.host.io/x") == "sub.host.io"


# ------------------------------------------------------------------ ORC
# (housed here rather than a one-test module: the ORC scan is the only
# non-normalize addition of this change set)


def test_orc_scan_pushdown_evidence(spark, tmp_path):
    from cdf_spark.expressions.ast import Col
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.sources.files import FileResource, pushdown_evidence

    src = spark.range(0, 1000).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS v", "CAST(id % 3 AS STRING) AS tag"
    )
    src.repartition(3).write.mode("overwrite").orc(str(tmp_path / "t"))

    res = FileResource(ResourceDescriptor(resource_id="t"), str(tmp_path / "t"), format="orc")
    df, plan = res.scan(
        spark,
        ScanRequest("t", projection=["k", "v"], predicates=[Col("v") > 3.0]),
    )
    rows = df.collect()
    assert len(rows) == sum(1 for i in range(1000) if i % 7 > 3)
    assert df.columns == ["k", "v"]
    ev = pushdown_evidence(df)
    # the predicate must reach the ORC reader, and the untouched
    # column must be pruned out of the read schema
    assert any("GreaterThan(v" in f for f in ev["pushed_filters"]), ev
    assert "tag" not in str(ev["read_schema"]), ev
    assert "k" in str(ev["read_schema"]), ev


# ----------------------------------------------------------- gopher
# (the normalize/curation quality additions of this change set)


def test_gopher_filter_rule_order_and_edges(spark):
    from cdf_spark.operators.curation import gopher_filter

    rows = [
        (1, ""),  # empty -> min_words fires first
        (2, "word " * 20 + "word"),  # 21 words, no stopwords -> min_words
        (3, " ".join(["the", "a", "and", "of"] * 10)),  # 40 words, mwl=2.25 -> mean_word_len
        (4, " ".join(["123456"] * 40) + " the a"),  # no-alpha words -> mean_word_len? mwl=6*... check below
        (5, " ".join(["then"] * 38) + " the a"),  # 40 words, mwl~3.9, 2 stopwords -> kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.kept, r.first_violation) for r in gopher_filter(df).collect()}
    assert got[1] == (False, "min_words")
    assert got[2] == (False, "min_words")
    assert got[3] == (False, "mean_word_len")
    # doc 4: 42 words, mean len (6*40+3+1+41 sep -> (244+41? ) ...) computed
    # by the operator itself; the pinned fact is WHICH rule fires: the
    # mean-word-len window (5.83) precedes the alpha rule in the order.
    assert got[4] == (False, "mean_word_len")
    assert got[5][0] is True and got[5][1] is None


def test_gopher_alpha_rule_fires_when_earlier_rules_pass(spark):
    from cdf_spark.operators.curation import gopher_filter

    # 40 words, mean word length 4.875 (inside [3.9, 5.1]), 2 distinct
    # stopwords (the, of), but 38/40 words are digits -> alpha ratio
    # 0.05 -> alpha_words is the first rule left to fire
    text = " ".join(["12345"] * 38) + " the of"
    df = spark.createDataFrame([(9, text)], ["doc_id", "text"])
    row = gopher_filter(df).collect()[0]
    assert row.kept is False and row.first_violation == "alpha_words", row


# -------------------------------------------------------------- C4


def test_c4_line_filter_rules(spark):
    from cdf_spark.operators.normalize import c4_line_filter

    page = "\n".join([
        "This line is long enough and it terminates.",   # kept
        "Please enable JavaScript to view comments",      # banned + no punct
        "no terminal punctuation on this line here",      # no punct
        "Short stop.",                                    # < 5 words
        'He said "five words quoted here."',              # kept (quote end)
        "This site uses COOKIES to track you.",           # banned (case-insensitive)
    ])
    df = spark.createDataFrame([(1, page)], ["doc_id", "text"])
    r = c4_line_filter(F.col("text"))
    row = df.select(
        r["clean_text"].alias("c"), r["n_lines_kept"].alias("k"),
        r["n_lines_total"].alias("t"),
    ).collect()[0]
    assert row.t == 6 and row.k == 2, row
    assert row.c.splitlines() == [
        "This line is long enough and it terminates.",
        'He said "five words quoted here."',
    ]


# ------------------------------------------------- idempotence batch
# Canonicalizers must be IDEMPOTENT: applying them twice is the same
# as once (otherwise two pipeline stages that each "normalize
# defensively" produce different dedup identities). One Spark pass
# over a generated batch checks f(f(x)) == f(x) for every operator.


def test_normalizers_idempotent_on_generated_batch(spark):
    import random

    rng = random.Random(8)
    frags = [
        "word", "<b>", "</b>", "&amp;", "&lt;", "  ", "\n", ".",
        "<script>x</script>", "UPPER", "café", "á", "\x07", "​",
    ]
    texts = ["".join(rng.choice(frags) for _ in range(rng.randint(1, 12))) for _ in range(200)]
    url_bits = [
        "https://", "HTTP://", "Ex.COM", "h.io", "/a", "/B/", "?utm_x=1",
        "?q=2", "&ref=z", "&k=v", "#frag", ":8080",
    ]
    urls = [
        rng.choice(url_bits[:2]) + rng.choice(url_bits[2:4])
        + "".join(rng.choice(url_bits[4:]) for _ in range(rng.randint(0, 4)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(list(zip(texts, urls)), ["t", "u"])
    checks = df.select(
        (strip_html(strip_html(F.col("t"))) == strip_html(F.col("t"))).alias("html_ok"),
        (clean_text(clean_text(F.col("t"))) == clean_text(F.col("t"))).alias("clean_ok"),
        (nfc(nfc(F.col("t"))) == nfc(F.col("t"))).alias("nfc_ok"),
        (canonical_url(canonical_url(F.col("u"))) == canonical_url(F.col("u"))).alias("url_ok"),
        F.col("t"), F.col("u"),
    )
    bad = checks.filter(
        ~F.col("html_ok") | ~F.col("clean_ok") | ~F.col("nfc_ok") | ~F.col("url_ok")
    ).collect()
    assert not bad, bad[:5]


def test_lm_perplexity_scores_semantics(spark):
    """Common-token documents score LOWER mean NLL than rare-token
    documents under the corpus-trained unigram LM; integer micro-nat
    sums make the score exactly reproducible run-to-run."""
    from cdf_spark.operators.curation import lm_perplexity_scores

    rows = [
        ("common", "the the the cat sat on the mat the end"),
        ("mixed", "the cat contemplated quixotic zephyrs"),
        ("rare", "quixotic zephyrs vex jumbled sphinxes"),
    ] + [(f"filler{i}", "the cat sat on the mat again and again") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in lm_perplexity_scores(df).collect()}
    assert got["common"].nll_nats < got["mixed"].nll_nats < got["rare"].nll_nats
    assert got["common"].n_tokens == 10
    # exact reproducibility across a second independent run
    got2 = {r.doc_id: r.nll_nats for r in lm_perplexity_scores(df).collect()}
    assert got2 == {k: v.nll_nats for k, v in got.items()}


def test_lm_bigram_perplexity_orders_by_fluency(spark):
    """Word ORDER carries signal under the bigram LM: a document made
    of corpus-frequent TRANSITIONS scores lower than a shuffled
    bag of the same common words."""
    from cdf_spark.operators.curation import (
        lm_bigram_perplexity_scores,
        lm_perplexity_scores,
    )

    fluent = "the cat sat on the mat"
    shuffled = "mat the on sat cat the"  # same multiset of words
    rows = [("fluent", fluent), ("shuffled", shuffled)] + [
        (f"bg{i}", fluent) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    bg = {r.doc_id: r.nll_nats for r in lm_bigram_perplexity_scores(df).collect()}
    assert bg["fluent"] < bg["shuffled"]  # order matters to the bigram LM
    un = {r.doc_id: r.nll_nats for r in lm_perplexity_scores(df).collect()}
    assert un["fluent"] == un["shuffled"]  # ...and not to the unigram LM
    got = lm_bigram_perplexity_scores(df).collect()
    assert all(r.n_tokens == 6 for r in got)


def test_lm_index_incremental_matches_batch_lm(spark, tmp_path):
    """After folding the corpus in through TWO incremental updates,
    index scores equal the one-shot corpus-trained LM EXACTLY (same
    counts -> same micro-nat integers); a crashed update leaves the
    index at its old version; unseen tokens score at the add-one
    floor."""
    from cdf_spark.operators.curation import LMIndex, lm_perplexity_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    half1 = docs.filter("doc_id like '%0' or doc_id like '%1' or doc_id like '%2'")
    half2 = docs.exceptAll(half1)
    idx = LMIndex(tmp_path / "lm")
    m1 = idx.update(spark, half1)
    m2 = idx.update(spark, half2)
    assert m2["version"] == 2 and m2["n_total"] > m1["n_total"]
    got = {r.doc_id: (r.n_tokens, r.nll_nats) for r in idx.score(spark, docs).collect()}
    want = {
        r.doc_id: (r.n_tokens, r.nll_nats)
        for r in lm_perplexity_scores(docs).collect()
    }
    assert got == want  # exact equality, not approximate
    # unseen tokens score at the add-one floor (worse than anything seen)
    probe = spark.createDataFrame(
        [("new", "zzqqxxyy zzqqxxyy wwvvuu")], "doc_id string, text string"
    )
    floor = idx.score(spark, probe).collect()[0]
    assert floor.nll_nats >= max(v[1] for v in want.values())
    # crashed update (write fails) leaves version + scores unchanged
    import pyspark.sql.readwriter as _rw
    real_parquet = _rw.DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if "counts_v3" in str(path):
            raise OSError("simulated crash mid-update")
        return real_parquet(self, path, *a, **kw)

    _rw.DataFrameWriter.parquet = boom
    try:
        import pytest as _pytest

        with _pytest.raises(OSError):
            idx.update(spark, probe)
    finally:
        _rw.DataFrameWriter.parquet = real_parquet
    assert idx._meta()["version"] == 2  # old version intact
    got2 = {r.doc_id: (r.n_tokens, r.nll_nats) for r in idx.score(spark, docs).collect()}
    assert got2 == want


def test_boilerplate_line_removal_zero_copy_discipline(spark):
    """Frequency-boilerplate drops ALL copies (unlike segment dedup's
    keep-first); unique lines survive; an all-boilerplate doc keeps an
    empty string, not a silent disappearance."""
    from cdf_spark.operators.normalize import boilerplate_line_removal

    footer = "all rights reserved"
    rows = [
        (0, f"unique zero\n{footer}"),
        (1, f"unique one\n{footer}"),
        (2, f"unique two\n{footer}"),
        (3, footer),  # all boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_line_removal(df, min_doc_frac=0.5).collect()}
    assert out[0].text_kept == "unique zero" and out[0].n_dropped == 1
    assert out[3].text_kept == "" and out[3].n_dropped == 1 and out[3].n_lines == 1
    # no doc keeps any copy of the footer
    assert all(footer not in r.text_kept for r in out.values())


def test_mojibake_repair_roundtrip(spark):
    """The generated map repairs every cp1252-mojibake form of its
    target chars; clean ASCII passes through byte-identical."""
    from cdf_spark.operators.normalize import MOJIBAKE_FIXES, mojibake_repair

    good = "déjà-vu – “quoted” café 25° naïve"
    repairable = {g for _bad, g in MOJIBAKE_FIXES}
    # corrupt ONLY the repairable chars (” is undefined in cp1252 and
    # correctly absent from the generated map — it stays intact)
    bad = "".join(
        ch.encode("utf-8").decode("cp1252") if ch in repairable else ch
        for ch in good
    )
    assert bad != good
    df = spark.createDataFrame([(0, bad), (1, "plain ascii text.")], "doc_id long, text string")
    out = {r.doc_id: r for r in mojibake_repair(df).collect()}
    assert out[0].text_fixed == good
    assert out[0].chars_collapsed > 0
    assert out[1].text_fixed == "plain ascii text." and out[1].chars_collapsed == 0
