"""Distributed NB classifier, embedding decontamination, token-budget
mixing — correctness vs brute-force Python and invariants."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.classifier import nb_predict, nb_train
from cdf_spark.operators.curation import embedding_decontamination
from cdf_spark.operators.packing import token_budget_sample


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tok(s: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def test_nb_train_matches_bruteforce(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "le chat noir", "fr"),
        (3, "the dog ran", "en"),
        (4, "le chien et le chat", "fr"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {(r.label, r.tok): (r.c, r.lp_unat) for r in nb_train(df).collect()}
    # brute force
    by_label: dict[str, Counter] = {}
    for _, text, lang in rows:
        by_label.setdefault(lang, Counter()).update(_tok(text))
    vocab = {t for c in by_label.values() for t in c}
    v = len(vocab)
    for lang, c in by_label.items():
        n = sum(c.values())
        for tok, cnt in c.items():
            lp = round((math.log(cnt + 1.0) - math.log(n + v)) * 1e6)
            assert got[(lang, tok)] == (cnt, lp), (lang, tok)
    assert len(got) == sum(len(c) for c in by_label.values())


def test_nb_predict_argmax_and_margin(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "le chat noir", "fr"),
        (3, "the dog ran on the mat", "en"),
        (4, "le chien et le chat", "fr"),
        (5, "the cat and the dog", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in nb_predict(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for r in out.values():
        assert r.margin_unat >= 0
    # brute-force replication of the scoring rule
    by_label: dict[str, Counter] = {}
    for _, text, lang in rows:
        by_label.setdefault(lang, Counter()).update(_tok(text))
    vocab = {t for c in by_label.values() for t in c}
    v = len(vocab)
    d_tot = len(rows)
    d_l = Counter(lang for _, _, lang in rows)
    n_l = {la: sum(c.values()) for la, c in by_label.items()}
    for doc_id, text, lang in rows:
        scores = {}
        for la in by_label:
            prior = round((math.log(d_l[la]) - math.log(d_tot)) * 1e6)
            s = prior
            for tok in _tok(text):
                cnt = by_label[la].get(tok)
                if cnt:
                    s += round((math.log(cnt + 1.0) - math.log(n_l[la] + v)) * 1e6)
                else:
                    s += round(-math.log(n_l[la] + v) * 1e6)
            scores[la] = s
        best = sorted(scores, key=lambda la: (-scores[la], la))[0]
        assert out[doc_id].predicted == best, doc_id
        assert out[doc_id].score_unat == scores[best], doc_id
        assert out[doc_id].label == lang


def test_nb_predict_corpus_shape(docs):
    """On the test corpus (whose lang labels deliberately share one
    vocabulary — not linguistically separable) the classifier must
    still emit exactly one prediction per tokenizable doc with a
    non-negative margin."""
    out = nb_predict(docs)
    total = out.count()
    assert total == docs.count()  # every test doc tokenizes
    assert out.select("doc_id").distinct().count() == total
    assert out.filter(F.col("margin_unat") < 0).count() == 0


def test_nb_predict_plan_tokenizes_the_corpus_once(spark):
    """Regression guard (r14): train-and-score derives BOTH the fit
    counts and the scoring stream from one pinned per-(doc,label,tok)
    tf table, so the FINAL plan's only source reads are the bounded
    doc-count legs — never a tokenize re-derivation (it was two full
    tokenize pipelines left lazy)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"alpha beta tok{i % 4}", "en" if i % 2 else "de") for i in range(30)],
            ["doc_id", "text", "lang"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        out = nb_predict(docs, label_col="lang")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the prior/doc-count legs may scan the source (projection-
        # pruned, no text column); the tokenize pipeline must not
        assert "pythonUDF" not in plan
        assert plan.count("Generate") == 0, "explode must live in the pin build"
        out.count()


def test_nb_predict_separable_accuracy(spark):
    """On a corpus whose labels have disjoint vocabularies the
    classifier recovers every training label — the fastText-language-ID
    behavior a curation gate relies on."""
    vocab = {
        "en": ["the", "cat", "dog", "house", "road"],
        "fr": ["le", "chat", "chien", "maison", "rue"],
        "de": ["der", "katze", "hund", "haus", "strasse"],
    }
    rows = []
    i = 0
    for lang, words in vocab.items():
        for k in range(20):
            text = " ".join(words[(k + j) % len(words)] for j in range(6))
            rows.append((i, text, lang))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = nb_predict(df)
    assert out.filter(F.col("predicted") != F.col("label")).count() == 0


def test_embedding_decontamination_flags_planted_dup(spark):
    base = [float(i) for i in range(8)]
    near = [v + (0.001 if i == 0 else 0.0) for i, v in enumerate(base)]
    far = [1.0, -2.0, 3.0, -4.0, 5.0, -6.0, 7.0, -8.0]
    corpus = spark.createDataFrame(
        [(1, near, 0), (2, far, 0)], ["vec_id", "embedding", "label"]
    )
    ev = spark.createDataFrame([(100, base, 9)], ["vec_id", "embedding", "label"])
    out = {r.vec_id: r for r in embedding_decontamination(corpus, ev, 0.99).collect()}
    assert out[1].contaminated and out[1].matched_eval_id == 100
    assert not out[2].contaminated
    assert out[1].max_sim > 0.999


def test_embedding_decontamination_one_row_per_corpus_vec(emb):
    corpus, ev = emb.filter("label < 8"), emb.filter("label >= 8")
    out = embedding_decontamination(corpus, ev, threshold=0.8)
    assert out.count() == corpus.count()
    assert out.select("vec_id").distinct().count() == corpus.count()


def test_token_budget_sample_meets_targets(docs):
    out = token_budget_sample(docs, budget_tokens=20_000, alpha=0.5)
    rows = out.collect()
    assert rows
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    total_target = 0
    for dom, sel in by_dom.items():
        target = sel[0].target_tokens
        total_target += target
        toks = sum(r.n_tokens for r in sel)
        # greedy fill: the last pick STARTS inside the budget and the
        # overshoot is bounded by one document
        last = max(sel, key=lambda r: r.pick_order)
        assert last.cum_tokens - last.n_tokens < target
        assert toks - target < max(r.n_tokens for r in sel)
    # integer-split targets sum to <= budget (floor division)
    assert total_target <= 20_000


def test_token_budget_alpha_flattens(docs):
    """alpha=0.5 must allocate a LARGER share to small domains than
    their natural proportion (the up-sampling property)."""
    natural = {
        r.domain: r.nd
        for r in docs.select(
            F.col("source").alias("domain"),
            F.size(F.split(F.lower("text"), "[^a-z0-9]+")).alias("nd"),
        )
        .groupBy("domain")
        .agg(F.sum("nd").alias("nd"))
        .collect()
    }
    out = token_budget_sample(docs, budget_tokens=20_000, alpha=0.5)
    targets = {
        r.domain: r.target_tokens
        for r in out.select("domain", "target_tokens").distinct().collect()
    }
    tot_n = sum(natural.values())
    tot_t = sum(targets.values())
    small = min(natural, key=natural.get)
    big = max(natural, key=natural.get)
    if natural[small] < natural[big]:  # only meaningful when skewed
        assert targets[small] / tot_t >= natural[small] / tot_n - 1e-9
        assert targets[big] / tot_t <= natural[big] / tot_n + 1e-9


def test_token_budget_deterministic(docs):
    a = sorted(map(tuple, token_budget_sample(docs, 5_000).collect()))
    b = sorted(map(tuple, token_budget_sample(docs, 5_000).collect()))
    assert a == b


def test_embedding_decontamination_plan_is_combinable_agg(emb):
    """100×-scale shape gate: the per-vector argmax must be a
    COMBINABLE aggregate (map-side partial_min_by before the
    exchange), never a row_number window — a window ships the full
    corpus×|eval| fan through the shuffle; the partial agg cuts it to
    one row per corpus vector."""
    out = embedding_decontamination(
        emb.filter("label < 8"), emb.filter("label >= 8"), threshold=0.8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan
    assert "windowspecdefinition" not in plan


def test_token_budget_sample_plan_has_no_domain_reducer(docs):
    """100×-scale shape gate: the greedy fill must never serialize a
    whole domain through one task. Every window in the plan must be
    keyed by (_pid, domain) — the two-phase cumsum — not by domain
    alone."""
    out = token_budget_sample(docs, budget_tokens=20_000, alpha=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the local per-partition window"
    for spec in specs:
        assert spec.split(",")[0].startswith("_pid"), spec


def test_token_budget_two_phase_matches_single_window(spark, docs):
    """The two-phase cumsum must reproduce the naive global per-domain
    window bit-for-bit (same order key, same cumulative sums)."""
    from pyspark.sql import Window

    out = token_budget_sample(docs, budget_tokens=20_000, alpha=0.5)
    got = {r.doc_id: (r.pick_order, r.cum_tokens) for r in out.collect()}
    toks = docs.select(
        F.col("doc_id"),
        F.col("source").alias("domain"),
        F.size(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("domain").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    naive = {
        r.doc_id: (r.po, r.ct)
        for r in toks.withColumn("po", F.row_number().over(w))
        .withColumn("ct", F.sum("n_tokens").over(w))
        .collect()
        if r.doc_id in got
    }
    assert got == naive


def test_nb_index_fold_equivalence(spark, docs, tmp_path):
    """Folded-in-batches index must predict bit-identically to the
    one-shot fit — NB sufficient statistics are exact counts."""
    from cdf_spark.operators.classifier import NBIndex

    d = docs.select("doc_id", "text", "lang")
    idx = NBIndex(tmp_path / "nb")
    third = F.abs(F.xxhash64("doc_id")) % 3
    for i in range(3):
        idx.update(spark, d.filter(third == i))
    inc = {
        r.doc_id: (r.predicted, r.score_unat, r.margin_unat)
        for r in idx.predict(spark, d.select("doc_id", "text")).collect()
    }
    one = {
        r.doc_id: (r.predicted, r.score_unat, r.margin_unat)
        for r in nb_predict(d).collect()
    }
    assert inc == one


def test_nb_index_versioned_swap(spark, tmp_path):
    """Each update writes the NEXT version and swaps meta last; the
    previous version stays readable (crash leaves the old one live)."""
    import json

    from cdf_spark.operators.classifier import NBIndex

    df1 = spark.createDataFrame([(1, "the cat", "en")], ["doc_id", "text", "lang"])
    df2 = spark.createDataFrame([(2, "le chat", "fr")], ["doc_id", "text", "lang"])
    idx = NBIndex(tmp_path / "nb")
    m1 = idx.update(spark, df1)
    assert m1["version"] == 1
    m2 = idx.update(spark, df2)
    assert m2["version"] == 2 and m2["d_tot"] == 2
    assert (tmp_path / "nb" / "counts_v1").exists()
    meta = json.loads((tmp_path / "nb" / "meta.json").read_text())
    assert meta["version"] == 2


def test_nb_index_empty_raises(spark, tmp_path):
    from cdf_spark.operators.classifier import NBIndex

    with pytest.raises(ValueError):
        NBIndex(tmp_path / "nb").predict(
            spark, spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        )


def test_nb_index_epoch_fence_replay(spark, tmp_path):
    """foreachBatch at-least-once: a replayed epoch's fold must be
    skipped (NB counts are not idempotent under re-addition) — crash
    after fold, redelivery, fold again: counts unchanged."""
    from cdf_spark.operators.classifier import NBIndex

    df1 = spark.createDataFrame([(1, "the cat", "en")], ["doc_id", "text", "lang"])
    df2 = spark.createDataFrame([(2, "le chat", "fr")], ["doc_id", "text", "lang"])
    idx = NBIndex(tmp_path / "nb")
    idx.update(spark, df1, epoch=0)
    m = idx.update(spark, df2, epoch=1)
    # redelivered epoch 1 (crash between fold and checkpoint advance)
    m2 = idx.update(spark, df2, epoch=1)
    assert m2 == m  # skipped: same version, same totals
    assert m2["d_tot"] == 2 and m2["last_epoch"] == 1
    # a genuinely new epoch still folds
    df3 = spark.createDataFrame([(3, "der hund", "de")], ["doc_id", "text", "lang"])
    m3 = idx.update(spark, df3, epoch=2)
    assert m3["d_tot"] == 3 and m3["version"] == m["version"] + 1


def test_embedding_decontamination_empty_eval_set(spark):
    """An empty eval set must still yield one row per corpus vector,
    all uncontaminated — the documented shape contract."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0)], ["vec_id", "embedding", "label"]
    )
    ev = corpus.filter("vec_id < 0")  # empty
    out = {r.vec_id: r for r in embedding_decontamination(corpus, ev, 0.9).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.contaminated is False
        assert r.matched_eval_id is None and r.max_sim is None


def test_nb_index_meta_swap_is_atomic(spark, tmp_path):
    """No partially-written meta.json can ever be observed: the swap
    goes through tmp + rename (and the tmp never lingers)."""
    from cdf_spark.operators.classifier import NBIndex

    idx = NBIndex(tmp_path / "nb")
    idx.update(spark, spark.createDataFrame([(1, "the cat", "en")], ["doc_id", "text", "lang"]))
    assert not (tmp_path / "nb" / "meta.json.tmp").exists()
    assert (tmp_path / "nb" / "meta.json").exists()


def test_nb_index_reclaims_superseded_versions(spark, tmp_path):
    """The streaming drain folds once per epoch — superseded
    counts_v*/labels_v* dirs must not accumulate without bound. After
    each swap only live and live-1 remain (live-1 kept for a reader
    that loaded the previous meta just before the swap); orphaned
    future dirs from a crash between parquet writes and the meta swap
    are swept by the next successful fold."""
    from cdf_spark.operators.classifier import NBIndex

    idx = NBIndex(tmp_path / "nb")
    for i in range(4):
        df = spark.createDataFrame(
            [(i, f"the cat {i}", "en")], ["doc_id", "text", "lang"]
        )
        idx.update(spark, df, epoch=i)
    vers = sorted(
        d.name for d in (tmp_path / "nb").iterdir() if d.name.startswith("counts_v")
    )
    assert vers == ["counts_v3", "counts_v4"], vers
    # crash orphan: a future version dir with no meta swap
    (tmp_path / "nb" / "counts_v9").mkdir()
    (tmp_path / "nb" / "labels_v9").mkdir()
    idx.update(
        spark,
        spark.createDataFrame([(9, "le chat", "fr")], ["doc_id", "text", "lang"]),
        epoch=9,
    )
    names = {d.name for d in (tmp_path / "nb").iterdir() if d.is_dir()}
    assert "counts_v9" not in names and "labels_v9" not in names
    assert {"counts_v4", "counts_v5", "labels_v4", "labels_v5"} <= names
    # the folded model still predicts
    out = idx.predict(
        spark, spark.createDataFrame([(1, "the cat")], ["doc_id", "text"])
    )
    assert out.count() == 1


def test_nb_predict_observed_dtot_counts_zero_token_docs(spark):
    """r14 observe-ride regression: nb_predict's total document count
    rides the tokd checkpoint job as an observed metric over the
    PRE-explode projection. A zero-token doc produces no token rows
    but must still count toward d_tot (priors = ln(d_l / d_tot)).
    Fixture: label a has docs {1: "x", 2: ""}, label b has {3: "y"} —
    doc 1 under a scores prior ln(2/3) + lp(x|a) ln(2/3) in micro-nats;
    a d_tot that dropped the empty doc would give prior ln(2/2) = 0."""
    import math

    from cdf_spark.operators.classifier import nb_predict

    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "", "a"), (3, "y", "b")], ["doc_id", "text", "lang"]
    )
    rows = {r["doc_id"]: r for r in nb_predict(df).collect()}
    unat = round((math.log(2.0) - math.log(3.0)) * 1_000_000.0)
    assert rows[1]["predicted"] == "a"
    assert rows[1]["score_unat"] == 2 * unat
