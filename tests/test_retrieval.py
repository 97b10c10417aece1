"""BM25 retrieval + persisted incremental inverted index."""

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.retrieval import InvertedIndex, bm25_topk, hash64_py, _BUCKETS


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _queries(spark, rows):
    return spark.createDataFrame(rows, ["qid", "qtext"])


CORPUS = [
    (1, "spark shuffle join merge join join"),
    (2, "window functions over streams and watermarks"),
    (3, "join"),
    (4, "hash join strategies for big tables hash hash"),
    (5, "completely unrelated text about gardening"),
    (6, ",,, !!!"),  # zero tokens: counts toward N, never scored
]


def test_bm25_rare_term_and_tf_ordering(spark):
    docs = _docs(spark, CORPUS)
    out = bm25_topk(docs, _queries(spark, [("q", "join")]), k=10).collect()
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])]
    # doc 3 is a one-word doc containing only "join": maximal length
    # normalization wins over doc 1's tf=3; doc 5/6 never appear
    assert set(got) == {1, 3, 4}
    assert got[0] == 3
    assert all(r["score_unat"] > 0 for r in out)


def test_index_folds_match_one_shot(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 2))
    idx.add(spark, docs.filter((F.col("doc_id") > 2) & (F.col("doc_id") <= 4)))
    idx.add(spark, docs.filter(F.col("doc_id") > 4))
    qs = _queries(spark, [("q1", "hash join"), ("q2", "window streams")])
    one_shot = sorted(map(tuple, bm25_topk(docs, qs, k=5).collect()))
    folded = sorted(map(tuple, idx.query(spark, qs, k=5).collect()))
    assert folded == one_shot and len(folded) > 0
    # meta counters fold exactly (zero-token doc 6 counted, dl 0)
    m = idx._meta()
    assert m["n_docs"] == 6 and len(m["parts"]) == 3


def test_index_epoch_fence_makes_replay_idempotent(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 3), epoch=0)
    idx.add(spark, docs.filter(F.col("doc_id") > 3), epoch=1)
    before = sorted(map(tuple, idx.query(spark, _queries(spark, [("q", "join hash")])).collect()))
    # redelivered fold: same epoch -> skipped, counters unchanged
    m1 = idx.add(spark, docs.filter(F.col("doc_id") > 3), epoch=1)
    assert m1["n_docs"] == 6 and len(m1["parts"]) == 2
    after = sorted(map(tuple, idx.query(spark, _queries(spark, [("q", "join hash")])).collect()))
    assert after == before


def test_index_sweeps_crash_orphaned_part(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 3))
    # simulate a crash between the part write and the meta swap
    orphan = tmp_path / "bm25" / "postings_p9"
    orphan.mkdir()
    (orphan / "junk").write_text("x")
    idx.add(spark, docs.filter(F.col("doc_id") > 3))
    assert not orphan.exists()


def test_index_probe_reads_only_touched_buckets(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs)
    out = idx.query(spark, _queries(spark, [("q", "join")]), k=5)
    b = hash64_py("join") % _BUCKETS
    # partition pruning is plan-time: the scan's PartitionFilters must
    # pin hb to the probed bucket (inputFiles() lists pre-pruning)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert f"hb#" in plan and "PartitionFilters" in plan
    import re

    pf = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert pf and all(f"({b})" in f or f" {b}," in f or f"{b}]" in f or str(b) in f for f in pf)
    assert out.count() > 0


def test_index_refusals(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    with pytest.raises(ValueError, match="empty"):
        idx.add(spark, docs)
    with pytest.raises(ValueError, match="empty"):
        idx.query(spark, _queries(spark, [("q", "join")]))
    idx.build(spark, docs)
    with pytest.raises(ValueError, match="already built"):
        idx.build(spark, docs)
    with pytest.raises(ValueError, match="no terms"):
        idx.query(spark, _queries(spark, [("q", "!!! ...")]))


# ---------------------------------------------------------------------------
# deletes + compaction (r12)


def test_delete_equals_one_shot_over_live_docs(spark, tmp_path):
    """BM25 deletion shifts df/N/avgdl: the post-delete probe must be
    bit-identical to a one-shot scoring over only the live docs."""
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 3))
    idx.add(spark, docs.filter(F.col("doc_id") > 3))
    idx.delete(spark, docs.filter(F.col("doc_id").isin(1, 6)).select("doc_id"))
    qs = _queries(spark, [("q1", "hash join"), ("q2", "window streams")])
    live = docs.filter(~F.col("doc_id").isin(1, 6))
    want = sorted(map(tuple, bm25_topk(live, qs, k=5).collect()))
    got = sorted(map(tuple, idx.query(spark, qs, k=5).collect()))
    assert got == want and len(got) > 0
    m = idx._meta()
    assert m["n_docs"] == 4


def test_delete_unknown_and_repeat_ids_never_double_subtract(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs)
    m0 = idx._meta()
    idx.delete(spark, spark.createDataFrame([(6,), (999,)], ["doc_id"]))
    m1 = idx._meta()
    # zero-token doc 6 exists (dl=0): N drops 1, total unchanged;
    # id 999 was never ingested: contributes nothing
    assert m1["n_docs"] == m0["n_docs"] - 1
    assert m1["total_len"] == m0["total_len"]
    idx.delete(spark, spark.createDataFrame([(6,), (1,)], ["doc_id"]))
    m2 = idx._meta()
    # 6 already dead -> only doc 1 (6 tokens) leaves
    assert m2["n_docs"] == m1["n_docs"] - 1
    assert m2["total_len"] == m1["total_len"] - 6


def test_compact_pure_rewrite_retire_then_sweep(spark, tmp_path):
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 3), epoch=0)
    idx.add(spark, docs.filter(F.col("doc_id") > 3), epoch=1)
    idx.delete(spark, spark.createDataFrame([(4,)], ["doc_id"]), epoch=2)
    qs = _queries(spark, [("q", "join hash window")])
    before = sorted(map(tuple, idx.query(spark, qs, k=5).collect()))
    old = idx._meta()
    mc = idx.compact(spark)
    assert len(mc["parts"]) == 1 and len(mc["lparts"]) == 1 and not mc["tombstones"]
    after = sorted(map(tuple, idx.query(spark, qs, k=5).collect()))
    assert after == before
    # retired dirs survive the compact itself...
    for p in old["parts"] + old["lparts"] + old["tombstones"]:
        assert (tmp_path / "bm25" / p).exists()
    # ...and are swept by the next successful mutation
    idx.add(spark, _docs(spark, [(100, "fresh doc about merge")]), epoch=3)
    for p in old["parts"] + old["lparts"] + old["tombstones"]:
        assert not (tmp_path / "bm25" / p).exists()
    m = idx._meta()
    assert len(set(m["parts"])) == len(m["parts"])


# ---------------------------------------------------------------------------
# positional phrase matching (r12)


def test_phrase_match_counts_overlapping_and_repeated(spark):
    from cdf_spark.operators.retrieval import phrase_match

    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),
            (2, "x x x"),
            (3, "a b"),
            (4, "b a b a"),
        ],
    )
    phrases = _queries(
        spark, [("q1", "a b"), ("q2", "x x"), ("q3", "a b a"), ("q4", "zz yy")]
    )
    got = {
        (r["qid"], r["doc_id"]): r["n_occurrences"]
        for r in phrase_match(docs, phrases).collect()
    }
    assert got == {
        ("q1", 1): 3,  # "a b" at 1,3,5
        ("q1", 3): 1,
        ("q1", 4): 1,  # "b a b a" contains one "a b"
        ("q2", 2): 2,  # overlapping "x x" at 1,2
        ("q3", 1): 2,  # "a b a" at 1,3 (overlapping)
        ("q3", 4): 1,  # "b [a b a]" at 2
        # q4 matches nothing -> absent
    }


def test_phrase_index_matches_one_shot_and_respects_deletes(spark, tmp_path):
    from cdf_spark.operators.retrieval import InvertedIndex, phrase_match

    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 3))
    idx.add(spark, docs.filter(F.col("doc_id") > 3))
    phrases = _queries(spark, [("q", "hash join"), ("q2", "join merge join")])
    one_shot = sorted(map(tuple, phrase_match(docs, phrases).collect()))
    from_index = sorted(map(tuple, idx.phrase_query(spark, phrases).collect()))
    assert from_index == one_shot and len(from_index) > 0
    # deleting doc 4 removes its "hash join" hit
    idx.delete(spark, spark.createDataFrame([(4,)], ["doc_id"]))
    after = idx.phrase_query(spark, phrases).collect()
    assert all(r["doc_id"] != 4 for r in after)


def test_query_refuses_fully_deleted_index(spark, tmp_path):
    docs = _docs(spark, CORPUS[:2])
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs)
    idx.delete(spark, docs.select("doc_id"))
    with pytest.raises(ValueError, match="no live documents"):
        idx.query(spark, _queries(spark, [("q", "join")]))


def test_zero_token_and_empty_batches_never_brick_the_index(spark, tmp_path):
    """A zero-ROW partitioned write is unreadable (only _SUCCESS) —
    so an all-zero-token batch folds lengths/counters but commits no
    postings part, and an empty batch is a fenced no-op. The index
    keeps answering after both."""
    docs = _docs(spark, CORPUS)
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs.filter(F.col("doc_id") <= 4), epoch=0)
    # all-zero-token batch (doc 6 is ",,, !!!")
    m1 = idx.add(spark, docs.filter(F.col("doc_id") == 6), epoch=1)
    assert m1["n_docs"] == 5 and len(m1["parts"]) == 1  # no new postings part
    # empty batch: fenced no-op, watermark advances
    m2 = idx.add(spark, docs.filter(F.col("doc_id") == 999), epoch=2)
    assert m2["n_docs"] == 5 and m2["last_epoch"] == 2
    qs = _queries(spark, [("q", "join hash")])
    one_shot = sorted(
        map(tuple, bm25_topk(docs.filter(F.col("doc_id").isin(1, 2, 3, 4, 6)), qs, k=5).collect())
    )
    assert sorted(map(tuple, idx.query(spark, qs, k=5).collect())) == one_shot


def test_compact_of_fully_tombstoned_tokens_leaves_no_parts(spark, tmp_path):
    docs = _docs(spark, CORPUS[:4])
    idx = InvertedIndex(tmp_path / "bm25")
    idx.build(spark, docs)
    idx.delete(spark, docs.select("doc_id"))
    mc = idx.compact(spark)
    assert mc["parts"] == [] and mc["n_docs"] == 0
    with pytest.raises(ValueError, match="no postings"):
        idx.query(spark, _queries(spark, [("q", "join")]))
    # the index revives on the next fold
    idx.add(spark, _docs(spark, [(100, "join join join")]))
    got = idx.query(spark, _queries(spark, [("q", "join")]), k=3).collect()
    assert [r["doc_id"] for r in got] == [100]


def test_rrf_fuse_integer_scores_and_absent_legs(spark):
    from cdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)], ["qid", "id", "rk"]
    )
    b = spark.createDataFrame([("q", 2, 1), ("q", 9, 2)], ["qid", "id", "rk"])
    got = {r["doc_id"]: r for r in rrf_fuse({"a": a, "b": b}, k=10).collect()}
    # doc 2 ranked by both legs: 1e9//62 + 1e9//61
    assert got[2]["rrf_unat"] == 1_000_000_000 // 62 + 1_000_000_000 // 61
    assert (got[2]["a_rk"], got[2]["b_rk"]) == (2, 1)
    # doc 1 only in leg a; absent leg contributes 0 and reports rank 0
    assert got[1]["rrf_unat"] == 1_000_000_000 // 61
    assert got[1]["b_rk"] == 0
    # fused ranking: doc 2 (two legs) beats doc 1 (rank 1 in one leg)
    assert got[2]["rank"] == 1 and got[1]["rank"] == 2
    # doc 9: leg-b only
    assert got[9]["rrf_unat"] == 1_000_000_000 // 62


def test_rrf_fuse_k_cut_and_tiebreak(spark):
    from cdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([("q", i, i) for i in range(1, 6)], ["qid", "id", "rk"])
    b = spark.createDataFrame([("q", i + 10, i) for i in range(1, 6)], ["qid", "id", "rk"])
    got = rrf_fuse({"a": a, "b": b}, k=4).collect()
    assert len(got) == 4
    # same-rank docs across legs tie on score; lower doc_id wins
    first_two = sorted([r["doc_id"] for r in got if r["rank"] <= 2])
    assert first_two == [1, 11]


def test_rrf_fuse_rejects_single_leg(spark):
    from cdf_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([("q", 1, 1)], ["qid", "id", "rk"])
    with pytest.raises(ValueError, match="two legs"):
        rrf_fuse({"a": a})


def test_prf_expansion_recovers_vocabulary_mismatch(spark):
    from cdf_spark.operators.retrieval import bm25_prf_expand

    # "shuffle" never appears in the query; it dominates the feedback
    # doc (1), so expansion adds it and recovers doc 7 — which shares
    # NO term with the original query.
    docs = _docs(
        spark,
        CORPUS
        + [
            (7, "shuffle shuffle shuffle exchange partitions"),
        ],
    )
    qs = _queries(spark, [("q", "merge join")])
    literal = {r["doc_id"] for r in bm25_topk(docs, qs, k=10).collect()}
    assert 7 not in literal
    expanded = bm25_prf_expand(docs, qs, fb_k=1, expand_m=2, k=10)
    got = {r["doc_id"] for r in expanded.collect()}
    # feedback doc is 1 ("spark shuffle join merge join join"); its
    # strongest non-query terms include "shuffle" (tf 1) -> doc 7 in
    assert 7 in got


def test_prf_expansion_never_reuses_original_terms(spark):
    from cdf_spark.operators.retrieval import bm25_prf_expand

    # corpus where feedback docs contain ONLY query terms: expansion
    # finds nothing new and pass 2 equals pass 1.
    docs = _docs(spark, [(1, "join merge"), (2, "join join"), (3, "merge")])
    qs = _queries(spark, [("q", "join merge")])
    base = sorted(map(tuple, bm25_topk(docs, qs, k=10).collect()))
    exp = sorted(map(tuple, bm25_prf_expand(docs, qs, fb_k=2, expand_m=3, k=10).collect()))
    assert base == exp


def test_mmr_demotes_redundant_candidates(spark):
    from cdf_spark.operators.retrieval import mmr_rerank

    # doc 2 is nearly identical to doc 1 (sim 0.99); doc 3 is less
    # relevant but diverse. Pure relevance picks (1, 2); MMR picks
    # (1, 3): 70*900000 - 30*990000 = 33.3e6 < 70*600000 - 30*100000.
    cand = spark.createDataFrame(
        [("q", 1, 1_000_000), ("q", 2, 900_000), ("q", 3, 600_000)],
        ["qid", "id", "rel_u"],
    )
    pairs = spark.createDataFrame(
        [
            ("q", 1, 2, 990_000), ("q", 2, 1, 990_000),
            ("q", 1, 3, 100_000), ("q", 3, 1, 100_000),
            ("q", 2, 3, 100_000), ("q", 3, 2, 100_000),
        ],
        ["qid", "a", "b", "sim_u"],
    )
    got = {r["mmr_rank"]: r["id"] for r in mmr_rerank(cand, pairs, k=3).collect()}
    assert got == {1: 1, 2: 3, 3: 2}


def test_mmr_missing_pairs_count_as_zero_and_short_candidate_sets(spark):
    from cdf_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [("q", 1, 500_000), ("q", 2, 400_000)], ["qid", "id", "rel_u"]
    )
    pairs = spark.createDataFrame([], "qid string, a long, b long, sim_u long")
    got = mmr_rerank(cand, pairs, k=5).collect()
    # only 2 candidates -> only 2 selections, ranked 1..2
    assert sorted((r["mmr_rank"], r["id"]) for r in got) == [(1, 1), (2, 2)]
    # with no pair info, step-2 score is pure scaled relevance
    by_rank = {r["mmr_rank"]: r for r in got}
    assert by_rank[2]["sel_score_unat"] == 70 * 400_000


def test_mmr_rejects_bad_params(spark):
    import pytest

    from cdf_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame([("q", 1, 1)], ["qid", "id", "rel_u"])
    pairs = spark.createDataFrame([], "qid string, a long, b long, sim_u long")
    with pytest.raises(ValueError):
        mmr_rerank(cand, pairs, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cand, pairs, lambda_pct=0)


def test_tfidf_doc_similarity_prefers_shared_rare_terms(spark):
    from cdf_spark.operators.retrieval import tfidf_doc_similarity

    docs = _docs(
        spark,
        [
            (1, "zebra quantum flux"),
            (2, "zebra quantum flux extras"),   # near copy of 1
            (3, "zebra common common common"),  # shares only one term
            (4, "the completely different one"),
            (5, "common the words"),
        ],
    )
    out = tfidf_doc_similarity(docs, docs.filter("doc_id = 1").select("doc_id"), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rk"])
    assert rows[0]["doc_id"] == 2  # near-copy wins
    assert all(r["qid"] == 1 and r["doc_id"] != 1 for r in rows)  # self excluded
    sims = [r["sim_unat"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_mmr_final_plan_is_checkpoint_bounded(spark):
    """Regression guard: the greedy loop must not compound lineage —
    each step's state is checkpointed, so the FINAL plan is a union
    of materialized selections with no re-derived subtrees (it was
    329 exchanges for k=4 before the checkpoint discipline)."""
    from cdf_spark.operators.retrieval import mmr_rerank

    cand = spark.createDataFrame(
        [("q", i, 1000 - i) for i in range(10)], ["qid", "id", "rel_u"]
    )
    pairs = spark.createDataFrame(
        [("q", i, j, 500) for i in range(10) for j in range(10) if i != j],
        ["qid", "a", "b", "sim_u"],
    )
    out = mmr_rerank(cand, pairs, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0


def test_prf_final_plan_never_rescans_the_corpus(spark):
    """Regression guard (r13): bm25_prf_expand's tf table and expanded
    term set are eagerly checkpointed — the FINAL plan must contain
    ZERO scans of the docs source and a bounded exchange count (it was
    11 re-derived corpus scans / 69 exchanges when the operator
    trusted ReuseExchange across its three consumers)."""
    import tempfile

    from cdf_spark.operators.retrieval import bm25_prf_expand

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"zebra quantum flux token{i} alpha beta") for i in range(50)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        queries = spark.createDataFrame([(1, "zebra alpha")], ["qid", "qtext"])
        out = bm25_prf_expand(docs, queries, fb_k=3, expand_m=2, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0  # corpus never re-scanned
        assert plan.count("Exchange") <= 12
        assert out.count() > 0


def test_tfidf_final_plan_is_checkpoint_bounded(spark):
    """Regression guard (r14): tfidf_doc_similarity's weighted posting
    table feeds four consumers and its norms two — both are eagerly
    checkpointed, so the FINAL plan never re-derives the
    tokenize+tf+dfreq pipeline (it was 10 corpus scans / 16 shuffles
    left lazy)."""
    import tempfile

    from cdf_spark.operators.retrieval import tfidf_doc_similarity

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"zebra quantum tok{i % 5} alpha") for i in range(40)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        out = tfidf_doc_similarity(docs, docs.filter("doc_id = 1").select("doc_id"), k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "posting table must be checkpointed"
        # dots agg + the dots-norms SMJ pair + the top-k window (+ AQE)
        assert plan.count("Exchange") <= 8
        assert out.count() > 0


def test_prf_observed_stats_count_zero_token_docs(spark):
    """r14 observe-ride regression: PRF's corpus stats (N, avgdl) ride
    the tf checkpoint job as observed metrics over the PRE-explode
    projection. A zero-token doc produces no tf rows but must still
    count toward N — exactly as bm25_topk's separate stats pass counts
    it. Feedback docs here contain only query terms, so expansion adds
    nothing and pass 2 must equal a plain bm25_topk run; any miscount
    of the empty doc would shift every idf/avgdl and break equality."""
    from cdf_spark.operators.retrieval import bm25_prf_expand

    docs = _docs(spark, [(1, "join merge"), (2, "join join"), (3, ""), (4, "merge")])
    qs = _queries(spark, [("q", "join merge")])
    base = sorted(map(tuple, bm25_topk(docs, qs, k=10).collect()))
    exp = sorted(map(tuple, bm25_prf_expand(docs, qs, fb_k=2, expand_m=3, k=10).collect()))
    assert base == exp


def test_tfidf_top_terms_observed_n_counts_empty_docs(spark):
    """r14 observe-ride regression: tfidf_top_terms' N rides the tf
    pin as an observed metric over the pre-explode projection; an
    empty doc contributes no terms but must still count toward N
    (idf = ln(N/df)). With 3 docs (one empty), 'banana' (df=1) scores
    tf * ln(3/1) — ln(2) would mean the empty doc was dropped."""
    import math

    from cdf_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "apple"), (2, "apple banana"), (3, "")], ["doc_id", "text"]
    )
    out = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(df, top_k=5).collect()
    }
    assert out[(2, "banana")] == round(math.log(3.0 / 1.0), 6)
    assert out[(1, "apple")] == round(math.log(3.0 / 2.0), 6)
