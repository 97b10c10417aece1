"""Text analysis, near-dup families, similarity search, multimodal plumbing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.dedup_approx import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_fast,
    simhash_pairs,
)
from cdf_spark.operators.multimodal import (
    extract_image_features,
    sample_video_frames,
    to_media_table,
)
from cdf_spark.operators.similarity import cosine_topk, embedding_near_dup_pairs, rhp_lsh_topk
from cdf_spark.operators.text import analyze_documents, hash64, lang_id, quality_score, token_count


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_hash64_duckdb_parity(spark):
    """The md5->bigint hash must match DuckDB exactly — every oracled
    minhash/simhash query depends on this."""
    vals = ["abc", "", "hello world", "日本語", "a'b\"c"]
    sdf = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r.s: r.h for r in sdf.select("s", hash64(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        expected = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,15)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == expected, v


def test_token_count(spark):
    df = spark.createDataFrame([("a b c",), ("single",), ("",)], ["t"])
    got = [r.n for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 1, 0]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of a house",), ("der hund und die katze das haus",),
         ("el perro y los gatos que hablan",), ("le chat et les chiens une maison",),
         ("xyzzy qwerty",)],
        ["t"],
    )
    got = [r.l for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "es", "fr", "und"]


def test_quality_score_range(docs):
    scored = docs.select(quality_score(F.col("text")).alias("q"))
    rows = scored.agg(F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= rows[0] <= rows[1] <= 1.0


def test_analyze_documents(docs):
    out = analyze_documents(docs)
    assert {"n_tokens", "quality", "lang_pred", "fingerprint"} <= set(out.columns)
    row = out.filter("doc_id = 0").collect()[0]
    assert row.n_tokens > 0 and len(row.fingerprint) == 32


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = exact_dedup(df)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_ngram_jaccard_vs_duckdb(spark, docs, sf_dir):
    """Exact Jaccard pairs must match a pure-SQL DuckDB computation."""
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    con = duckdb.connect()
    expected = con.execute(f"""
        WITH sh AS (
          SELECT doc_id, list_distinct([substr(text, i, 3) for i in range(1, length(text)-1)]) AS s
          FROM '{sf_dir}/documents.parquet'
        ),
        ex AS (SELECT doc_id, len(s) AS sz, unnest(s) AS g FROM sh),
        pairs AS (
          SELECT a.doc_id ia, b.doc_id ib, a.sz sa, b.sz sb, count(*) inter
          FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1,2,3,4
        )
        SELECT ia, ib, round(inter::DOUBLE / (sa + sb - inter), 6) j
        FROM pairs WHERE inter::DOUBLE / (sa + sb - inter) >= 0.5
    """).fetchall()
    assert got == {(r[0], r[1]): r[2] for r in expected}
    assert len(got) > 0, "fixture should contain near-duplicates"


def test_ngram_jaccard_fast_equals_brute(docs):
    """Prefix-filtered (AllPairs/PPJoin) join is EXACT: identical pair
    set and jaccard values as the brute explode-join verifier, at two
    thresholds (the fixture corpus has 377 distinct trigrams, so this
    exercises the small-vocabulary bitmap-verify branch)."""
    for t in (0.5, 0.8):
        brute = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        fast = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs_fast(docs, threshold=t).collect()
        }
        assert fast == brute
    assert len(brute) > 0


def test_ngram_jaccard_fast_large_vocab_branch(spark):
    """High-entropy corpus (>1024 distinct grams) takes the
    array_intersect verify branch; output must still equal brute."""
    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = []
    for i in range(60):
        base = "".join(rng.choice(alphabet) for _ in range(120))
        rows.append((2 * i, base))
        # near-dup: mutate a couple of characters
        mut = list(base)
        for p in rng.sample(range(120), 2):
            mut[p] = rng.choice(alphabet)
        rows.append((2 * i + 1, "".join(mut)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.7).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_fast(df, threshold=0.7).collect()
    }
    assert fast == brute
    assert len(brute) >= 30  # mutated twins should mostly pair up


def test_ngram_jaccard_fast_ceil_rounding(spark):
    """Float-ceil slack: 0.8*5 in float64 is 4.000000000000001, whose
    unslacked ceil (5) would shorten the prefix and drop a true pair.
    Two 7-char docs sharing 4 of their 5 trigrams (J=2/3 < 0.8) and
    two identical docs (J=1.0) pin the boundary."""
    df = spark.createDataFrame(
        [(1, "abcdefg"), (2, "abcdefg"), (3, "abcdefx")], ["doc_id", "text"]
    )
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs_fast(df, threshold=0.8).collect()
    }
    assert fast == {(1, 2): 1.0}


def test_ngram_jaccard_fast_plan_derives_everything_from_one_gram_pin(spark):
    """Regression guard (r14): the substr+distinct gram pipeline — the
    operator's dominant per-row CPU — is eagerly pinned ONCE and every
    downstream consumer (freq, both prefix self-join sides, the
    verify-side sets) derives from the pin; the FINAL plan must never
    re-scan the source (it was 8 corpus scans left lazy)."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"abcdefgh{i % 7}stuvwxyz") for i in range(40)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        out = ngram_jaccard_pairs_fast(docs, threshold=0.8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "gram pipeline must be pinned once"
        out.count()


def test_simhash_fast_plan_consumes_one_signature_pin(spark):
    """Regression guard (r14): simhash_pairs' signature table feeds
    BOTH sides of the banded self-join — it is eagerly pinned, so the
    FINAL plan never re-derives the corpus scan + vote fold (it was 2
    scans / 2 Arrow evals left lazy)."""
    import tempfile

    from cdf_spark.operators.dedup_approx import simhash_pairs

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, f"common shared text body {i % 3}") for i in range(30)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        out = simhash_pairs(docs, max_hamming=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "signature table must be pinned once"
        out.count()


def test_minhash_lsh_finds_near_dups(docs):
    """LSH candidates verified by exact jaccard: no false positives,
    and high-similarity pairs (j>=0.8) are recovered."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert lsh <= {
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    } or lsh == exact
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_simhash_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
            (3, "completely different words about spark catalyst optimizer internals"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_topk_vs_duckdb(spark, emb, sf_dir):
    queries = emb.filter("vec_id < 3")
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.sim))
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r[0] for r in sorted(rows)] == [1, 2, 3, 4, 5]

    con = duckdb.connect()
    expected = con.execute(f"""
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM '{sf_dir}/embeddings.parquet'),
        q AS (SELECT vec_id qid, embedding qe FROM c WHERE vec_id < 3),
        scored AS (
          SELECT qid, c.vec_id nid, round(list_cosine_similarity(qe, embedding), 4) sim
          FROM c CROSS JOIN q WHERE c.vec_id != qid
        ),
        ranked AS (
          SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) rk
          FROM scored
        )
        SELECT qid, nid, sim, rk FROM ranked WHERE rk <= 5
    """).fetchall()
    exp_by_q = {}
    for qid, nid, sim, rk in expected:
        exp_by_q.setdefault(qid, []).append((rk, nid, sim))
    for q in by_q:
        assert sorted(by_q[q]) == sorted(exp_by_q[q]), f"query {q}"


def test_rhp_lsh_recall(emb):
    """These embeddings are weakly similar (top-1 cosine ~0.33 → ~70°
    angles), so recall needs many narrow bands: 16 bands × 2 bits gives
    per-band collision P≈0.37, P(any)≈1-(1-.37)^16≈0.999. Wider bands
    trade recall for fewer candidates on clustered data."""
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(emb, queries, k=1).collect()
    approx = {
        r.query_id: r.neighbor_id
        for r in rhp_lsh_topk(emb, queries, k=1, bits=32, band_bits=2).collect()
    }
    hits = sum(1 for r in exact if approx.get(r.query_id) == r.neighbor_id)
    assert hits >= 7, f"rhp-lsh top-1 recall too low: {hits}/10"


def test_embedding_near_dup(emb):
    pairs = embedding_near_dup_pairs(emb, threshold=0.99).collect()
    for r in pairs:
        assert r.id_a < r.id_b and r.sim >= 0.99


def test_multimodal_plumbing(spark, docs):
    media = to_media_table(
        docs.select("doc_id", F.encode("text", "utf-8").alias("blob"), "source"),
        "doc_id",
        "blob",
        "image",
        source_col="source",
    )
    assert media.schema["meta"].dataType.fieldNames() == ["source", "content_length", "content_hash"]
    row = media.filter("asset_id = 0").collect()[0]
    assert row.meta.content_length > 0 and len(row.meta.content_hash) == 32

    feats = extract_image_features(media.limit(20))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert 64 <= r.width < 256 and len(r.feature) == 8
    # determinism: same payload -> same features
    again = {r.asset_id: r.feature for r in extract_image_features(media.limit(20)).collect()}
    assert {r.asset_id: r.feature for r in rows} == again

    frames = sample_video_frames(media.limit(5))
    assert frames.count() >= 5
    assert frames.columns == ["asset_id", "frame_idx", "frame_ts_ms", "frame_payload"]

    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_image_features(media.limit(1), decode_stub=False).collect()


def test_dedup_clusters(spark):
    from cdf_spark.operators.dedup_approx import dedup_clusters

    ids = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    # components: {1,2,3,4} via chain, {5,6}, singletons 7, 8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r.cluster for r in dedup_clusters(ids, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8}


def test_dedup_clusters_empty_pairs(spark):
    from cdf_spark.operators.dedup_approx import dedup_clusters

    ids = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = {r.doc_id: r.cluster for r in dedup_clusters(ids, pairs).collect()}
    assert out == {1: 1, 2: 2}


def test_fingerprint_containment_is_directed(spark):
    """An excerpt is contained in its superset (high containment a->b)
    while the reverse direction dilutes below threshold — the
    asymmetry symmetric Jaccard cannot express."""
    from cdf_spark.operators.dedup_approx import fingerprint_containment_pairs

    excerpt = "the quick brown fox jumps over the lazy dog near the river bank today"
    superset = excerpt + " " + ("and then continues with a long tail of unrelated prose " * 20)
    df = spark.createDataFrame(
        [(1, excerpt), (2, superset), (3, "completely different content with no overlap at all x")],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.containment for r in
           fingerprint_containment_pairs(df, threshold=0.6).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 0.9  # excerpt ⊂ superset
    assert (2, 1) not in out                      # superset ⊄ excerpt
    assert not any(3 in pair for pair in out)


def test_hashed_features_feed_similarity_ops(spark):
    """The hashing-trick vectors are a drop-in corpus for the
    embedding operators: near-identical docs rank as nearest
    neighbors over their hashed TF vectors."""
    from cdf_spark.operators.similarity import cosine_topk
    from cdf_spark.operators.text import hashed_features
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
        (3, "one two three four five six seven"),
        (4, "totally unrelated words here appear once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = df.select(
        F.col("doc_id").alias("vec_id"),
        hashed_features(F.col("text"), 64).cast("array<float>").alias("embedding"),
    )
    top = cosine_topk(vecs, vecs.filter("vec_id = 1"), k=1)
    r = top.collect()[0]
    assert (r.query_id, r.neighbor_id) == (1, 2) and r.sim > 0.8


def test_decontamination_flags_planted_overlap(spark):
    """A candidate that quotes a 5-gram run from the eval set is
    flagged; an unrelated candidate is not."""
    from cdf_spark.operators.curation import decontamination_overlap

    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            (1, "he said the quick brown fox jumps right past us"),  # shares 5-gram run
            (2, "completely different words with no shared runs at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in decontamination_overlap(cands, eval_set, n=5, threshold=0.05).collect()
    }
    assert out[1].hits > 0 and out[1].contaminated
    assert out[2].hits == 0 and not out[2].contaminated


def test_repetition_profile_drops_degenerate_text(spark):
    from cdf_spark.operators.curation import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "a genuinely varied sentence with many distinct interesting words"),
            (3, "   "),  # empty after trim: zero ratios, dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_profile(df).collect()}
    assert not out[1].keep and out[1].top_word_frac == 1.0
    assert out[2].keep and out[2].distinct_word_ratio == 1.0
    assert out[3].n_tokens == 0 and not out[3].keep


def test_pii_redact_replaces_emails_and_phones(spark):
    from cdf_spark.operators.curation import scan_pii

    df = spark.createDataFrame(
        [(1, "reach jane.doe+x@corp.example.org or 12-345-678-9012 thanks")],
        "id long, text string",
    )
    r = scan_pii(df, "text", "id").collect()[0]
    assert (r.emails, r.phones, r.has_pii) == (1, 1, True)
    assert r.redacted == "reach [EMAIL] or [PHONE] thanks"


def test_decontamination_fast_twin_parity(spark, sf_dir):
    """The xxhash64 fast path returns exactly the md5 oracle path's
    result (hash choice only affects equality-join keys; collisions
    would be the only divergence)."""
    from cdf_spark.operators.curation import decontamination_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands, evals = docs.filter("doc_id % 97 != 0"), docs.filter("doc_id % 97 = 0")
    a = {
        tuple(r)
        for r in decontamination_overlap(cands, evals, n=5, hash_fn="md5").collect()
    }
    b = {
        tuple(r)
        for r in decontamination_overlap(cands, evals, n=5, hash_fn="xxhash64").collect()
    }
    assert a == b and len(a) > 0


def test_dedup_clusters_releases_intermediate_checkpoints(spark):
    """Each label-propagation round localCheckpoints (plan truncation);
    prior rounds' blocks must be RELEASED as the loop advances — a
    chain graph forces multiple rounds, and at the end only the final
    labels' blocks may remain pinned (plus nothing from edges)."""
    from cdf_spark.operators.dedup_approx import dedup_clusters

    def stored():
        sc = spark.sparkContext._jsc.sc()
        return {i.id() for i in sc.getRDDStorageInfo()}

    before = stored()
    n = 12  # chain needs ~n rounds (1 hop per round) — stay under max_iterations
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, n)], ["id_a", "id_b"])
    out = dedup_clusters(ids, pairs)
    assert {r.cluster for r in out.collect()} == {1}
    leaked = stored() - before
    # the returned frame is backed by exactly one surviving checkpoint
    assert len(leaked) <= 1, f"leaked {len(leaked)} checkpoint RDDs: {leaked}"


def test_release_local_checkpoint_contract(spark):
    from cdf_spark.plans.checkpoint import release_local_checkpoint

    df = spark.range(0, 100)
    ck = df.localCheckpoint(eager=True)
    derived = ck.selectExpr("id * 2 AS v")
    # derived frames don't expose the handle — refused, not broken
    assert release_local_checkpoint(derived) is False
    assert release_local_checkpoint(df.selectExpr("id")) is False
    assert release_local_checkpoint(ck) is True


def test_bmp_codec_roundtrip_and_layout():
    """encode_bmp/decode_bmp round-trip exactly, across widths that
    exercise every row-padding case (w*3 mod 4 = 0..3)."""
    import numpy as np

    from cdf_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w in (8, 9, 10, 11):
        arr = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        data = encode_bmp(arr)
        assert data[:2] == b"BM"
        assert np.array_equal(decode_bmp(data), arr)
    # orientation: decoded top-left must be the array's top-left (BMP
    # stores bottom-up — a decoder skipping the un-flip fails here)
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[0, 0] = (200, 10, 30)  # top-left, RGB
    px = decode_bmp(encode_bmp(arr))
    assert tuple(px[0, 0]) == (200, 10, 30) and tuple(px[3, 3]) == (0, 0, 0)


def test_pnm_decode_and_dispatch():
    import numpy as np

    from cdf_spark.operators.multimodal import decode_image

    # P6 with a comment line in the header
    body = bytes(range(2 * 3 * 3))
    p6 = b"P6\n# test comment\n3 2\n255\n" + body
    px = decode_image(p6)
    assert px.shape == (2, 3, 3) and px.flatten().tolist() == list(body)
    # P5 grayscale broadcast to 3 channels
    p5 = b"P5\n2 2\n255\n" + bytes([0, 80, 160, 240])
    px = decode_image(p5)
    assert px.shape == (2, 2, 3) and tuple(px[1, 1]) == (240, 240, 240)
    # unknown magic -> honest NotImplementedError (PIL absent here)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_real_image_features_from_pixels(spark):
    """decode_stub=False computes from REAL decoded pixels: a half
    black / half white image yields band lumas 0 and 1."""
    import numpy as np

    from cdf_spark.operators.multimodal import (
        encode_bmp,
        extract_image_features,
        to_media_table,
    )

    arr = np.zeros((10, 16, 3), dtype=np.uint8)
    arr[:, 8:, :] = 255  # right half white
    df = spark.createDataFrame([(1, bytearray(encode_bmp(arr)))], "doc_id long, blob binary")
    media = to_media_table(df, "doc_id", "blob", "image")
    row = extract_image_features(media, decode_stub=False, n_dims=2).collect()[0]
    assert (row.width, row.height) == (16, 10)
    assert row.feature == [0.0, 1.0]


def test_wav_codec_roundtrip_and_chunk_walking():
    import struct

    import numpy as np

    from cdf_spark.operators.multimodal import decode_wav, encode_wav

    s = (np.arange(-500, 500, 7)).astype(np.int16)
    data = encode_wav(s, sample_rate=22_050)
    frames, sr = decode_wav(data)
    assert sr == 22_050 and frames.shape[1] == 1
    assert np.array_equal(frames[:, 0], s)

    # real WAVs carry extra chunks between fmt and data: inject a LIST
    # chunk (odd size -> word-aligned padding) and decode must still work
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = data[:fmt_end] + extra + data[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    frames2, sr2 = decode_wav(patched)
    assert np.array_equal(frames2, frames) and sr2 == 22_050

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAIFF")
    with _pytest.raises(NotImplementedError):
        # 8-bit PCM: fmt chunk advertises bits=8
        bad = bytearray(data)
        struct.pack_into("<H", bad, 12 + 8 + 14, 8)
        decode_wav(bytes(bad))


def test_chunk_by_tokens_coverage_and_overlap(spark):
    from cdf_spark.operators.chunking import chunk_by_tokens

    words = " ".join(f"w{i}" for i in range(75))
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    chunks = chunk_by_tokens(df, chunk_tokens=32, overlap_tokens=8).collect()
    # starts 0,24,48,72 -> 4 chunks; last one short
    assert [c.chunk_idx for c in chunks] == [0, 1, 2, 3]
    assert [c.chunk_len for c in chunks] == [32, 32, 27, 3]
    # overlap: each chunk's first 8 tokens == previous chunk's last 8
    for prev, cur in zip(chunks, chunks[1:]):
        ptoks, ctoks = prev.chunk_text.split(), cur.chunk_text.split()
        assert ctoks[:8] == ptoks[24:32]
    # coverage: stride-prefixes reassemble the doc exactly
    rebuilt = []
    for c in chunks:
        rebuilt.extend(c.chunk_text.split()[:24])
    assert rebuilt[:75] == words.split()


def test_chunk_by_chars_identity(spark):
    from cdf_spark.operators.chunking import chunk_by_chars

    df = spark.createDataFrame([(1, "abcdefghij" * 10)], ["doc_id", "text"])  # 100 chars
    chunks = chunk_by_chars(df, chunk_chars=40, overlap_chars=10).collect()
    # stride 30: starts 0,30,60,90
    assert [c.chunk_idx for c in chunks] == [0, 1, 2, 3]
    assert [c.chunk_len for c in chunks] == [40, 40, 40, 10]
    text = "abcdefghij" * 10
    for c in chunks:
        start = c.chunk_idx * 30
        assert c.chunk_text == text[start : start + 40]


def test_chunk_rejects_bad_overlap(spark):
    from cdf_spark.operators.chunking import chunk_by_chars, chunk_by_tokens

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_by_tokens(df, chunk_tokens=8, overlap_tokens=8)
    with pytest.raises(ValueError):
        chunk_by_chars(df, chunk_chars=8, overlap_chars=9)


def test_image_resize_bilinear_properties(spark):
    """Bilinear resize quality mode: constant images are invariant,
    output dims are exact, a linear horizontal ramp keeps its mean
    under downscale (bilinear preserves linear signals away from the
    rounding floor), and the re-encoded BMP round-trips."""
    import numpy as np

    from cdf_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        resize_image,
        resize_images,
    )

    const = np.full((16, 20, 3), 77, dtype=np.uint8)
    out = resize_image(const, 7, 9, method="bilinear")
    assert out.shape == (7, 9, 3) and (out == 77).all()

    ramp = np.broadcast_to(
        np.linspace(0, 250, 50).astype(np.uint8)[None, :, None], (10, 50, 3)
    ).copy()
    down = resize_image(ramp, 10, 25, method="bilinear")
    assert abs(float(down.mean()) - float(ramp.mean())) < 1.5

    # nearest matches direct indexing
    arr = (np.arange(12 * 8 * 3).reshape(12, 8, 3) % 256).astype(np.uint8)
    nn = resize_image(arr, 6, 4, method="nearest")
    assert (nn == arr[1::2, 1::2]).all()  # (i+0.5)*2 -> floor = 2i+1

    # Spark-side plumbing: decode -> resize -> BMP re-encode roundtrip
    import pandas as pd

    pdf = pd.DataFrame({"asset_id": [1], "payload": [encode_bmp(const)]})
    sdf = spark.createDataFrame(pdf)
    row = resize_images(sdf, 7, 9, method="bilinear").collect()[0]
    assert (row.h, row.w) == (7, 9)
    dec = decode_image(bytes(row.payload))
    assert dec.shape == (7, 9, 3) and (dec == 77).all()


def test_y4m_codec_roundtrip_and_guards():
    import numpy as np
    import pytest

    from cdf_spark.operators.multimodal import decode_y4m, encode_y4m

    f = (np.arange(4 * 6 * 8).reshape(4, 6, 8) * 7 % 256).astype(np.uint8)
    data = encode_y4m(f, fps=30)
    assert data.startswith(b"YUV4MPEG2 W8 H6 F30:1")
    assert (decode_y4m(data) == f).all()
    with pytest.raises(ValueError, match="even dimensions"):
        encode_y4m(f[:, :5, :])
    with pytest.raises(ValueError, match="not a y4m"):
        decode_y4m(b"RIFFxxxx")
    # 4:2:2 chroma refused honestly
    bad = data.replace(b"C420", b"C422")
    with pytest.raises(NotImplementedError):
        decode_y4m(bad)


def test_dup_spans_maximal_merge_and_removal(spark):
    """Sliding-window substring dedup: a planted shared 12-token run
    flags as ONE maximal span on the LATER doc only (first occurrence
    survives); adjacent windows merge; removal cuts exactly the span."""
    from cdf_spark.operators.curation import dup_spans, remove_dup_spans

    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (0, "alpha beta " + shared + " gamma delta epsilon zeta eta theta"),
        (1, "one two three " + shared + " four five six seven eight nine"),
        (2, " ".join(f"u{i}" for i in range(20))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {(r.doc_id, r.span_start, r.span_end) for r in dup_spans(df, k=10).collect()}
    # doc 1's copy starts at token 3; the 12-token run yields windows
    # p=3..5 which merge into one [3, 15) span; doc 0 keeps its copy.
    assert spans == {(1, 3, 15)}
    cut = {r.doc_id: r for r in remove_dup_spans(df, dup_spans(df, k=10)).collect()}
    assert cut[1].n_cut == 12
    assert cut[1].text_cut == "one two three four five six seven eight nine"
    assert cut[0].n_cut == 0 and cut[2].n_cut == 0
    assert cut[0].text_cut == rows[0][1]


def test_decontamination_pairs_identifies_the_leaking_item(spark):
    """Per-pair report: the candidate sharing a planted 6-token run
    with eval item 100 flags against THAT item only; the clean
    candidate produces no pair row at all (sparse output)."""
    from cdf_spark.operators.curation import decontamination_pairs

    leak = "alpha beta gamma delta epsilon zeta"
    cand = spark.createDataFrame(
        [(1, leak + " one two three four"), (2, "u1 u2 u3 u4 u5 u6 u7 u8")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, leak), (200, "p1 p2 p3 p4 p5 p6")], "eval_id long, text string"
    )
    rows = decontamination_pairs(cand, ev, n=4, threshold=0.1).collect()
    assert {(r.doc_id, r.eval_id) for r in rows} == {(1, 100)}
    r = rows[0]
    # cand 1 has 7 distinct 4-grams, eval 100 has 3, all 3 shared
    # jaccard is round()ed to 6 decimals inside the operator
    assert r.n_shared == 3 and abs(r.jaccard - 3 / 7) < 1e-6 and r.contaminated


def _brute_dup_spans(docs: dict[int, list[str]], k: int) -> set[tuple[int, int, int]]:
    """Reference ExactSubstr: enumerate every k-window, first
    occurrence by (doc, pos) survives, merge overlapping flags."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for d in sorted(docs):
        toks = docs[d]
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((d, p))
    flagged: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) > 1:
            for d, p in sorted(positions)[1:]:
                flagged.setdefault(d, []).append(p)
    spans = set()
    for d, ps in flagged.items():
        ps.sort()
        start, end = ps[0], ps[0] + k
        for p in ps[1:]:
            if p > end:
                spans.add((d, start, end))
                start, end = p, p + k
            else:
                end = max(end, p + k)
        spans.add((d, start, end))
    return spans


def test_dup_spans_property_random_corpora(spark):
    """dup_spans equals the brute-force reference on adversarial small
    corpora: tiny alphabet (forced collisions), repeated runs, docs
    shorter than k, overlapping self-repeats within one doc."""
    import random

    rng = random.Random(20260815)
    from cdf_spark.operators.curation import dup_spans

    for trial in range(6):
        k = rng.choice([3, 4])
        vocab = [f"w{i}" for i in range(rng.choice([2, 3, 5]))]
        docs = {
            d: [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
            for d in range(rng.randint(2, 7))
        }
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
        )
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in dup_spans(df, k=k).collect()
        }
        want = _brute_dup_spans(docs, k)
        assert got == want, f"trial {trial}: k={k} docs={docs}"


def test_exact_substr_index_incremental_contract(spark, tmp_path):
    """Probe == full-corpus dup_spans for the batch docs; add() keeps
    the index gram-unique; within-batch repeats also flag."""
    from cdf_spark.operators.curation import ExactSubstrIndex, dup_spans

    run_a = " ".join(f"a{i}" for i in range(12))
    run_b = " ".join(f"b{i}" for i in range(10))
    docs = [
        (0, "x0 x1 " + run_a + " x2 x3 x4 x5 x6 x7"),          # build
        (1, run_b + " y0 y1 y2 y3 y4 y5 y6 y7 y8 y9"),          # add()
        # probe: repeats run_a (from build) AND run_b (from add) AND
        # its own prefix z-run twice
        (2, run_a + " z0 z1 z2 z3 " + run_b + " w0 w1 w2"),
        (3, " ".join(f"z{i % 10}" for i in range(10)) + " q0 q1 q2 "
            + " ".join(f"z{i % 10}" for i in range(10))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = ExactSubstrIndex(str(tmp_path / "esi"))
    idx.build(df.filter("doc_id = 0"), k=10)
    idx.add(df.filter("doc_id = 1"))
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in idx.probe(df.filter("doc_id >= 2")).collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(df, k=10).filter("doc_id >= 2").collect()
    }
    assert got == want
    assert any(d == 2 for d, _s, _e in got)  # cross-batch dups found
    assert any(d == 3 for d, _s, _e in got)  # within-batch repeat found
    # gram-unique after add: re-adding doc 1 must append nothing
    grams = spark.read.parquet(str(tmp_path / "esi" / "grams"))
    n_before = grams.count()
    assert n_before == grams.distinct().count()
    idx.add(df.filter("doc_id = 1"))
    assert spark.read.parquet(str(tmp_path / "esi" / "grams")).count() == n_before


def test_streaming_substr_index_replay_idempotent(spark, tmp_path):
    """The worst at-least-once case: an epoch crashes AFTER its spans
    landed AND its grams folded into the index, then replays from the
    checkpoint. The before_epoch fence keeps the replayed probe from
    seeing its own crashed fold (which would flag every window), the
    per-epoch overwrite keeps spans un-duplicated, and the novel-gram
    anti-join keeps the re-add a no-op. Final output must equal the
    clean batch dup_spans answer."""
    import os
    import time

    from cdf_spark.operators.curation import ExactSubstrIndex, dup_spans

    run = " ".join(f"s{i}" for i in range(12))
    docs = [
        (0, "a0 a1 " + run + " a2 a3 a4 a5 a6 a7"),
        (1, " ".join(f"b{i}" for i in range(20))),
        (2, run + " c0 c1 c2 c3 c4 c5 c6 c7"),      # dups doc 0's run
        (3, "d0 d1 d2 " + run + " d3 d4 d5 d6"),     # dups again
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tmp = str(tmp_path)
    os.makedirs(f"{tmp}/in")
    t0 = time.time() - 1000
    for i, (lo, hi) in enumerate([(0, 2), (2, 3), (3, 4)]):
        import shutil
        import tempfile

        stage = tempfile.mkdtemp()
        df.filter(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (src,) = [p for p in sorted(os.listdir(stage)) if p.endswith(".parquet")]
        shutil.move(f"{stage}/{src}", f"{tmp}/in/part-{i}.parquet")
        os.utime(f"{tmp}/in/part-{i}.parquet", (t0 + i * 10, t0 + i * 10))
        shutil.rmtree(stage, ignore_errors=True)

    idx = ExactSubstrIndex(f"{tmp}/idx")
    idx.build(df.limit(0), k=10)
    crashed = {"done": False}

    def handle(batch_df, epoch_id: int) -> None:
        fence = int(epoch_id) + 1
        idx.probe(batch_df, before_epoch=fence).write.mode("overwrite").parquet(
            f"{tmp}/out/epoch={epoch_id}"
        )
        idx.add(batch_df, epoch=fence)
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True  # crash AFTER spans + fold landed
            raise RuntimeError("injected crash after epoch 1 side effects")

    def drain():
        return (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
            .writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{tmp}/ck")
            .start()
        )

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException):
        drain().awaitTermination()
    assert crashed["done"]
    drain().awaitTermination()  # replay epoch 1 + run epoch 2

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(f"{tmp}/out").select(
            "doc_id", "span_start", "span_end"
        ).collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(df, k=10).collect()
    }
    assert got == want and any(d == 2 for d, *_ in got) and any(d == 3 for d, *_ in got)


def test_dup_spans_xxhash_twin_parity(spark):
    """The xxhash64 bench twin (words pre-hashed to longs, window
    fingerprint = xxhash64 over the k-long slice — no gram string
    built) must find EXACTLY the md5 path's spans on the real corpus
    — the license for benchmarking it in the md5 entry's place."""
    from cdf_spark.operators.curation import dup_spans

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    slow = sorted(map(tuple, dup_spans(docs, k=10).collect()))
    fast = sorted(map(tuple, dup_spans(docs, k=10, hash_fn="xxhash64").collect()))
    assert slow == fast and len(slow) > 0


# ---------------------------------------------------------------------------
# DSIR importance resampling (r12)


def _dsir_brute(corpus_rows, target_rows, dim=64):
    """Pure-Python DSIR twin: hashed unigram+bigram bag models with
    add-one smoothing, integer micro-nat log-ratio per doc."""
    import hashlib
    import math
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % dim

    def feats(t):
        ts = toks(t)
        return [h(w) for w in ts] + [h(ts[i] + " " + ts[i + 1]) for i in range(len(ts) - 1)]

    def model(all_feats):
        counts = {}
        for b in all_feats:
            counts[b] = counts.get(b, 0) + 1
        n = sum(counts.values())
        ln_d = math.log(n + dim)
        lp = {b: int(round((math.log(c + 1.0) - ln_d) * 1e6)) for b, c in counts.items()}
        floor = int(round((0.0 - ln_d) * 1e6))
        return lp, floor

    t_feats = [b for _, t in target_rows for b in feats(t)]
    r_feats = [b for _, t in corpus_rows for b in feats(t)]
    lp_t, f_t = model(t_feats)
    lp_r, f_r = model(r_feats)
    out = {}
    for did, t in corpus_rows:
        fs = feats(t)
        if not fs:
            continue
        out[did] = (len(fs), sum(lp_t.get(b, f_t) - lp_r.get(b, f_r) for b in fs))
    return out


def test_dsir_weights_match_brute_force(spark):
    from cdf_spark.operators.curation import dsir_importance_weights

    target_rows = [(100, "quantum energy states decay"), (101, "energy spectrum of quantum wells")]
    corpus_rows = [
        (1, "quantum decay rates in excited energy states"),
        (2, "buy cheap watches online free shipping"),
        (3, "casino bonus spins win big now"),
        (4, "the energy of a quantum system"),
        (5, "!!! ???"),  # zero features -> excluded
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    target = spark.createDataFrame(target_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["lw_unat"])
        for r in dsir_importance_weights(corpus, target, dim=64).collect()
    }
    assert got == _dsir_brute(corpus_rows, target_rows, dim=64)


def test_dsir_select_prefers_target_lookalikes(spark):
    from cdf_spark.operators.curation import dsir_select

    target = spark.createDataFrame(
        [(100, "quantum energy states decay"), (101, "energy spectrum of quantum wells")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "quantum decay rates in excited energy states"),
            (2, "buy cheap watches online free shipping today"),
            (3, "casino bonus spins win big now friend"),
            (4, "the energy of a quantum system"),
            (6, "cheap casino watches free bonus shipping"),
        ],
        ["doc_id", "text"],
    )
    picked = dsir_select(corpus, target, k=2, dim=256).collect()
    assert sorted(r["doc_id"] for r in picked) == [1, 4]
    # rk is a total deterministic order: weight desc, id asc
    by_rk = sorted(picked, key=lambda r: r["rk"])
    assert [r["rk"] for r in by_rk] == [1, 2]
    assert by_rk[0]["lw_unat"] >= by_rk[1]["lw_unat"]


def test_dsir_zero_feature_docs_carry_no_row(spark):
    from cdf_spark.operators.curation import dsir_importance_weights

    corpus = spark.createDataFrame([(1, "real words here"), (2, "%%% ***")], ["doc_id", "text"])
    target = spark.createDataFrame([(9, "real words")], ["doc_id", "text"])
    ids = [r["doc_id"] for r in dsir_importance_weights(corpus, target, dim=32).collect()]
    assert ids == [1]


def test_dsir_index_fold_equals_one_shot(spark, tmp_path):
    """Bucket counts add: a 2-fold DSIRIndex scores bit-identically
    to dsir_importance_weights over the union."""
    from cdf_spark.operators.curation import DSIRIndex, dsir_importance_weights

    target = spark.createDataFrame(
        [(100, "quantum energy states decay"), (101, "energy spectrum of quantum wells")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "quantum decay rates in excited energy states"),
            (2, "buy cheap watches online free shipping today"),
            (3, "casino bonus spins win big now friend"),
            (4, "the energy of a quantum system"),
        ],
        ["doc_id", "text"],
    )
    idx = DSIRIndex(tmp_path / "dsir")
    idx.build(spark, target, dim=64)
    idx.update(spark, corpus.filter(F.col("doc_id") <= 2), epoch=0)
    idx.update(spark, corpus.filter(F.col("doc_id") > 2), epoch=1)
    folded = sorted(map(tuple, idx.weights(spark, corpus).collect()))
    one_shot = sorted(map(tuple, dsir_importance_weights(corpus, target, dim=64).collect()))
    assert folded == one_shot and len(folded) == 4


def test_dsir_index_fence_reclaim_and_refusals(spark, tmp_path):
    import pytest as _pytest

    from cdf_spark.operators.curation import DSIRIndex

    target = spark.createDataFrame([(9, "real words")], ["doc_id", "text"])
    batch = spark.createDataFrame([(1, "real words here")], ["doc_id", "text"])
    idx = DSIRIndex(tmp_path / "dsir")
    with _pytest.raises(ValueError, match="empty"):
        idx.update(spark, batch)
    with _pytest.raises(ValueError, match="empty"):
        idx.weights(spark, batch)
    idx.build(spark, target, dim=32)
    with _pytest.raises(ValueError, match="already built"):
        idx.build(spark, target, dim=32)
    m1 = idx.update(spark, batch, epoch=5)
    assert idx.update(spark, batch, epoch=5) == m1  # fenced replay
    # versions reclaim keep-live-minus-one
    for i in range(6, 10):
        idx.update(spark, batch.withColumn("doc_id", F.col("doc_id") + i), epoch=i)
    live = idx._meta()["version"]
    vers = sorted(
        int(d.name[len("raw_v"):])
        for d in (tmp_path / "dsir").iterdir()
        if d.is_dir() and d.name.startswith("raw_v")
    )
    assert vers == [live - 1, live]


def test_leakage_safe_split_keeps_clusters_atomic(spark):
    """A planted near-dup pair must land on ONE side; every doc gets
    exactly one assignment; sides are the deterministic hash rule."""
    from cdf_spark.operators.dedup_approx import leakage_safe_split

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight!"),  # near-dup of 1
            (3, "completely different text about gardening and soil"),
            (4, "another unrelated document concerning financial markets"),
        ],
        ["doc_id", "text"],
    )
    from cdf_spark.operators.dedup_approx import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("id_a", "id_b")
    out = leakage_safe_split(docs.select("doc_id"), pairs).collect()
    assert len(out) == 4 and len({r["doc_id"] for r in out}) == 4
    by_id = {r["doc_id"]: r for r in out}
    # the planted pair clusters together and lands on one side
    assert by_id[1]["cluster"] == by_id[2]["cluster"]
    assert by_id[1]["split"] == by_id[2]["split"]
    assert {r["split"] for r in out} <= {"train", "test"}
    # deterministic: same rule, same answer
    out2 = leakage_safe_split(docs.select("doc_id"), pairs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_ivf_hard_negatives_exclude_anchor_label_and_self(spark):
    from cdf_spark.operators.similarity import ivf_hard_negatives

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    anchors = emb.filter("vec_id < 10")
    out = ivf_hard_negatives(emb, anchors, k=5, nprobe=8, centroid_modulus=50)
    rows = out.collect()
    assert rows
    labels = {r["vec_id"]: r["label"] for r in anchors.collect()}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert r["neg_label"] != labels[r["query_id"]]
    # ranks are contiguous from 1 per anchor
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["query_id"]].append(r["rank"])
    for q, rks in per.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_lm_index_zero_token_first_batch_does_not_crash(spark, tmp_path):
    from cdf_spark.operators.curation import LMIndex

    idx = LMIndex(tmp_path / "lm")
    m = idx.update(spark, spark.createDataFrame([(1, "!!! ,,,")], ["doc_id", "text"]))
    assert m["n_total"] == 0 and m["v"] == 0
    # a later real fold lands normally
    m2 = idx.update(spark, spark.createDataFrame([(2, "real words")], ["doc_id", "text"]))
    assert m2["n_total"] == 2


def test_winnow_near_dups_final_plan_is_fingerprint_bounded(spark):
    """Plan guard (r14): winnow_near_dups checkpoints the fingerprint
    table, so the FINAL plan never re-derives the gram/window pass or
    re-scans the corpus — the pair join is bucketed by fingerprint
    with the df-cap anti-join, bounded exchanges."""
    import tempfile

    from cdf_spark.operators.curation import winnow_near_dups

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta " * 3 + f"tail{i}")
             for i in range(12)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        out = winnow_near_dups(docs, k=5, w=4, min_shared=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "fingerprints must be checkpointed"
        assert plan.count("Exchange") <= 6
        assert out.count() > 0  # the shared boilerplate pairs everything


def test_psi_final_plans_are_checkpoint_bounded(spark):
    """Plan guard (r14): psi_drift (both binning methods) checkpoints
    the merged O(bins) count table — the FINAL plan is a projection
    over it: zero exchanges, zero source scans. psi_drift_by
    checkpoints bounds + merged counts — the final plan is one tiny
    totals join, no source scans."""
    import tempfile

    from cdf_spark.operators.drift import psi_drift, psi_drift_by

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(("s%d" % (i % 3)), float(i % 17)) for i in range(300)], ["src", "x"]
        ).write.mode("overwrite").parquet(f"{tmp}/snap")
        snap = spark.read.parquet(f"{tmp}/snap")
        ref, cur = snap.filter("x < 12"), snap.filter("x >= 3")
        for method in ("width", "quantile"):
            out = psi_drift(ref, cur, "x", bins=5, method=method)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert plan.count(tmp) == 0, method
            assert plan.count("Exchange") == 0, method
        out = psi_drift_by(ref, cur, "x", by="src", bins=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0
        assert plan.count("Exchange") <= 2
        assert out.count() > 0


def test_bigram_lm_final_plans_never_rescan_the_corpus(spark):
    """Plan guard (r14): both bigram LMs (add-one and Kneser-Ney) pin
    the token and transition tables — the FINAL plan re-tokenizes the
    corpus ZERO times (it was 5 corpus scans each when every consumer
    re-derived the tokenize), and the first-token cut reads the token
    table directly, never paying the transition window. The LM pins
    are deliberately NOT size-gated (r15 measured rejection: the lazy
    re-tokenize loses to the pin even at sf0.1), so this shape must
    hold with no gate conf set."""
    import tempfile

    from cdf_spark.operators.curation import (
        lm_bigram_perplexity_scores,
        lm_kn_bigram_perplexity_scores,
    )

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, "the quick fox jumps over the lazy dog") for i in range(30)],
            ["doc_id", "text"],
        ).write.mode("overwrite").parquet(f"{tmp}/docs")
        docs = spark.read.parquet(f"{tmp}/docs")
        for fn in (lm_bigram_perplexity_scores, lm_kn_bigram_perplexity_scores):
            out = fn(docs)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert plan.count(tmp) == 0, fn.__name__
            assert plan.count("Exchange") <= 11, fn.__name__
            assert out.count() == 30


def test_semantic_dedup_final_plan_is_checkpoint_bounded(spark):
    """Plan guard (r14): semantic_dedup's cluster assignment feeds
    both pair-join sides and the final anti-join — checkpointed, the
    FINAL plan re-runs the assignment pass ZERO times (it was 12
    corpus scans left lazy)."""
    import tempfile

    from cdf_spark.operators.similarity import semantic_dedup

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(60)],
            ["vec_id", "embedding"],
        ).write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")
        out = semantic_dedup(emb, centroid_modulus=10, threshold=0.99)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count(tmp) == 0, "assignment must be checkpointed"
        assert plan.count("Exchange") <= 5
        assert 0 < out.count() <= 60
