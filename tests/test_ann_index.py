"""Persisted incremental IVF ANN index — fold-equivalence vs the
one-shot assignment, replay fencing, crash-orphan sweep, and
probe-without-rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.similarity import IVFIndex, ivf_assign, _ivf_probe_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _folded(spark, emb, tmp_path, folds=3):
    idx = IVFIndex(tmp_path / "ivf")
    idx.build(spark, emb.filter("vec_id % 3 = 0"), centroid_modulus=10, epoch=0)
    for i in range(1, folds):
        idx.add(spark, emb.filter(f"vec_id % 3 = {i}"), epoch=i)
    return idx


def test_folded_index_equals_one_shot_assignment(spark, emb, tmp_path):
    """Frozen centroids make folding exact: the union of per-batch
    assignments is bit-identical to one ivf_assign over the whole
    corpus with the same centroids."""
    idx = _folded(spark, emb, tmp_path)
    meta = idx._meta()
    assert meta["n_rows"] == emb.count()
    cents = spark.read.parquet(str(idx.root / "centroids"))
    one_shot = ivf_assign(emb, cents).select("id", "cluster")
    folded = spark.read.parquet(
        *[str(idx.root / p) for p in meta["parts"]]
    ).select("id", "cluster")
    assert folded.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(folded).count() == 0


def test_folded_probe_equals_one_shot_probe(spark, emb, tmp_path):
    idx = _folded(spark, emb, tmp_path)
    got = idx.query(spark, emb.filter("vec_id < 20"), k=10, nprobe=4)
    cents = spark.read.parquet(str(idx.root / "centroids"))
    want = _ivf_probe_topk(
        ivf_assign(emb, cents), cents, emb.filter("vec_id < 20"),
        10, 4, "vec_id", "embedding", 4,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_epoch_fence_makes_refold_noop(spark, emb, tmp_path):
    idx = IVFIndex(tmp_path / "ivf")
    idx.build(spark, emb.filter("vec_id % 3 = 0"), centroid_modulus=10, epoch=0)
    m1 = idx.add(spark, emb.filter("vec_id % 3 = 1"), epoch=1)
    replay = idx.add(spark, emb.filter("vec_id % 3 = 1"), epoch=1)
    assert replay == m1
    assert len(m1["parts"]) == 2  # seed + one fold, no duplicate part


def test_crash_orphan_postings_swept(spark, emb, tmp_path):
    """A postings dir written without a meta swap (crashed fold) is
    invisible to query() and swept by the next successful add()."""
    idx = IVFIndex(tmp_path / "ivf")
    idx.build(spark, emb.filter("vec_id % 3 = 0"), centroid_modulus=10, epoch=0)
    orphan = tmp_path / "ivf" / "postings_p7"
    orphan.mkdir()
    (orphan / "junk.txt").write_text("crashed fold remnant")
    n_before = idx.query(spark, emb.filter("vec_id < 5"), k=5, nprobe=2).count()
    assert n_before > 0  # orphan not read
    idx.add(spark, emb.filter("vec_id % 3 = 1"), epoch=1)
    assert not orphan.exists()


def test_probe_reads_only_index_state_after_restart(spark, emb, tmp_path):
    """A FRESH IVFIndex handle (new process restarting on the same
    root) probes identically — all state is on disk."""
    idx = _folded(spark, emb, tmp_path)
    got = idx.query(spark, emb.filter("vec_id < 10"), k=5, nprobe=3)
    again = IVFIndex(tmp_path / "ivf").query(
        spark, emb.filter("vec_id < 10"), k=5, nprobe=3
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_build_refusals(spark, emb, tmp_path):
    idx = IVFIndex(tmp_path / "ivf")
    with pytest.raises(ValueError, match="build"):
        idx.add(spark, emb.limit(5))
    with pytest.raises(ValueError, match="build"):
        idx.query(spark, emb.limit(5))
    with pytest.raises(ValueError, match="centroid-eligible"):
        idx.build(spark, emb.filter("vec_id % 10 = 3"), centroid_modulus=10)
    idx.build(spark, emb.filter("vec_id % 3 = 0"), centroid_modulus=10)
    with pytest.raises(ValueError, match="already built"):
        idx.build(spark, emb.filter("vec_id % 3 = 1"), centroid_modulus=10)


# ---------------------------------------------------------------------------
# deletes + compaction (r12)


def test_delete_equals_one_shot_over_live_rows(spark, emb, tmp_path):
    """Frozen-model deletion is exact: probing (postings − tombstones)
    is bit-identical to a one-shot assignment over only the live rows
    with the same centroid set."""
    idx = _folded(spark, emb, tmp_path)
    idx.delete(spark, emb.filter("vec_id % 7 = 3").select("vec_id"), epoch=10)
    got = idx.query(spark, emb.filter("vec_id < 20"), k=10, nprobe=4)
    cents = spark.read.parquet(str(idx.root / "centroids"))
    live = emb.filter("vec_id % 7 != 3")
    want = _ivf_probe_topk(
        ivf_assign(live, cents), cents, emb.filter("vec_id < 20"),
        10, 4, "vec_id", "embedding", 4,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # no deleted id survives as a neighbor
    assert got.filter(F.col("neighbor_id") % 7 == 3).count() == 0


def test_delete_keeps_frozen_centroids(spark, emb, tmp_path):
    """FAISS remove_ids semantics: deleting a centroid-source vector
    removes its POSTING, never the centroid (the quantizer is a frozen
    model artifact)."""
    idx = _folded(spark, emb, tmp_path)
    cents_before = spark.read.parquet(str(idx.root / "centroids")).count()
    # vec_id % 30 == 0 rows are centroid sources; delete one
    idx.delete(spark, emb.filter("vec_id = 0").select("vec_id"), epoch=10)
    assert spark.read.parquet(str(idx.root / "centroids")).count() == cents_before
    got = idx.query(spark, emb.filter("vec_id < 20"), k=10, nprobe=4)
    assert got.filter(F.col("neighbor_id") == 0).count() == 0


def test_compact_is_pure_rewrite_and_retires_then_sweeps(spark, emb, tmp_path):
    idx = _folded(spark, emb, tmp_path)
    idx.delete(spark, emb.filter("vec_id % 7 = 3").select("vec_id"), epoch=10)
    qs = emb.filter("vec_id < 20")
    before = sorted(map(tuple, idx.query(spark, qs, k=10, nprobe=4).collect()))
    old_meta = idx._meta()
    mc = idx.compact(spark)
    assert len(mc["parts"]) == 1 and mc["tombstones"] == []
    assert mc["n_rows"] == emb.filter("vec_id % 7 != 3").count()
    after = sorted(map(tuple, idx.query(spark, qs, k=10, nprobe=4).collect()))
    assert after == before
    # replaced dirs are RETIRED (still on disk for in-flight readers)...
    for p in old_meta["parts"] + old_meta["tombstones"]:
        assert (idx.root / p).exists()
    # ...and swept by the NEXT successful mutation (fresh ids via a
    # shifted projection of real rows)
    mx = int(emb.agg(F.max("vec_id")).collect()[0][0])
    extra = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + mx + 1).alias("vec_id"), "embedding"
    )
    idx.add(spark, extra, epoch=11)
    for p in old_meta["parts"] + old_meta["tombstones"]:
        assert not (idx.root / p).exists()
    # part naming never collides after compaction (monotone seq)
    m = idx._meta()
    assert len(set(m["parts"])) == len(m["parts"])


def test_delete_replay_is_fenced_noop(spark, emb, tmp_path):
    idx = _folded(spark, emb, tmp_path)
    m1 = idx.delete(spark, emb.filter("vec_id % 7 = 3").select("vec_id"), epoch=10)
    replay = idx.delete(spark, emb.filter("vec_id % 7 = 3").select("vec_id"), epoch=10)
    assert replay == m1 and len(m1["tombstones"]) == 1


def test_delete_overlap_and_unknown_ids_keep_live_count_exact(spark, emb, tmp_path):
    """Overlapping deletes never re-tombstone (no anti-join growth)
    and unknown ids subtract nothing — n_rows stays the live count."""
    idx = _folded(spark, emb, tmp_path)
    total = emb.count()
    k7 = emb.filter("vec_id % 7 = 3").count()
    m1 = idx.delete(spark, emb.filter("vec_id % 7 = 3").select("vec_id"), epoch=10)
    assert m1["n_rows"] == total - k7
    # superset re-delete: only the genuinely-new dead ids land
    extra = emb.filter("(vec_id % 7 = 3) OR (vec_id % 11 = 5)").select("vec_id")
    k11_new = emb.filter("(vec_id % 11 = 5) AND (vec_id % 7 != 3)").count()
    m2 = idx.delete(spark, extra, epoch=11)
    assert m2["n_rows"] == total - k7 - k11_new
    tomb1 = spark.read.parquet(str(idx.root / m2["tombstones"][1])).count()
    assert tomb1 == k11_new
    # unknown ids: counter no-op AND no empty tombstone part appended
    m3 = idx.delete(spark, spark.range(10**9, 10**9 + 5).selectExpr("id AS vec_id"), epoch=12)
    assert m3["n_rows"] == m2["n_rows"]
    assert m3["tombstones"] == m2["tombstones"]
    assert m3["last_epoch"] == 12
