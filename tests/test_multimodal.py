"""Multimodal operators: image perceptual-hash (dHash) dedup (r10).

The decode/stats paths are covered in test_llm_ops; this file pins the
dHash fingerprint semantics and the banded Hamming near-dup join.
"""

from __future__ import annotations


def test_image_dhash_invariance_and_near_dup(spark):
    """dHash is invariant to gradient-preserving brightness shifts and
    discriminates unrelated images; the banded Hamming join finds the
    planted copy and nothing else."""
    from cdf_spark.operators.multimodal import (
        image_dhash,
        image_dhash_near_dups,
        synthetic_bmp_near_dup_table,
    )

    ids = spark.createDataFrame(
        [(i,) for i in range(12)] + [(1000 + 3,)], "doc_id long"
    )
    imgs = synthetic_bmp_near_dup_table(ids)
    hashes = image_dhash(imgs)
    by_id = {r.asset_id: r.dhash for r in hashes.collect()}
    assert all(len(h) == 64 and set(h) <= {"0", "1"} for h in by_id.values())
    # the shifted copy's hash is close to its source, far from others
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(by_id[3], by_id[1003]) <= 6
    others = [ham(by_id[3], by_id[i]) for i in range(12) if i != 3]
    assert min(others) > 6
    pairs = {(r.id_a, r.id_b) for r in image_dhash_near_dups(hashes).collect()}
    assert pairs == {(3, 1003)}


def test_audio_envelope_invariance_and_near_dup(spark):
    """The envelope hash survives a uniform 9/8 gain re-level (same
    recording, different mastering) and discriminates unrelated clips;
    the shared banded Hamming matcher finds the planted copy only."""
    from cdf_spark.operators.multimodal import (
        audio_envelope_hash,
        banded_hamming_near_dups,
        synthetic_wav_near_dup_table,
    )

    ids = spark.createDataFrame(
        [(i,) for i in range(12)] + [(1000 + 5,)], "doc_id long"
    )
    wavs = synthetic_wav_near_dup_table(ids)
    hashes = audio_envelope_hash(wavs)
    by_id = {r.asset_id: r.dhash for r in hashes.collect()}
    assert all(len(h) == 64 and set(h) <= {"0", "1"} for h in by_id.values())
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(by_id[5], by_id[1005]) <= 6
    others = [ham(by_id[5], by_id[i]) for i in range(12) if i != 5]
    assert min(others) > 6
    pairs = {(r.id_a, r.id_b) for r in banded_hamming_near_dups(hashes).collect()}
    assert pairs == {(5, 1005)}
