"""Table maintenance at scale: bin-pack compaction (rewrite ONLY small
files) and physical-storage reclamation (Delta VACUUM), composing with
row-level deletes, sequence scoping, incremental consumers, and
expire_snapshots.

The full-table `compact()` on the destinations is O(table); these ops
are O(small files) / O(tombstones) — the only shapes that survive at
100 TB. Reference parity: the reference's destination protocol is
commit-atomic maintenance (crates/cdf-kernel/src/destination.rs) — every
op here is one new snapshot/commit, never an in-place edit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable
from cdf_spark.sources.iceberg import IcebergFixtureWriter, IcebergTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# Iceberg rewrite_small_files (bin-pack)


def test_iceberg_binpack_merges_small_files_only(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    for i in range(4):  # four per-epoch small files
        w.append(o.offset(40 * i).limit(40), timestamp_ms=1_000 + i)
    t = IcebergTable(tmp_path / "t")
    before = _rows(t.read(spark))
    res = w.rewrite_small_files(spark, small_bytes=1 << 30, target_bytes=1 << 30)
    assert res["rewritten"] == 4 and res["files_after"] < res["files_before"]
    after = IcebergTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before
    # history intact: pre-compaction snapshot still time-travels
    snaps = after.snapshots()
    assert len(snaps) == 5
    first = int(snaps[0]["snapshot-id"])
    assert after.read(spark, snapshot_id=first).count() == 40


def test_iceberg_binpack_leaves_big_files(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(150), timestamp_ms=1_000)  # "big"
    w.append(o.offset(150).limit(5), timestamp_ms=2_000)  # small
    w.append(o.offset(155).limit(5), timestamp_ms=3_000)  # small
    t = IcebergTable(tmp_path / "t")
    big_file = t.files_for_snapshot(int(t.snapshots()[0]["snapshot-id"]))[0]
    # threshold between the small files (~5 rows) and the big one
    small_cut = (tmp_path / "t" / "data").stat
    sizes = sorted(
        (p.stat().st_size) for p in (tmp_path / "t" / "data").glob("*.parquet")
    )
    cut = (sizes[-1] + sizes[-2]) // 2
    res = w.rewrite_small_files(spark, small_bytes=cut, target_bytes=1 << 30)
    assert res["rewritten"] == 2
    after = IcebergTable(tmp_path / "t")
    live = after.files_for_snapshot(after.current_snapshot_id())
    assert big_file in live  # untouched survivor, same physical file
    assert len(live) == 2  # big + one merged
    assert after.read(spark).count() == 160


def test_iceberg_binpack_resolves_deletes_and_keeps_seq_scoping(spark, tmp_path, orders):
    """Positional + equality deletes: merged files carry post-delete
    rows; the surviving big file keeps its ORIGINAL sequence number so
    the live equality delete still applies to it after the rewrite."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(100), timestamp_ms=1_000)  # big file, seq 1
    w.append(o.offset(100).limit(8), timestamp_ms=2_000)  # small, seq 2
    w.append(o.offset(108).limit(8), timestamp_ms=3_000)  # small, seq 3
    t = IcebergTable(tmp_path / "t")
    # positional delete: first row of one small file
    small_files = t.files_for_snapshot(t.current_snapshot_id())
    sizes = {p: __import__("pathlib").Path(p).stat().st_size for p in small_files}
    ordered = sorted(sizes, key=sizes.get)
    w.delete_positions([(ordered[0], 0)], timestamp_ms=4_000)
    # equality delete hitting rows in the BIG file
    keys = [r.o_orderkey for r in o.limit(3).collect()]
    w.delete_equality([{"o_orderkey": k} for k in keys], ["o_orderkey"], timestamp_ms=5_000)
    t = IcebergTable(tmp_path / "t")
    before = _rows(t.read(spark))
    assert len(before) == 100 + 16 - 1 - 3
    cut = sizes[ordered[-1]]  # big file's size: everything below it is small
    res = w.rewrite_small_files(spark, small_bytes=cut, target_bytes=1 << 30)
    assert res["rewritten"] == 2
    after = IcebergTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before
    # the equality delete is still live and still applies to the big
    # file (original seq 1 < delete seq); merged file exempt (new seq)
    assert len(after._eq_delete_entries(after.current_snapshot_id())) == 1


def test_iceberg_binpack_partitioned_groups_within_partition(spark, tmp_path):
    w = IcebergFixtureWriter(tmp_path / "t", seed=5, partition_by=["bucket"])
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(40)],
        ["id", "bucket", "v"],
    )
    for j in range(3):
        w.append(df.filter(f"id % 3 = {j}"), timestamp_ms=1_000 + j)
    t = IcebergTable(tmp_path / "t")
    before = _rows(t.read(spark))
    files_before = len(t.files_for_snapshot(t.current_snapshot_id()))
    assert files_before >= 6  # 3 commits x 2 partitions
    res = w.rewrite_small_files(spark, small_bytes=1 << 30, target_bytes=1 << 30)
    assert res["groups"] == 2  # one merge group per partition
    after = IcebergTable(tmp_path / "t")
    assert len(after.files_for_snapshot(after.current_snapshot_id())) == 2
    assert _rows(after.read(spark)) == before
    # partition pruning still works on the merged layout
    from cdf_spark.expressions.ast import Binary, Col, Lit

    pruned, _ev = after.data_files_pruned(
        after.current_snapshot_id(), [Binary("eq", Col("bucket"), Lit("a"))]
    )
    assert len(pruned) == 1


def test_iceberg_binpack_noop_below_two_files(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    w.append(orders.select("o_orderkey").limit(10), timestamp_ms=1_000)
    t = IcebergTable(tmp_path / "t")
    v_before = len(t.snapshots())
    res = w.rewrite_small_files(spark, small_bytes=1 << 30)
    assert res["rewritten"] == 0
    assert len(IcebergTable(tmp_path / "t").snapshots()) == v_before  # no commit


def test_iceberg_binpack_then_expire_reclaims_old_files(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(20), timestamp_ms=1_000)
    w.append(o.offset(20).limit(20), timestamp_ms=2_000)
    w.rewrite_small_files(spark, small_bytes=1 << 30, timestamp_ms=3_000)
    t = IcebergTable(tmp_path / "t")
    res = t.expire_snapshots(keep_last=1, delete_orphans=True)
    assert len(res["expired"]) == 2 and res["deleted"]
    t2 = IcebergTable(tmp_path / "t")
    assert t2.read(spark).count() == 40
    # the pre-compaction small files are physically gone
    import pathlib

    live = set(t2.files_for_snapshot(t2.current_snapshot_id()))
    on_disk = {
        str(p)
        for p in (tmp_path / "t" / "data").glob("*.parquet")
        if not p.name.startswith("delete-")
    }
    assert on_disk == live


# ---------------------------------------------------------------------------
# Delta optimize_small_files (bin-pack OPTIMIZE)


def test_delta_optimize_merges_and_preserves_content(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    for i in range(4):
        w.append(o.offset(30 * i).limit(30), timestamp_ms=1_000 + i)
    t = DeltaTable(tmp_path / "t")
    before = _rows(t.read(spark))
    res = w.optimize_small_files(spark, small_bytes=1 << 30, target_bytes=1 << 30)
    assert res["rewritten"] == res["files_before"] and res["files_after"] == 1
    after = DeltaTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before
    # time travel to the pre-OPTIMIZE version still works (no vacuum yet)
    assert after.read(spark, version=3).count() == 120


def test_delta_optimize_does_not_invalidate_incremental(spark, tmp_path, orders):
    """dataChange=false: a changes_since consumer sees NO new change
    and NO invalidation across an OPTIMIZE commit."""
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(30), timestamp_ms=1_000)
    w.append(o.offset(30).limit(30), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    pin = t.current_version()
    w.optimize_small_files(spark, small_bytes=1 << 30)
    from cdf_spark.positions import TableSnapshotPosition

    t2 = DeltaTable(tmp_path / "t")
    assert t2.current_version() == pin + 1
    changed, new_pos = t2.changes_since(spark, TableSnapshotPosition(snapshot_id=pin))
    assert changed is None or changed.count() == 0
    assert int(new_pos.snapshot_id) == pin + 1


def test_delta_optimize_resolves_deletion_vectors(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(40), timestamp_ms=1_000)
    w.append(o.offset(40).limit(40), timestamp_ms=2_000)
    keys = [r.o_orderkey for r in o.limit(5).collect()]
    w.delete_where(spark, f"o_orderkey in ({','.join(map(str, keys))})", timestamp_ms=3_000)
    t = DeltaTable(tmp_path / "t")
    before = _rows(t.read(spark))
    assert len(before) == 75
    res = w.optimize_small_files(spark, small_bytes=1 << 30)
    after = DeltaTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before
    # merged files carry no DVs
    assert all(dv is None for _p, dv in after.live_files_with_dvs(after.current_version()))


def test_delta_optimize_partitioned(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", partition_by=["bucket"])
    df = spark.createDataFrame(
        [(i, "x" if i % 2 == 0 else "y", float(i)) for i in range(30)],
        ["id", "bucket", "v"],
    )
    for j in range(3):
        w.append(df.filter(f"id % 3 = {j}"), timestamp_ms=1_000 + j)
    t = DeltaTable(tmp_path / "t")
    before = _rows(t.read(spark))
    res = w.optimize_small_files(spark, small_bytes=1 << 30)
    after = DeltaTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before
    live = after.live_adds(after.current_version())
    assert len(live) == 2
    assert {tuple(pv.items()) for _p, _dv, pv in live} == {
        (("bucket", "x"),),
        (("bucket", "y"),),
    }
    # files live under their partition dirs (paths come back resolved)
    for p, _dv, pv in live:
        assert f"/bucket={pv['bucket']}/" in p


# ---------------------------------------------------------------------------
# Delta vacuum


def test_delta_vacuum_reclaims_tombstones_respects_retention(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(50), timestamp_ms=1_000)
    w.overwrite(o.offset(50).limit(50), timestamp_ms=2_000)  # tombstones v0 files
    t = DeltaTable(tmp_path / "t")
    live_before = set(t.files_for_version(t.current_version()))
    # retention not yet elapsed (remove deletionTimestamps are
    # real-clock): a huge window reclaims nothing
    res = t.vacuum(retention_ms=10**15)
    assert res["deleted"] == [] and len(res["kept_recent"]) >= 1
    # dry run past retention: reports but keeps
    res = t.vacuum(retention_ms=0, dry_run=True)
    assert len(res["deleted"]) >= 1
    for f in res["deleted"]:
        assert __import__("pathlib").Path(f).exists()
    # real vacuum past retention
    res = t.vacuum(retention_ms=0)
    assert len(res["deleted"]) >= 1
    for f in res["deleted"]:
        assert not __import__("pathlib").Path(f).exists()
    t2 = DeltaTable(tmp_path / "t")
    assert set(t2.files_for_version(t2.current_version())) == live_before
    assert t2.read(spark).count() == 50
    # time travel to v0 is now broken — by protocol design
    with pytest.raises(Exception):
        t2.read(spark, version=0).count()


def test_delta_vacuum_keeps_live_dv_files_reclaims_stale(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(40), timestamp_ms=1_000)
    w.append(o.offset(40).limit(40), timestamp_ms=2_000)
    keys = [r.o_orderkey for r in o.limit(3).collect()]
    w.delete_where(spark, f"o_orderkey in ({','.join(map(str, keys))})", timestamp_ms=3_000)
    t = DeltaTable(tmp_path / "t")
    dv_files = [p for p in (tmp_path / "t").glob("deletion_vector_*.bin")]
    assert dv_files, "delete_where should have written a DV file"
    # live DV file survives vacuum
    t.vacuum(retention_ms=0)
    assert all(p.exists() for p in dv_files)
    assert DeltaTable(tmp_path / "t").read(spark).count() == 77
    # OPTIMIZE resolves the DV; now the .bin is unreferenced -> reclaimed
    w.optimize_small_files(spark, small_bytes=1 << 30, timestamp_ms=4_000)
    t2 = DeltaTable(tmp_path / "t")
    res = t2.vacuum(retention_ms=0)
    assert any(str(p.resolve()) in res["deleted"] for p in dv_files)
    assert DeltaTable(tmp_path / "t").read(spark).count() == 77


# ---------------------------------------------------------------------------
# Metadata-only aggregates (count/bounds without opening data files)


def test_iceberg_metadata_count_exact_and_fallback(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(100), timestamp_ms=1_000)
    w.append(o.offset(100).limit(50), timestamp_ms=2_000)
    t = IcebergTable(tmp_path / "t")
    assert t.metadata_count() == 150 == t.read(spark).count()
    # positional deletes subtract exactly
    victim = t.files_for_snapshot(t.current_snapshot_id())[0]
    w.delete_positions([(victim, 0), (victim, 1)], timestamp_ms=3_000)
    t = IcebergTable(tmp_path / "t")
    assert t.metadata_count() == 148 == t.read(spark).count()
    # equality deletes kill an UNKNOWN number of rows -> scan fallback
    w.delete_equality([{"o_orderkey": -1}], ["o_orderkey"], timestamp_ms=4_000)
    t = IcebergTable(tmp_path / "t")
    assert t.metadata_count() is None


def test_iceberg_metadata_bounds(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.limit(100), timestamp_ms=1_000)
    w.append(o.offset(100).limit(100), timestamp_ms=2_000)
    t = IcebergTable(tmp_path / "t")
    got = t.metadata_bounds("o_orderkey")
    real = t.read(spark).agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    assert got == (real[0], real[1])
    # any live delete makes bounds inexact -> None
    victim = t.files_for_snapshot(t.current_snapshot_id())[0]
    w.delete_positions([(victim, 0)], timestamp_ms=3_000)
    assert IcebergTable(tmp_path / "t").metadata_bounds("o_orderkey") is None


def test_delta_metadata_count_dv_and_checkpoint(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t", checkpoint_interval=None)
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.limit(100), timestamp_ms=1_000)
    w.append(o.offset(100).limit(100), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    assert t.metadata_count() == 200 == t.read(spark).count()
    # DV delete: descriptor cardinality subtracts exactly
    keys = [r.o_orderkey for r in o.limit(5).collect()]
    w.delete_where(spark, f"o_orderkey in ({','.join(map(str, keys))})", timestamp_ms=3_000)
    t = DeltaTable(tmp_path / "t")
    assert t.metadata_count() == 195 == t.read(spark).count()
    # stats survive checkpoint + log cleaning
    w.checkpoint()
    w.clean_log(before_version=t.current_version())
    t2 = DeltaTable(tmp_path / "t")
    assert t2.metadata_count() == 195 == t2.read(spark).count()


def test_delta_metadata_count_statless_fallback(spark, tmp_path, orders):
    import json as _json

    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(orders.select("o_orderkey").limit(10), timestamp_ms=1_000)
    # strip the stats a statless writer wouldn't have produced
    log = next((tmp_path / "t" / "_delta_log").glob("*.json"))
    lines = []
    for line in log.read_text().splitlines():
        a = _json.loads(line)
        if "add" in a:
            a["add"].pop("stats", None)
        lines.append(_json.dumps(a))
    log.write_text("\n".join(lines) + "\n")
    t = DeltaTable(tmp_path / "t")
    assert t.metadata_count() is None  # honest fallback, no guess
    assert t.read(spark).count() == 10  # reads unaffected


# ---------------------------------------------------------------------------
# Iceberg orphan files + Hudi cleaner


def test_iceberg_remove_orphans(spark, tmp_path, orders):
    import pyarrow as pa
    import pyarrow.parquet as pq

    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    w.append(orders.select("o_orderkey").limit(20), timestamp_ms=1_000)
    t = IcebergTable(tmp_path / "t")
    live = set(t.files_for_snapshot(t.current_snapshot_id()))
    # a crashed writer's staged file: on disk, referenced by nothing
    orphan = tmp_path / "t" / "data" / "stray-uncommitted.parquet"
    pq.write_table(pa.table({"o_orderkey": [1, 2]}), orphan)
    # too young under the default 3-day grace -> kept
    res = t.remove_orphan_files()
    assert res["deleted"] == [] and str(orphan) in res["kept_recent"]
    # explicit future cutoff: dry run reports, real run reclaims
    future = 10**15 * 10
    res = t.remove_orphan_files(older_than_ms=future, dry_run=True)
    assert res["deleted"] == [str(orphan)] and orphan.exists()
    res = t.remove_orphan_files(older_than_ms=future)
    assert res["deleted"] == [str(orphan)] and not orphan.exists()
    # every referenced file untouched (incl. historical snapshots)
    assert all(__import__("pathlib").Path(p).exists() for p in live)
    assert t.read(spark).count() == 20


def test_hudi_clean_keeps_retained_window(spark, tmp_path, orders):
    from cdf_spark.sources.hudi import HudiFixtureWriter, HudiTable

    w = HudiFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    i1 = w.commit(o.limit(10))
    t = HudiTable(tmp_path / "t")
    fid = t._written_files(i1)[0][0]
    i2 = w.commit(o.offset(10).limit(10), file_id=fid)  # rewrites the group
    i3 = w.commit(o.offset(20).limit(10), file_id=fid)  # rewrites again
    t = HudiTable(tmp_path / "t")
    all_files = [str(tmp_path / "t" / p) for i in t.instants() for _f, _i, p, _pt in t._written_files(i)]
    assert len(all_files) == 3
    # retain last 2 commits: i1's superseded slice is reclaimable
    res = t.clean(retain_commits=2, dry_run=True)
    assert len(res["deleted"]) == 1 and res["earliest_retained"] == i2
    assert __import__("pathlib").Path(res["deleted"][0]).exists()
    res = t.clean(retain_commits=2)
    old_slice = res["deleted"][0]
    assert not __import__("pathlib").Path(old_slice).exists()
    # retained instants still read correctly
    t2 = HudiTable(tmp_path / "t")
    assert t2.read(spark).count() == 10
    assert sorted(r.o_orderkey for r in t2.read(spark).collect()) == sorted(
        r.o_orderkey for r in o.offset(20).limit(10).collect()
    )
    # cleaner history landed on the timeline
    cleans = list((tmp_path / "t" / ".hoodie").glob("*.clean"))
    assert len(cleans) == 1
    # and the timeline's commit instants are unaffected
    assert t2.instants() == [i1, i2, i3]


def test_iceberg_rewrite_sorted_enables_pruning(spark, tmp_path, orders):
    """Ingest-order files each span the whole key range (no pruning);
    after the sort-clustered rewrite a point query prunes to 1 file."""
    from cdf_spark.expressions.ast import Binary, Col, Lit

    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    # interleaved appends: every file covers ~the full o_orderkey range
    for i in range(4):
        w.append(o.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == i), timestamp_ms=1_000 + i)
    t = IcebergTable(tmp_path / "t")
    before = _rows(t.read(spark))
    # a MID-RANGE key sits inside every ingest-order file's bounds
    probe = [Binary("eq", Col("o_orderkey"), Lit(int(before[len(before) // 2][0])))]
    kept0, _ = t.data_files_pruned(t.current_snapshot_id(), probe)
    assert len(kept0) == 4  # ingest order: nothing prunable
    res = w.rewrite_sorted(spark, by=["o_orderkey"], target_files=4)
    assert res["files_after"] == 4
    after = IcebergTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before  # content identical
    kept1, ev = after.data_files_pruned(after.current_snapshot_id(), probe)
    assert len(kept1) == 1, ev  # clustered: point query -> one file


def test_iceberg_zorder_prunes_on_both_columns(spark, tmp_path):
    """Bit-interleaved z-order: after the rewrite, point-range probes
    on EITHER cluster column prune files — the property lexicographic
    sort only gives the leading column."""
    from cdf_spark.expressions.ast import Binary, Col, Lit

    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    # two independent uniform keys; ingest order correlates with neither
    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000, (i * 104729) % 1000, float(i)) for i in range(4000)],
        ["rid", "x", "y", "v"],
    )
    for j in range(4):
        w.append(df.filter(f"rid % 4 = {j}"), timestamp_ms=1_000 + j)
    t = IcebergTable(tmp_path / "t")
    before = _rows(t.read(spark))
    probe_x = [Binary("ge", Col("x"), Lit(100)), Binary("le", Col("x"), Lit(160))]
    probe_y = [Binary("ge", Col("y"), Lit(500)), Binary("le", Col("y"), Lit(560))]
    nfiles0 = len(t.files_for_snapshot(t.current_snapshot_id()))
    kx0, _ = t.data_files_pruned(t.current_snapshot_id(), probe_x)
    ky0, _ = t.data_files_pruned(t.current_snapshot_id(), probe_y)
    assert len(kx0) == nfiles0 and len(ky0) == nfiles0  # ingest order: no pruning
    res = w.rewrite_zorder(spark, by=["x", "y"], target_files=16)
    assert res["files_after"] == 16
    after = IcebergTable(tmp_path / "t")
    assert _rows(after.read(spark)) == before  # content identical
    kx1, evx = after.data_files_pruned(after.current_snapshot_id(), probe_x)
    ky1, evy = after.data_files_pruned(after.current_snapshot_id(), probe_y)
    assert len(kx1) < 16, evx  # prunes on x ...
    assert len(ky1) < 16, evy  # ... AND on y
    # lexicographic sort on (x, y) for contrast: y probes cannot prune
    w2 = IcebergFixtureWriter(tmp_path / "lex", seed=3)
    for j in range(4):
        w2.append(df.filter(f"rid % 4 = {j}"), timestamp_ms=1_000 + j)
    w2.rewrite_sorted(spark, by=["x", "y"], target_files=16)
    tlex = IcebergTable(tmp_path / "lex")
    klx, _ = tlex.data_files_pruned(tlex.current_snapshot_id(), probe_x)
    kly, _ = tlex.data_files_pruned(tlex.current_snapshot_id(), probe_y)
    assert len(klx) < 16  # leading column prunes
    assert len(kly) == 16  # trailing column cannot


# ---------------------------------------------------------------------------
# Delta data skipping (file-level min/max stats)


def test_delta_data_skipping_prunes_by_stats(spark, tmp_path, orders):
    """Range-clustered appends: a key-range predicate prunes whole
    files from the add-action stats BEFORE the read, with the pruning
    evidence on the plan; results equal the unpruned filter."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice").filter("o_orderkey > 0")
    for lo, hi, ts in ((0, 200, 1000), (200, 400, 2000), (400, 600, 3000), (600, 800, 4000)):
        w.append(
            o.filter((F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)).coalesce(1),
            timestamp_ms=ts,
        )
    t = DeltaTable(tmp_path / "t")
    req = ScanRequest(
        "d", projection=None, predicates=[(Col("o_orderkey") > Lit(250)) & (Col("o_orderkey") <= Lit(350))]
    )
    df, plan = t.scan(spark, req)
    meta = plan.partitions.meta
    assert meta["files_pruned_by_stats"] >= 3, meta
    want = o.filter("o_orderkey > 250 AND o_orderkey <= 350").count()
    assert df.count() == want
    # stats survive checkpoint + log cleaning
    w.checkpoint()
    w.clean_log(before_version=t.current_version())
    t2 = DeltaTable(tmp_path / "t")
    df2, plan2 = t2.scan(spark, req)
    assert plan2.partitions.meta["files_pruned_by_stats"] >= 3
    assert df2.count() == want


def test_delta_data_skipping_with_dv_and_statless(spark, tmp_path, orders):
    """A deletion vector only shrinks a file's true range — recorded
    bounds stay safe; a statless add is never pruned."""
    import json as _json

    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.filter("o_orderkey <= 300").coalesce(1), timestamp_ms=1000)
    w.append(o.filter("o_orderkey > 300 AND o_orderkey <= 600").coalesce(1), timestamp_ms=2000)
    w.delete_where(spark, "o_orderkey <= 50", timestamp_ms=3000)
    t = DeltaTable(tmp_path / "t")
    req = ScanRequest("d", projection=None, predicates=[Col("o_orderkey") <= Lit(200)])
    df, plan = t.scan(spark, req)
    assert plan.partitions.meta["files_pruned_by_stats"] == 1  # second file
    assert df.count() == 150  # 51..200 (DV killed 1..50)
    # strip stats from one add: that file must now always be kept
    for p in sorted((tmp_path / "t" / "_delta_log").glob("*.json")):
        lines = []
        for line in p.read_text().splitlines():
            a = _json.loads(line)
            if "add" in a:
                a["add"].pop("stats", None)
            lines.append(_json.dumps(a))
        p.write_text("\n".join(lines) + "\n")
    t3 = DeltaTable(tmp_path / "t")
    df3, plan3 = t3.scan(spark, req)
    assert plan3.partitions.meta["files_pruned_by_stats"] == 0
    assert df3.count() == 150


def test_delta_optimize_zorder_skips_on_both_columns(spark, tmp_path):
    """OPTIMIZE ZORDER + data skipping: after the clustered rewrite,
    the negotiated scan prunes files on EITHER cluster column's range
    probe; content identical; incremental consumers not invalidated."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.positions import TableSnapshotPosition

    w = DeltaFixtureWriter(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, (i * 7919) % 1000, (i * 104729) % 1000, float(i)) for i in range(4000)],
        ["rid", "x", "y", "v"],
    )
    for j in range(4):
        w.append(df.filter(f"rid % 4 = {j}").coalesce(1), timestamp_ms=1_000 + j)
    t = DeltaTable(tmp_path / "t")
    before = _rows(t.read(spark))
    pin = t.current_version()
    res = w.optimize_zorder(spark, by=["x", "y"], target_files=16)
    assert res["files_after"] == 16
    t2 = DeltaTable(tmp_path / "t")
    assert _rows(t2.read(spark)) == before
    for col in ("x", "y"):
        req = ScanRequest(
            "z", projection=None,
            predicates=[(Col(col) >= Lit(100)) & (Col(col) <= Lit(160))],
        )
        sdf, plan = t2.scan(spark, req)
        meta = plan.partitions.meta
        assert meta["files_pruned_by_stats"] > 0, (col, meta)
        assert sdf.count() == df.filter(f"{col} >= 100 AND {col} <= 160").count()
    # dataChange=false: a pinned consumer sees no new data
    changed, _ = t2.changes_since(spark, TableSnapshotPosition(snapshot_id=pin))
    assert changed is None or changed.count() == 0


def test_delta_optimize_zorder_refuses_partitioned(spark, tmp_path):
    from cdf_spark.sources.delta import DeltaError

    w = DeltaFixtureWriter(tmp_path / "t", partition_by=["b"])
    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["id", "b", "v"])
    w.append(df, timestamp_ms=1_000)
    with pytest.raises(DeltaError):
        w.optimize_zorder(spark, by=["id"])


# ---------------------------------------------------------------------------
# Partitioned Delta DV merge (the last Delta merge carve-out)


def test_delta_partitioned_dv_merge_no_rewrite(spark, tmp_path, orders):
    """MERGE into a PARTITIONED Delta table is now merge-on-read:
    base files stay live with DVs attached (no rewrite), the batch
    partition-splits, partition pruning still works, and the merge
    key can include the partition column."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w = DeltaFixtureWriter(tmp_path / "t", partition_by=["o_orderstatus"])
    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.filter("o_orderkey <= 600"), timestamp_ms=1_000)
    t0 = DeltaTable(tmp_path / "t")
    base_files = set(t0.files_for_version(t0.current_version()))
    # batch: restate keys <= 100 with price -1, plus new keys 600-700
    import shutil
    import tempfile

    batch = (
        o.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0))
        .unionByName(o.filter("o_orderkey > 600 AND o_orderkey <= 700"))
    )
    seg = tempfile.mkdtemp()
    batch.coalesce(1).write.mode("overwrite").parquet(seg)
    segs = sorted(str(p) for p in __import__("pathlib").Path(seg).glob("*.parquet"))
    w.upsert_files_dv(spark, segs, ["o_orderkey"], timestamp_ms=2_000)
    shutil.rmtree(seg, ignore_errors=True)
    t1 = DeltaTable(tmp_path / "t")
    live = t1.live_adds(t1.current_version())
    live_paths = {p for p, _dv, _pv in live}
    assert base_files <= live_paths  # merge-on-read: no base rewrite
    assert any(dv for _p, dv, _pv in live)  # DVs attached
    # every live add still carries its partitionValues
    assert all(pv.get("o_orderstatus") is not None for _p, _dv, pv in live)
    got = t1.read(spark)
    assert got.count() == 700
    assert got.filter("o_orderkey <= 100 AND o_totalprice != -1.0").count() == 0
    # partition pruning intact across the merge
    req = ScanRequest("d", projection=None, predicates=[Col("o_orderstatus") == Lit("F")])
    _df, plan = t1.scan(spark, req)
    assert plan.partitions.meta["files_pruned_by_partition"] > 0
    # merge key CAN include the partition column (basePath read
    # reconstitutes it for the victim match)
    batch2 = o.filter("o_orderkey <= 10").withColumn("o_totalprice", F.lit(-2.0))
    seg2 = tempfile.mkdtemp()
    batch2.coalesce(1).write.mode("overwrite").parquet(seg2)
    segs2 = sorted(str(p) for p in __import__("pathlib").Path(seg2).glob("*.parquet"))
    w.upsert_files_dv(spark, segs2, ["o_orderkey", "o_orderstatus"], timestamp_ms=3_000)
    shutil.rmtree(seg2, ignore_errors=True)
    t2 = DeltaTable(tmp_path / "t")
    got2 = t2.read(spark)
    assert got2.count() == 700
    assert got2.filter("o_orderkey <= 10").agg(F.max("o_totalprice")).first()[0] == -2.0


# ---------------------------------------------------------------------------
# Bad-commit recovery: Iceberg ROLLBACK + Delta RESTORE


def test_iceberg_rollback_and_continue(spark, tmp_path, orders):
    """rollback_to an ancestor: reads serve the ancestor, the bad
    snapshot stays inspectable until expire, and the NEXT commit
    parents on the rolled-back-to snapshot (not the abandoned tip) —
    so history walks clean and expire reclaims the dead branch."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.filter("o_orderkey <= 100"), timestamp_ms=1_000)
    t = IcebergTable(tmp_path / "t")
    good = t.current_snapshot_id()
    w.append(o.filter("o_orderkey > 100 AND o_orderkey <= 200"), timestamp_ms=2_000)  # "bad"
    t = IcebergTable(tmp_path / "t")
    bad = t.current_snapshot_id()
    t.rollback_to(good)
    t2 = IcebergTable(tmp_path / "t")
    assert t2.current_snapshot_id() == good
    assert t2.read(spark).count() == 100
    # the bad snapshot is still inspectable (time travel by id)
    assert t2.read(spark, snapshot_id=bad).count() == 200
    # non-ancestor rollback refused
    with pytest.raises(Exception):
        t2.rollback_to(123456789)
    # a FRESH writer continues from the rolled-back-to snapshot
    w2 = IcebergFixtureWriter(tmp_path / "t")
    w2.append(o.filter("o_orderkey > 200 AND o_orderkey <= 250"), timestamp_ms=3_000)
    t3 = IcebergTable(tmp_path / "t")
    assert t3.read(spark).count() == 150  # 100 + 50, bad 100 gone
    chain = [int(s["snapshot-id"]) for s in t3.ancestry()]
    assert good in chain and bad not in chain
    # expire reclaims the abandoned branch
    res = t3.expire_snapshots(keep_last=10, delete_orphans=True)
    assert bad in res["expired"]
    assert IcebergTable(tmp_path / "t").read(spark).count() == 150


def test_delta_restore_roundtrip(spark, tmp_path, orders):
    """RESTORE to an earlier version: one commit, bit-faithful
    including DV state; undone versions stay time-travelable; restore
    to a vacuumed version fails loudly."""
    from cdf_spark.sources.delta import DeltaError

    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w.append(o.filter("o_orderkey <= 100"), timestamp_ms=1_000)  # v0
    keys = [r.o_orderkey for r in o.limit(3).collect()]
    w.delete_where(spark, f"o_orderkey in ({','.join(map(str, keys))})", timestamp_ms=2_000)  # v1 (DV)
    t = DeltaTable(tmp_path / "t")
    v1_rows = _rows(t.read(spark))
    assert len(v1_rows) == 97
    w.overwrite(o.filter("o_orderkey > 100 AND o_orderkey <= 300"), timestamp_ms=3_000)  # v2 "bad"
    assert DeltaTable(tmp_path / "t").read(spark).count() == 200
    w.restore(1, timestamp_ms=4_000)  # back to the DV'd state
    t2 = DeltaTable(tmp_path / "t")
    assert _rows(t2.read(spark)) == v1_rows  # DV state restored exactly
    assert t2.metadata_count() == 97
    # the undone v2 still time-travels
    assert t2.read(spark, version=2).count() == 200
    # no-op restore refused
    with pytest.raises(DeltaError):
        w.restore(t2.current_version())
    # vacuum the v2 files, then restoring to v2 fails loudly
    t2.vacuum(retention_ms=0)
    with pytest.raises(DeltaError):
        w.restore(2)


def test_hudi_mor_clean_after_compaction(spark, tmp_path):
    """MoR cleaner: compaction supersedes the old base + its logs;
    clean reclaims them beyond retention while the snapshot (and the
    auto-maintenance route for a deltacommit timeline) stays correct."""
    from cdf_spark.package.maintenance import MaintenancePolicy, plan_maintenance, run_maintenance
    from cdf_spark.sources.hudi_mor import HudiMorFixtureWriter, HudiMorTable

    df = spark.range(1, 41).select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", n_buckets=2)
    w.insert(df)
    w.upsert(spark.createDataFrame([(1, -1.0), (2, -2.0)], ["k", "v"]))
    w.upsert(spark.createDataFrame([(3, -3.0)], ["k", "v"]))
    w.compact(spark)
    w.upsert(spark.createDataFrame([(4, -4.0)], ["k", "v"]))
    t = HudiMorTable(tmp_path / "t")
    before = _rows(t.read(spark))
    files_on_disk = [p for p in (tmp_path / "t").rglob("*") if p.is_file() and ".hoodie" not in p.parts]
    # retain last 2 instants: pre-compaction bases + their logs reclaim
    res = t.clean(retain_commits=2, dry_run=True)
    assert len(res["deleted"]) >= 2
    # the auto-maintenance router recognizes the MoR timeline
    pol = MaintenancePolicy(hudi_retain_commits=2)
    plan = plan_maintenance(tmp_path / "t", pol)
    assert [a.action for a in plan] == ["clean"]
    out = run_maintenance(spark, tmp_path / "t", pol)
    assert len(out["results"]["clean"]["deleted"]) >= 2
    for p in out["results"]["clean"]["deleted"]:
        assert not __import__("pathlib").Path(p).exists()
    t2 = HudiMorTable(tmp_path / "t")
    assert _rows(t2.read(spark)) == before  # snapshot unchanged
    assert plan_maintenance(tmp_path / "t", pol) == []  # converged
    cleans = list((tmp_path / "t" / ".hoodie").glob("*.clean"))
    assert len(cleans) == 1


def test_binpack_trims_positional_deletes_metadata_count(spark, tmp_path, orders):
    """Regression (found by self-review): bin-pack used to re-list
    positional-delete entries whose rows were already RESOLVED into
    the merged files — reads ignored the dangling rows but
    metadata_count subtracted them a second time. Delete files fully
    covering rewritten paths drop; mixed files trim to their
    surviving rows; metadata_count equals the scan before and after."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=3)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(50), timestamp_ms=1_000)
    w.append(o.offset(50).limit(50), timestamp_ms=2_000)
    w.append(o.offset(100).limit(150), timestamp_ms=2_500)  # big survivor
    t = IcebergTable(tmp_path / "t")
    import pathlib

    files = sorted(
        t.files_for_snapshot(t.current_snapshot_id()),
        key=lambda p: pathlib.Path(p).stat().st_size,
    )
    # a delete file touching two small files AND the survivor
    w.delete_positions(
        [(files[0], 0), (files[0], 1), (files[1], 0), (files[-1], 0)], timestamp_ms=3_000
    )
    t = IcebergTable(tmp_path / "t")
    assert t.metadata_count() == 246 == t.read(spark).count()
    cut = pathlib.Path(files[-1]).stat().st_size
    res = w.rewrite_small_files(spark, small_bytes=cut)
    assert res["rewritten"] == 2
    t2 = IcebergTable(tmp_path / "t")
    assert t2.read(spark).count() == 246
    assert t2.metadata_count() == 246  # no double subtraction
    # exactly one trimmed delete entry survives (the survivor's row)
    dels = t2.delete_files_for_snapshot(t2.current_snapshot_id())
    assert len(dels) == 1
    import pyarrow.parquet as pq

    assert pq.read_metadata(dels[0]).num_rows == 1


def test_delta_reorg_purge_drops_dvs(spark, tmp_path, orders):
    """REORG PURGE: only DV-carrying files rewrite (surviving rows
    materialized, DVs gone), clean files untouched, dataChange=false
    so incremental consumers keep their position, metadata_count
    arithmetic stays exact, and vacuum then reclaims the orphaned
    DV bins."""
    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(o.filter("o_orderkey <= 100"), timestamp_ms=1_000)
    w.append(o.filter("o_orderkey > 100 AND o_orderkey <= 200"), timestamp_ms=2_000)
    w.delete_where(spark, "o_orderkey <= 10", timestamp_ms=3_000)  # DVs file(s) of batch 1
    t0 = DeltaTable(tmp_path / "t")
    before_rows = {tuple(r) for r in t0.read(spark).collect()}
    clean_before = {p for p, dv, _pv in t0.live_adds(t0.current_version()) if dv is None}
    dv_before = [p for p, dv, _pv in t0.live_adds(t0.current_version()) if dv is not None]
    assert dv_before
    # incremental consumer position before the purge
    _df, pos = t0.changes_since(spark, None)

    res = w.reorg_purge(spark, timestamp_ms=4_000)
    assert res["rewritten"] == len(dv_before) and res["dv_files"] == len(dv_before)
    t1 = DeltaTable(tmp_path / "t")
    adds = t1.live_adds(t1.current_version())
    assert all(dv is None for _p, dv, _pv in adds)  # no DVs anywhere
    assert clean_before <= {p for p, _dv, _pv in adds}  # untouched files stay
    assert {tuple(r) for r in t1.read(spark).collect()} == before_rows
    assert t1.metadata_count() == len(before_rows)
    # dataChange=false: the consumer sees NO new changes from the purge
    df2, _pos2 = t1.changes_since(spark, pos)
    assert df2 is None or df2.count() == 0
    # orphaned DV bins reclaim
    vac = t1.vacuum(retention_ms=0)
    assert any("deletion_vector" in p for p in vac["deleted"])


def test_bloom_index_autopilot_delta(spark, tmp_path):
    """bloom_index_columns on the policy: the planner flags missing
    sidecars, the runner builds them incrementally, and the plan
    converges — after which point-lookup scans prune by bloom."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.package.maintenance import (
        MaintenancePolicy,
        plan_maintenance,
        run_maintenance,
    )
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    w = DeltaFixtureWriter(tmp_path / "t")
    ks = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    w.append(ks.filter("k % 2 = 1").coalesce(1), timestamp_ms=1_000)
    w.append(ks.filter("k % 2 = 0").coalesce(1), timestamp_ms=2_000)
    # min_small_files high keeps bin-packing out of the plan so the
    # bloom action is exercised in isolation
    pol = MaintenancePolicy(bloom_index_columns=("k",), min_small_files=99)
    plan = plan_maintenance(tmp_path / "t", pol)
    assert "build_bloom_index" in [a.action for a in plan]
    out = run_maintenance(spark, tmp_path / "t", pol)
    assert out["results"]["build_bloom_index"]["k"]["built"] == 2
    # converged: nothing more to index
    assert "build_bloom_index" not in [
        a.action for a in plan_maintenance(tmp_path / "t", pol)
    ]
    # a new commit makes exactly one new file due
    w.append(spark.createDataFrame([(1000, -1.0)], ["k", "v"]).coalesce(1), timestamp_ms=3_000)
    out2 = run_maintenance(spark, tmp_path / "t", pol)
    assert out2["results"]["build_bloom_index"]["k"]["built"] == 1
    df, plan2 = DeltaTable(tmp_path / "t").scan(
        spark, ScanRequest("t", predicates=[Col("k") == Lit(7)])
    )
    meta = plan2.partitions.meta
    # even file by bloom; the (1000) file by stats; odd file kept
    assert meta["files_pruned_by_bloom"] == 1 and meta["files_kept"] == 1, meta
    assert df.count() == 1


def test_bloom_index_autopilot_iceberg(spark, tmp_path):
    from cdf_spark.package.maintenance import MaintenancePolicy, plan_maintenance, run_maintenance
    from cdf_spark.sources.iceberg import IcebergFixtureWriter

    w = IcebergFixtureWriter(tmp_path / "t", seed=31)
    ks = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    w.append(ks.filter("k % 2 = 1").coalesce(1), timestamp_ms=1_000, snapshot_id=401)
    w.append(ks.filter("k % 2 = 0").coalesce(1), timestamp_ms=2_000, snapshot_id=402)
    pol = MaintenancePolicy(bloom_index_columns=("k",), min_small_files=99)
    assert "build_bloom_index" in [a.action for a in plan_maintenance(tmp_path / "t", pol)]
    out = run_maintenance(spark, tmp_path / "t", pol)
    assert out["results"]["build_bloom_index"]["k"]["built"] == 2
    assert "build_bloom_index" not in [
        a.action for a in plan_maintenance(tmp_path / "t", pol)
    ]


def test_uniform_root_maintenance_is_delta_side(spark, tmp_path, orders):
    """A UniForm root (Delta table carrying Iceberg metadata/ inside
    the same dir) satisfies BOTH layout probes — maintenance must
    dispatch DELTA-side: Iceberg expire_snapshots on a Delta-owned
    root deletes files retained Delta versions still reference,
    breaking time travel ahead of Delta's own vacuum retention (real
    UniForm forbids Iceberg-side maintenance for this reason)."""
    from cdf_spark.package.maintenance import (
        MaintenancePolicy,
        plan_maintenance,
        run_maintenance,
    )
    from cdf_spark.package.xtable import sync_delta_to_iceberg
    from cdf_spark.sources.delta import is_delta_layout
    from cdf_spark.sources.iceberg import is_iceberg_layout

    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    root = tmp_path / "t"
    w = DeltaFixtureWriter(root)
    v0_rows = o.filter("o_orderkey <= 100")
    w.append(v0_rows.coalesce(1), timestamp_ms=1_000)
    v0_files = set((root / "data").glob("*.parquet"))
    w.overwrite(
        o.filter("o_orderkey > 100 and o_orderkey <= 200").coalesce(1),
        timestamp_ms=2_000,
    )
    sync_delta_to_iceberg(root, root)
    assert is_delta_layout(root) and is_iceberg_layout(root)
    # max_snapshots=1 makes Iceberg expire_snapshots due if (wrongly)
    # dispatched; huge retention keeps Delta vacuum conservative
    pol = MaintenancePolicy(max_snapshots=1, retention_ms=10**15)
    plan = plan_maintenance(root, pol)
    assert not any(
        a.action in ("expire_snapshots", "remove_orphan_files") for a in plan
    ), [a.action for a in plan]
    run_maintenance(spark, root, pol)
    # the superseded v0 data file survives: Delta vacuum respects the
    # retention window; Iceberg-side expire (the wrong dispatch) would
    # have deleted it from under retained Delta versions
    for f in v0_files:
        assert f.exists(), f
