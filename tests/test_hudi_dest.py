"""HudiDestination — copy-on-write table destination on the
commit/verify protocol.

Pinned: append/upsert correctness through an external HudiTable read,
O(touched groups) write amplification (untouched groups keep their
old instant), routing of updates to the group that holds their key,
delete-then-reinsert across chained merges, the no-driver-row-data
discipline (collect is allowed only for O(groups) file-id lists —
falsified by a row-collect guard on the data frames), instant-sequence
resume across destination instances, the merge-into-empty insert
path, partitioned-merge/REPLACE refusals, and the declarative TOML
kind."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.package import PackageBuilder
from cdf_spark.package.hudi_dest import HudiDestination
from cdf_spark.sources.base import WriteDisposition
from cdf_spark.sources.hudi import HudiTable


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _commit(spark, dest, builder, df, disposition):
    pkg = builder.build(admitted=df)
    rec = dest.verify(spark, dest.commit(spark, pkg, disposition), pkg)
    assert rec.verified
    return rec


def test_hudi_upsert_roundtrip_and_untouched_groups(spark, tmp_path, orders):
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey > 900 and o_orderkey <= 1200"),
        WriteDisposition.APPEND,
    )
    t = HudiTable(tmp_path / "t")
    pre = {fid: path for fid, _p, path in t.live_file_groups()}
    batch = orders.filter("o_orderkey <= 400").withColumn("o_totalprice", F.lit(-1.0))
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)

    got = dest.read(spark)
    n_12 = orders.filter("o_orderkey <= 1200").count()
    assert got.count() == n_12
    assert got.filter("o_totalprice = -1.0").count() == orders.filter(
        "o_orderkey <= 400"
    ).count()
    # the group holding 900..1200 was untouched by the merge: its live
    # file is byte-identical (same path, same instant suffix)
    post = {fid: path for fid, _p, path in HudiTable(tmp_path / "t").live_file_groups()}
    untouched = [fid for fid in pre if pre[fid] == post.get(fid)]
    assert untouched, (pre, post)
    rewritten = [fid for fid in pre if fid in post and pre[fid] != post[fid]]
    assert rewritten  # exactly the group holding keys <= 400


def test_hudi_upsert_delete_then_reinsert(spark, tmp_path, orders):
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 300"), WriteDisposition.APPEND)
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0)),
        WriteDisposition.MERGE,
    )
    # second merge's victims live in the FIRST merge's rewritten group
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-2.0)),
        WriteDisposition.MERGE,
    )
    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey <= 300").count()
    assert got.filter("o_totalprice = -1.0").count() == 0
    assert (
        got.filter("o_totalprice = -2.0").count()
        == orders.filter("o_orderkey <= 100").count()
    )


def test_hudi_merge_into_empty_table_is_insert(spark, tmp_path, orders):
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 100"), WriteDisposition.MERGE)
    assert dest.read(spark).count() == orders.filter("o_orderkey <= 100").count()


def test_hudi_instant_sequence_resumes_across_instances(spark, tmp_path, orders):
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    d1 = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    _commit(spark, d1, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    # a FRESH destination instance must continue the timeline, not
    # restart it (a restarted sequence would collide or sort before
    # the existing instant and silently supersede nothing)
    d2 = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    _commit(spark, d2, b, orders.filter("o_orderkey > 500"), WriteDisposition.APPEND)
    t = HudiTable(tmp_path / "t")
    assert len(t.instants()) == 2
    assert t.instants() == sorted(t.instants())
    assert d2.read(spark).count() == orders.count()


def test_hudi_refusals(spark, tmp_path, orders):
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    pkg = b.build(admitted=orders.filter("o_orderkey <= 100"))
    nokeys = HudiDestination(tmp_path / "t3")
    with pytest.raises(ValueError, match="merge_keys"):
        nokeys.commit(spark, pkg, WriteDisposition.MERGE)


def test_hudi_replace_commit(spark, tmp_path, orders):
    """REPLACE = INSERT_OVERWRITE_TABLE via `.replacecommit`: the new
    state is exactly the batch, replaced groups go dark WITHOUT any
    file being deleted (time travel to pre-replace instants still
    resolves), a later MERGE operates on the new groups, and
    incremental consumption across the replace resets to a full
    re-read."""
    from cdf_spark.positions import TableSnapshotPosition

    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
    rep = orders.filter("o_orderkey > 500 and o_orderkey <= 700").withColumn(
        "o_totalprice", F.lit(-9.0)
    )
    _commit(spark, dest, b, rep, WriteDisposition.REPLACE)
    t = HudiTable(tmp_path / "t")
    got = t.read(spark)
    assert got.count() == rep.count()
    assert got.filter("o_totalprice != -9.0").count() == 0
    # time travel to the pre-replace instant sees the old state
    first = t.instants()[0]
    assert t.read(spark, instant=first).count() == orders.filter(
        "o_orderkey <= 900"
    ).count()
    # merge after replace upserts into the NEW groups
    m = orders.filter("o_orderkey > 500 and o_orderkey <= 550").withColumn(
        "o_totalprice", F.lit(-5.0)
    )
    _commit(spark, dest, b, m, WriteDisposition.MERGE)
    got3 = dest.read(spark)
    assert got3.count() == rep.count()
    assert got3.filter("o_totalprice = -5.0").count() == m.count()
    # incremental consumption across the replace resets to full read
    df, _pos = t.changes_since(spark, TableSnapshotPosition(snapshot_id=int(first)))
    assert df.count() == got3.count()


def test_hudi_partitioned_merge(spark, tmp_path):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    dest = HudiDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], partition_by=["o_orderstatus"]
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, o.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
    batch = o.filter("o_orderkey <= 300 or o_orderkey > 900").withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    got = dest.read(spark)
    assert got.count() == o.count()
    assert got.filter("o_totalprice = -1.0").count() == batch.count()
    # hive layout intact: every live file sits under its partition dir
    t = HudiTable(tmp_path / "t")
    for fid, part, path in t.live_file_groups():
        assert part and f"/{part}/" in path, (fid, part, path)
    # a partition-column change on an existing key refuses (a partition
    # move is delete+insert, not an upsert)
    mv = o.filter("o_orderkey <= 10").withColumn("o_orderstatus", F.lit("Z"))
    pkg = b.build(admitted=mv)
    with pytest.raises(ValueError, match="partition column"):
        dest.commit(spark, pkg, WriteDisposition.MERGE)


def test_hudi_declarative_kind(tmp_path):
    from cdf_spark.declarative import _build_destination

    dest = _build_destination(
        {"kind": "hudi", "path": str(tmp_path / "t")}, tmp_path, "r1", ["k"]
    )
    assert isinstance(dest, HudiDestination)
    assert dest.merge_keys == ["k"]


def test_streaming_drain_into_hudi(spark, tmp_path, orders):
    """A Structured-Streaming drain lands in the Hudi table through
    the same commit/verify protocol as the batch path: every
    micro-batch becomes one timeline instant, epoch history IS table
    history (as-of reads at any epoch boundary), and receipts verify
    per epoch — the destination-trio symmetry (Iceberg and Delta have
    the same test shape)."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import types as T

    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.streaming.pipeline import StreamingLoadPipeline

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    o = orders.select("o_orderkey", "o_totalprice").limit(600)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        stage = tempfile.mkdtemp()
        o.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (f,) = Path(stage).glob("*.parquet")
        shutil.move(str(f), str(src / f"part-{i}.parquet"))

    pipe = StreamingLoadPipeline(
        descriptor=ResourceDescriptor(resource_id="orders_stream"),
        source_path=str(src),
        schema=schema,
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        destination=HudiDestination(tmp_path / "t"),
        disposition=WriteDisposition.APPEND,
        reader_options={"maxFilesPerTrigger": 1},
    )
    epochs = pipe.run(spark)
    committed = [e for e in epochs if e.rows_admitted > 0]
    assert len(committed) >= 2
    assert all(e.receipt_verified for e in committed)

    t = HudiTable(tmp_path / "t")
    assert len(t.instants()) == len(committed)  # one instant per epoch
    assert t.read(spark).count() == o.count()
    # as-of the first instant sees only epoch 1's rows
    first = t.instants()[0]
    assert t.read(spark, instant=first).count() == committed[0].rows_admitted


def test_merge_routing_pruned_by_footer_stats(spark, tmp_path, orders):
    """r10: the key->group routing scan must not open groups whose
    parquet footer min/max on the merge keys cannot overlap the batch
    key range — `_last_routing_scan_paths` records exactly what the
    routing scan was given (Hudi's bloom/column-stats candidate
    pruning, footer edition)."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    # three groups with disjoint key ranges
    for lo, hi in [(0, 400), (400, 800), (800, 1200)]:
        _commit(
            spark, dest, b,
            orders.filter(f"o_orderkey > {lo} and o_orderkey <= {hi}"),
            WriteDisposition.APPEND,
        )
    t = HudiTable(tmp_path / "t")
    live = t.live_file_groups()
    assert len(live) == 3
    # batch touches only the middle range
    batch = orders.filter("o_orderkey > 500 and o_orderkey <= 600").withColumn(
        "o_totalprice", F.lit(-9.0)
    )
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    scanned = dest._last_routing_scan_paths
    assert len(scanned) == 1, scanned  # only the overlapping group opened
    # and the merge is still correct end-to-end
    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey > 0 and o_orderkey <= 1200").count()
    assert got.filter("o_totalprice = -9.0").count() == batch.count()


def test_merge_prune_all_groups_is_pure_insert(spark, tmp_path, orders):
    """A batch whose key range overlaps NO live group commits as pure
    inserts without opening any group."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    pre = {fid: p for fid, _x, p in HudiTable(tmp_path / "t").live_file_groups()}
    batch = orders.filter("o_orderkey > 1400 and o_orderkey <= 1499")
    assert batch.count() > 0
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    assert dest._last_routing_scan_paths == []
    post = {fid: p for fid, _x, p in HudiTable(tmp_path / "t").live_file_groups()}
    for fid in pre:  # old group untouched, new group(s) added
        assert post.get(fid) == pre[fid]
    assert dest.read(spark).count() == orders.filter(
        "o_orderkey <= 500 or (o_orderkey > 1400 and o_orderkey <= 1499)"
    ).count()


# ---------------------------------------------------------------------------
# bloom key-index routing (key_index="bloom")


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["o_orderkey", "o_custkey", "o_totalprice"])


def test_bloom_prunes_overlapping_range_group(spark, tmp_path):
    """Two groups with INTERLEAVED key ranges (stats cannot separate
    them); a batch whose keys live only in group A must route-scan
    only A under the bloom index."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"], key_index="bloom")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    ga = _mk(spark, [(1, 10, 1.0), (100, 10, 1.0)])       # range [1, 100]
    gb = _mk(spark, [(2, 20, 2.0), (101, 20, 2.0)])       # range [2, 101]
    _commit(spark, dest, b, ga, WriteDisposition.APPEND)
    _commit(spark, dest, b, gb, WriteDisposition.APPEND)
    batch = _mk(spark, [(100, 10, -1.0)])  # inside BOTH ranges, only in A
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    scanned = dest._last_routing_scan_paths
    assert len(scanned) == 1, scanned  # stats alone would keep both
    got = {r.o_orderkey: r.o_totalprice for r in dest.read(spark).collect()}
    assert got == {1: 1.0, 100: -1.0, 2: 2.0, 101: 2.0}


def test_bloom_missing_sidecar_is_conservative(spark, tmp_path):
    """Deleting a bloom entry (crash between commit and bloom write,
    or a pre-bloom table) must keep the group — correctness never
    depends on the index."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"], key_index="bloom")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, _mk(spark, [(1, 10, 1.0), (100, 10, 1.0)]), WriteDisposition.APPEND)
    _commit(spark, dest, b, _mk(spark, [(2, 20, 2.0), (101, 20, 2.0)]), WriteDisposition.APPEND)
    for bj in (tmp_path / "t" / ".hoodie" / "bloom").glob("*.json"):
        bj.unlink()
    _commit(spark, dest, b, _mk(spark, [(100, 10, -1.0)]), WriteDisposition.MERGE)
    assert len(dest._last_routing_scan_paths) == 2  # both kept, no bloom
    got = {r.o_orderkey: r.o_totalprice for r in dest.read(spark).collect()}
    assert got == {1: 1.0, 100: -1.0, 2: 2.0, 101: 2.0}


def test_bloom_equals_stats_result(spark, tmp_path, orders):
    """bloom and stats routing must land byte-identical final state
    (the index changes WHICH groups are scanned, never the answer)."""
    outs = {}
    for mode in ("stats", "bloom"):
        dest = HudiDestination(
            tmp_path / f"t_{mode}", merge_keys=["o_orderkey"], key_index=mode
        )
        b = PackageBuilder(tmp_path / f"pkgs_{mode}", "orders")
        _commit(spark, dest, b, orders.filter("o_orderkey <= 600"), WriteDisposition.APPEND)
        _commit(
            spark, dest, b,
            orders.filter("o_orderkey > 600 and o_orderkey <= 1200"),
            WriteDisposition.APPEND,
        )
        batch = orders.filter("o_orderkey % 7 = 0 and o_orderkey <= 1200").withColumn(
            "o_totalprice", F.lit(-3.0)
        )
        _commit(spark, dest, b, batch, WriteDisposition.MERGE)
        outs[mode] = sorted(
            (r.o_orderkey, r.o_custkey, r.o_totalprice)
            for r in dest.read(spark).collect()
        )
    assert outs["stats"] == outs["bloom"]


def test_bloom_updates_follow_rewrite(spark, tmp_path):
    """After a MERGE rewrites a group, the NEW version's bloom must
    reflect inserted keys: a second merge on a key added by the first
    must scan the rewritten group (no false negative ever)."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"], key_index="bloom")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, _mk(spark, [(1, 10, 1.0), (50, 10, 1.0)]), WriteDisposition.APPEND)
    # insert key 30 (opens a new group), update 50
    _commit(spark, dest, b, _mk(spark, [(30, 30, 3.0), (50, 10, -1.0)]), WriteDisposition.MERGE)
    # now update 30 — must route to the group that holds it
    _commit(spark, dest, b, _mk(spark, [(30, 30, -5.0)]), WriteDisposition.MERGE)
    got = {r.o_orderkey: r.o_totalprice for r in dest.read(spark).collect()}
    assert got == {1: 1.0, 50: -1.0, 30: -5.0}


def test_clean_reclaims_stale_blooms(spark, tmp_path):
    """The cleaner removes bloom entries whose file-group version it
    reclaimed, and never touches entries for live versions."""
    dest = HudiDestination(tmp_path / "t", merge_keys=["o_orderkey"], key_index="bloom")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, _mk(spark, [(1, 10, 1.0)]), WriteDisposition.APPEND)
    for i in range(4):  # repeated rewrites of the same group
        _commit(spark, dest, b, _mk(spark, [(1, 10, float(-i))]), WriteDisposition.MERGE)
    bdir = tmp_path / "t" / ".hoodie" / "bloom"
    n_before = len(list(bdir.glob("*.json")))
    res = HudiTable(tmp_path / "t").clean(retain_commits=1)
    assert res["deleted"], "clean reclaimed nothing — fixture too small"
    assert res["blooms_deleted"]
    n_after = len(list(bdir.glob("*.json")))
    assert n_after < n_before
    # every surviving bloom points at a live file
    import json as _json

    for bj in bdir.glob("*.json"):
        rel = _json.loads(bj.read_text())["path"]
        assert (tmp_path / "t" / rel).exists()
    got = {r.o_orderkey: r.o_totalprice for r in dest.read(spark).collect()}
    assert got == {1: -3.0}
