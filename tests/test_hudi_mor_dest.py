"""HudiMorDestination — merge-on-read destination on the commit/verify
protocol (r8 verdict item 4).

Pinned: snapshot correctness through an external HudiMorTable read,
O(batch) write amplification (NO base file rewritten by a merge — the
whole point of MoR; each batch appends one log file per touched
group), bucket-index routing with zero table reads, new-partition
rows opening fresh file groups, compaction folding the log debt into
new base versions, instant-sequence resume across destination
instances, and a streaming drain landing one delta commit per epoch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.package import PackageBuilder
from cdf_spark.package.hudi_mor_dest import HudiMorDestination
from cdf_spark.sources.base import WriteDisposition
from cdf_spark.sources.hudi_mor import HudiMorTable


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


def _base_files(root):
    return sorted(
        str(p) for p in root.rglob("*.parquet") if ".hoodie" not in p.parts
    )


def _log_files(root):
    return sorted(str(p) for p in root.rglob(".*.log.*") if ".hoodie" not in p.parts)


def test_mor_upsert_appends_logs_not_bases(spark, tmp_path, orders):
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
    bases_before = _base_files(tmp_path / "t")
    assert bases_before and not _log_files(tmp_path / "t")

    batch = orders.filter("o_orderkey <= 400").withColumn("o_totalprice", F.lit(-1.0))
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    # O(batch): merge rewrote NO base file, only appended logs
    assert _base_files(tmp_path / "t") == bases_before
    assert _log_files(tmp_path / "t")

    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey <= 900").count()
    assert got.filter("o_totalprice = -1.0").count() == batch.count()
    # untouched keys keep their original price
    assert (
        got.filter("o_orderkey > 400 and o_totalprice = -1.0").count() == 0
    )


def test_mor_chained_merges_latest_wins(spark, tmp_path, orders):
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 300"), WriteDisposition.APPEND)
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0)),
        WriteDisposition.MERGE,
    )
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-2.0)),
        WriteDisposition.MERGE,
    )
    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey <= 300").count()
    assert got.filter("o_totalprice = -1.0").count() == 0
    assert got.filter("o_totalprice = -2.0").count() == orders.filter(
        "o_orderkey <= 100"
    ).count()


def test_mor_new_keys_append_and_new_partition_groups(spark, tmp_path):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    dest = HudiMorDestination(
        tmp_path / "t", record_key="o_orderkey", partition_by=["o_orderstatus"]
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    init = o.filter("o_orderstatus = 'O' and o_orderkey <= 900")
    _commit(spark, dest, b, init, WriteDisposition.APPEND)
    # merge rows of a partition the initial load never saw: a NEW file
    # group must open (parquet base), existing groups get log appends
    batch = o.filter(
        "(o_orderstatus = 'F' and o_orderkey <= 200) or "
        "(o_orderstatus = 'O' and o_orderkey <= 100)"
    ).withColumn("o_totalprice", F.lit(-7.0))
    assert batch.filter("o_orderstatus = 'F'").count() > 0
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    got = dest.read(spark)
    expect = init.count() + batch.filter("o_orderstatus = 'F'").count()
    assert got.count() == expect
    assert got.filter("o_totalprice = -7.0").count() == batch.count()
    assert (tmp_path / "t" / "o_orderstatus=F").is_dir()


def test_mor_compaction_folds_log_debt(spark, tmp_path, orders):
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 600"), WriteDisposition.APPEND)
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 200").withColumn("o_totalprice", F.lit(-3.0)),
        WriteDisposition.MERGE,
    )
    before = dest.read(spark).orderBy("o_orderkey").collect()
    inst = dest.compact(spark)
    assert inst is not None
    t = HudiMorTable(tmp_path / "t")
    # post-compaction: no dirty groups, snapshot unchanged
    assert all(not logs for _f, _p, _b, logs in t.file_slices(t.latest_instant()))
    after = dest.read(spark).orderBy("o_orderkey").collect()
    assert before == after
    # ... and a further merge keeps working against the new bases
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 50").withColumn("o_totalprice", F.lit(-4.0)),
        WriteDisposition.MERGE,
    )
    got = dest.read(spark)
    assert got.filter("o_totalprice = -4.0").count() == orders.filter(
        "o_orderkey <= 50"
    ).count()


def test_mor_instant_sequence_resumes_across_instances(spark, tmp_path, orders):
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    d1 = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    _commit(spark, d1, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    d2 = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    _commit(
        spark, d2, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0)),
        WriteDisposition.MERGE,
    )
    t = HudiMorTable(tmp_path / "t")
    assert t.instants() == sorted(t.instants())
    assert len(set(t.instants())) == len(t.instants()) == 2
    assert d2.read(spark).filter("o_totalprice = -1.0").count() == orders.filter(
        "o_orderkey <= 100"
    ).count()


def test_mor_replace_refused(spark, tmp_path, orders):
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    pkg = b.build(admitted=orders.filter("o_orderkey <= 100"))
    with pytest.raises(ValueError, match="not supported"):
        dest.commit(spark, pkg, WriteDisposition.REPLACE)


def test_streaming_drain_into_mor(spark, tmp_path, orders):
    """A Structured-Streaming drain lands in the MoR table with one
    delta commit per epoch — epoch 1 is the initial load (base files),
    later epochs are log appends: per-epoch write cost is O(epoch
    batch), the MoR streaming-ingest shape."""
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
        descriptor=ResourceDescriptor(resource_id="orders_mor_stream"),
        source_path=str(src),
        schema=schema,
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        destination=HudiMorDestination(tmp_path / "t", record_key="o_orderkey"),
        disposition=WriteDisposition.APPEND,
        reader_options={"maxFilesPerTrigger": 1},
    )
    epochs = pipe.run(spark)
    committed = [e for e in epochs if e.rows_admitted > 0]
    assert len(committed) >= 2
    assert all(e.receipt_verified for e in committed)

    t = HudiMorTable(tmp_path / "t")
    delta_commits = [
        p for p in (tmp_path / "t" / ".hoodie").glob("*.deltacommit")
    ]
    assert len(delta_commits) == len(committed)  # one instant per epoch
    got = HudiMorDestination(tmp_path / "t", record_key="o_orderkey").read(spark)
    assert got.count() == o.count()
    # epochs after the first landed as log appends, not base rewrites
    assert _log_files(tmp_path / "t")


def test_hudi_mor_declarative_kind(tmp_path):
    from cdf_spark.declarative import DeclarationError, _build_destination

    dest = _build_destination(
        {"kind": "hudi_mor", "path": str(tmp_path / "t"), "n_buckets": 8},
        tmp_path, "r1", ["k"],
    )
    assert isinstance(dest, HudiMorDestination)
    assert dest.record_key == "k" and dest.n_buckets == 8
    with pytest.raises(DeclarationError, match="record_key"):
        _build_destination(
            {"kind": "hudi_mor", "path": str(tmp_path / "t2")}, tmp_path, "r2", []
        )


def test_mor_cdc_apply_with_native_delete_blocks(spark, tmp_path, orders):
    """CDC_APPLY: a reduced effect stream (op column) lands upserts as
    Avro data blocks and deletes as NATIVE delete blocks, one log file
    per touched group, one delta commit — the MoR twin of the Delta
    DV-merge/DV-delete CDC application."""
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    bases = _base_files(tmp_path / "t")
    effects = (
        orders.filter("o_orderkey <= 100")
        .withColumn("o_totalprice", F.lit(-1.0))
        .withColumn("op", F.lit("update"))
        .unionByName(
            orders.filter("o_orderkey > 400 and o_orderkey <= 500").withColumn(
                "op", F.lit("delete")
            )
        )
    )
    pkg = b.build(admitted=effects)
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.CDC_APPLY), pkg)
    assert rec.verified
    assert _base_files(tmp_path / "t") == bases  # log-only commit
    got = dest.read(spark)
    n_del = orders.filter("o_orderkey > 400 and o_orderkey <= 500").count()
    assert got.count() == orders.filter("o_orderkey <= 500").count() - n_del
    assert got.filter("o_totalprice = -1.0").count() == orders.filter(
        "o_orderkey <= 100"
    ).count()
    assert got.filter("o_orderkey > 400").count() == 0
    # deletes survive compaction (folded into the new bases)
    dest.compact(spark)
    got2 = dest.read(spark)
    assert got2.count() == got.count()
    assert got2.filter("o_orderkey > 400").count() == 0


def test_mor_crash_between_logs_and_commit_is_invisible_then_idempotent(
    spark, tmp_path, orders, monkeypatch
):
    """Commit-protocol chaos: a writer that crashes AFTER its log files
    hit storage but BEFORE the delta-commit JSON lands must leave the
    table unchanged (slices resolve from write stats, never from
    directory listing — orphan logs are invisible), and re-committing
    the same package lands exactly once."""
    import json as _json
    from pathlib import Path as _P

    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    before = dest.read(spark).orderBy("o_orderkey").collect()

    # crash seam: kill the write of the .deltacommit file once
    real_write_text = _P.write_text
    state = {"crashed": False}

    def crashing_write_text(self, *a, **kw):
        if self.suffix == ".deltacommit" and not state["crashed"]:
            state["crashed"] = True
            raise OSError("simulated crash before timeline commit")
        return real_write_text(self, *a, **kw)

    monkeypatch.setattr(_P, "write_text", crashing_write_text)
    batch = orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-8.0))
    pkg = b.build(admitted=batch)
    with pytest.raises(OSError, match="simulated crash"):
        dest.commit(spark, pkg, WriteDisposition.MERGE)
    # orphan log bytes exist, but the table state is UNCHANGED
    assert _log_files(tmp_path / "t")
    assert dest.read(spark).orderBy("o_orderkey").collect() == before
    # resume: the SAME package re-commits and lands exactly once
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.MERGE), pkg)
    assert rec.verified
    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey <= 500").count()
    assert got.filter("o_totalprice = -8.0").count() == batch.count()
    # timeline carries exactly the two successful instants
    commits = sorted((tmp_path / "t" / ".hoodie").glob("*.deltacommit"))
    assert len(commits) == 2
    for c in commits:
        _json.loads(c.read_text())  # every landed commit is complete


def test_streaming_mor_pipeline_compacts_mid_stream(spark, tmp_path, orders):
    """maintenance_every_epochs on a drained stream into a MoR
    destination: log debt accumulates per epoch, the autopilot's
    mor_compact folds it mid-stream, and the drained content still
    equals the source."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import types as T

    from cdf_spark.package.maintenance import MaintenancePolicy
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.streaming import StreamingLoadPipeline

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0").limit(800)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    (tmp_path / "in").mkdir()
    for i in range(4):
        stage = tempfile.mkdtemp()
        o.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (src,) = sorted(Path(stage).glob("*.parquet"))
        shutil.move(str(src), str(tmp_path / "in" / f"p{i}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")
    pipe = StreamingLoadPipeline(
        descriptor=ResourceDescriptor(resource_id="mor_stream_maint"),
        source_path=str(tmp_path / "in"),
        schema=schema,
        destination=dest,
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        disposition=WriteDisposition.APPEND,
        reader_options={"maxFilesPerTrigger": 1},
        maintenance_every_epochs=2,
        maintenance_policy=MaintenancePolicy(
            max_dirty_mor_groups=1, hudi_retain_commits=100
        ),
    )
    pipe.run(spark, checkpoint_dir=str(tmp_path / "ck"))
    assert len([e for e in pipe.epochs if e.receipt_verified]) == 4
    assert len(pipe.maintenance_reports) == 2
    assert any("mor_compact" in r["results"] for r in pipe.maintenance_reports)
    assert dest.read(spark).count() == o.count()


def test_mor_bucket_resize_chaos(spark, tmp_path, orders):
    """r11 bucket-count evolution: upserts land BEFORE and AFTER a
    resize_buckets() rewrite and the snapshot stays exactly right —
    the resize replacecommit retires every generation-0 group, new
    generation-1 groups carry the rewritten data, post-resize routing
    uses the doubled count from hoodie.properties (zero-read
    authority), and a FRESH destination instance (constructor default
    n_buckets=4) adopts the evolved count instead of scattering
    keys."""
    from cdf_spark.sources.hudi_mor import HudiMorFixtureWriter

    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey", n_buckets=2)
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    base = orders.filter("o_orderkey <= 600")
    _commit(spark, dest, b, base, WriteDisposition.APPEND)
    # pre-resize upsert (generation-0 log appends)
    up1 = orders.filter("o_orderkey <= 100").withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    _commit(spark, dest, b, up1, WriteDisposition.MERGE)

    w = HudiMorFixtureWriter(tmp_path / "t", record_key="o_orderkey")
    assert w.n_buckets == 2 and w.bucket_generation == 0  # adopted
    instant = w.resize_buckets(spark, 4)
    assert instant is not None
    props = (tmp_path / "t" / ".hoodie" / "hoodie.properties").read_text()
    assert "hoodie.index.bucket.num=4" in props
    assert "hoodie.index.bucket.generation=1" in props

    t = HudiMorTable(tmp_path / "t")
    slices = t.file_slices(t.latest_instant())
    assert all(fid.startswith("g1-") for fid, _p, _b, _l in slices), slices
    assert len(slices) == 4  # doubled bucket count, all groups live

    # post-resize: a FRESH destination with the stale constructor
    # default must adopt the evolved count and route correctly
    dest2 = HudiMorDestination(tmp_path / "t", record_key="o_orderkey")  # default 4
    up2 = orders.filter("o_orderkey > 100 AND o_orderkey <= 200").withColumn(
        "o_totalprice", F.lit(-2.0)
    )
    _commit(spark, dest2, b, up2, WriteDisposition.MERGE)
    new_keys = orders.filter("o_orderkey > 600 AND o_orderkey <= 700")
    _commit(spark, dest2, b, new_keys, WriteDisposition.APPEND)

    got = dest2.read(spark)
    want = (
        orders.filter("o_orderkey <= 700")
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") <= 100, F.lit(-1.0))
            .when(
                (F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200), F.lit(-2.0)
            )
            .otherwise(F.col("o_totalprice")),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # time travel to the pre-resize instant still resolves gen-0 layout
    pre = t.instants()[1]  # the pre-resize upsert's deltacommit
    old = t.snapshot(spark, instant=pre).drop("_hoodie_commit_time", "_hoodie_record_key")
    assert old.count() == 601
    # change stream skips the CLUSTER replacecommit (no logical change)
    ch = t.change_stream(spark, from_instant=t.instants()[1])
    assert ch.filter(F.col("_instant") == instant).count() == 0


def test_mor_resize_autopilot_policy(spark, tmp_path, orders):
    """The maintenance planner flags mor_resize_buckets when the p95
    group size crosses policy, and executing the plan doubles the
    bucket count; below-threshold tables plan nothing."""
    from cdf_spark.package.maintenance import (
        MaintenancePolicy,
        plan_maintenance,
        run_maintenance,
    )

    dest = HudiMorDestination(tmp_path / "t", record_key="o_orderkey", n_buckets=2)
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)

    lax = MaintenancePolicy(max_mor_group_bytes=1 << 30, max_dirty_mor_groups=10**6)
    assert not [
        a
        for a in plan_maintenance(tmp_path / "t", policy=lax)
        if a.action == "mor_resize_buckets"
    ]
    tight = MaintenancePolicy(max_mor_group_bytes=1, max_dirty_mor_groups=10**6)
    planned = plan_maintenance(tmp_path / "t", policy=tight)
    assert any(a.action == "mor_resize_buckets" for a in planned)
    out = run_maintenance(spark, tmp_path / "t", policy=tight)
    assert out["results"]["mor_resize_buckets"]["instant"] is not None
    props = (tmp_path / "t" / ".hoodie" / "hoodie.properties").read_text()
    assert "hoodie.index.bucket.num=4" in props
    # table still reads green after the autopilot resize
    got = HudiMorTable(tmp_path / "t").snapshot(spark)
    assert got.count() == orders.filter("o_orderkey <= 500").count()


def test_mor_bucket_resize_partitioned(spark, tmp_path, orders):
    """Resize on a hive-partitioned MoR table: every (partition,
    bucket) group rewrites into the doubled per-partition width,
    partition pruning still works, snapshot exact across the
    boundary."""
    from cdf_spark.sources.hudi_mor import HudiMorFixtureWriter, HudiMorTable

    part = orders.withColumn("seg", (orders.o_custkey % 2).cast("long"))
    w = HudiMorFixtureWriter(
        tmp_path / "t", record_key="o_orderkey", n_buckets=2, partition_by=["seg"]
    )
    w.insert(part.filter("o_orderkey <= 400"))
    w.upsert(
        part.filter("o_orderkey <= 80").withColumn("o_totalprice", F.lit(-1.0))
    )
    instant = w.resize_buckets(spark, 4)
    assert instant is not None and w.bucket_generation == 1
    t = HudiMorTable(tmp_path / "t")
    slices = t.file_slices(t.latest_instant())
    assert all(fid.startswith("g1-") for fid, _p, _b, _l in slices)
    assert len({p for _f, p, _b, _l in slices}) == 2  # both partitions live
    w.upsert(
        part.filter("o_orderkey > 80 AND o_orderkey <= 120").withColumn(
            "o_totalprice", F.lit(-2.0)
        )
    )
    got = t.snapshot(spark).drop("_hoodie_commit_time", "_hoodie_record_key")
    want = part.filter("o_orderkey <= 400").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") <= 80, F.lit(-1.0))
        .when((F.col("o_orderkey") > 80) & (F.col("o_orderkey") <= 120), F.lit(-2.0))
        .otherwise(F.col("o_totalprice")),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    a = got.filter("seg = 1")
    b = want.filter("seg = 1")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
