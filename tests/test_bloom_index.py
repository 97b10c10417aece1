"""Scan-side bloom data skipping (_bloom_index/ sidecars) — point
lookups on high-cardinality columns whose min/max spans every file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.expressions.ast import Col, Lit
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable
from cdf_spark.sources.iceberg import IcebergFixtureWriter, IcebergTable


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _interleaved(spark, orders, parity):
    """Keys of one parity over the full range — every file's min/max
    spans nearly the whole key domain, so stats cannot separate them."""
    return orders.filter(f"o_orderkey <= 1000 and o_orderkey % 2 = {parity}")


def test_delta_bloom_point_lookup_prunes(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    res = t.build_bloom_index(spark, "o_orderkey")
    assert res["built"] == 2 and res["skipped"] == 0
    # an odd key: only the parity-1 file can hold it
    key = int(
        orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 1")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    req = ScanRequest("t", predicates=[Col("o_orderkey") == Lit(key)])
    df, plan = t.scan(spark, req)
    meta = plan.partitions.meta
    assert meta["files_pruned_by_bloom"] == 1, meta
    assert meta["files_pruned_by_stats"] == 0  # ranges interleave
    rows = df.collect()
    assert len(rows) == 1 and rows[0].o_orderkey == key


def test_delta_bloom_no_index_is_noop(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    req = ScanRequest("t", predicates=[Col("o_orderkey") == Lit(5)])
    df, plan = t.scan(spark, req)
    assert plan.partitions.meta["files_pruned_by_bloom"] == 0
    assert df.count() == 1


def test_delta_bloom_partial_index_conservative(spark, tmp_path, orders):
    """Files committed AFTER the index build have no sidecar — they
    are kept; an incremental rebuild indexes only the new files."""
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    t = DeltaTable(tmp_path / "t")
    assert t.build_bloom_index(spark, "o_orderkey")["built"] == 1
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t2 = DeltaTable(tmp_path / "t")
    # even key, held by the UNINDEXED file: must not be pruned
    key = int(
        orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 0")
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    df, plan = t2.scan(spark, ScanRequest("t", predicates=[Col("o_orderkey") == Lit(key)]))
    assert df.count() == 1
    res = t2.build_bloom_index(spark, "o_orderkey")
    assert res["built"] == 1 and res["skipped"] == 1


def test_delta_bloom_refuses_unsafe_literals(spark, tmp_path, orders):
    """Float columns have no provable probe encoding — the BUILD now
    refuses them outright; float literals against an int-column index
    must not prune either."""
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    with pytest.raises(ValueError, match="probe encoding"):
        t.build_bloom_index(spark, "o_totalprice")
    t.build_bloom_index(spark, "o_orderkey")
    key = int(
        orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 1")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    df, plan = t.scan(
        spark, ScanRequest("t", predicates=[Col("o_orderkey") == Lit(float(key))])
    )
    assert plan.partitions.meta["files_pruned_by_bloom"] == 0
    assert df.count() >= 1


def test_bloom_typed_probe_guards_cross_type(spark, tmp_path):
    """An int literal against a STRING-column index must return None
    (no prune): Spark's coercing equality matches col '05' = 5, but
    the build set bits for '05', not '5' — pruning would silently drop
    matching rows. Same-family probes still prove presence/absence."""
    from cdf_spark.sources.bloom_index import BloomProbe, build_bloom_index

    root = tmp_path / "t"
    spark.createDataFrame([("05",), ("7",)], ["k"]).coalesce(1).write.parquet(
        str(root / "d")
    )
    files = [str(p) for p in (root / "d").glob("*.parquet")]
    assert build_bloom_index(spark, root, "k", files)["built"] == 1
    rel = str(__import__("pathlib").Path(files[0]).relative_to(root))
    probe = BloomProbe(root, ["k"])
    assert probe.maybe_contains("k", rel, 5) is None
    assert probe.maybe_contains("k", rel, "05") is True
    assert probe.maybe_contains("k", rel, "absent-value") is False


def test_bloom_legacy_sidecar_without_coltype_never_prunes(spark, tmp_path):
    """Sidecars written before the coltype field carry no recorded
    family — the probe must treat them as undecidable (None), never
    prune on an unproven encoding."""
    import json as _json

    from cdf_spark.sources.bloom_index import BLOOM_DIR, BloomProbe, build_bloom_index

    root = tmp_path / "t"
    spark.createDataFrame([("a",), ("b",)], ["k"]).coalesce(1).write.parquet(
        str(root / "d")
    )
    files = [str(p) for p in (root / "d").glob("*.parquet")]
    build_bloom_index(spark, root, "k", files)
    sc = next((root / BLOOM_DIR / "k").glob("*.json"))
    meta = _json.loads(sc.read_text())
    del meta["coltype"]
    sc.write_text(_json.dumps(meta))
    rel = str(__import__("pathlib").Path(files[0]).relative_to(root))
    probe = BloomProbe(root, ["k"])
    assert probe.maybe_contains("k", rel, "a") is None
    assert probe.maybe_contains("k", rel, "absent") is None


def test_bloom_backfill_500_files_driver_budget(spark, tmp_path, monkeypatch):
    """A backfill over 500 files must stay executor-side: the ONLY
    rows that reach the driver are the one-per-file status rows —
    never the raw bit positions (~rows x k per file)."""
    from pyspark.sql import DataFrame

    from cdf_spark.sources.bloom_index import BloomProbe, build_bloom_index

    root = tmp_path / "t"
    (
        spark.range(5_000)
        .select(F.col("id").alias("k"))
        .repartition(500)
        .write.parquet(str(root / "d"))
    )
    files = [str(p) for p in (root / "d").glob("*.parquet")]
    assert len(files) == 500
    collected = []
    orig = DataFrame.collect

    def counting_collect(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    res = build_bloom_index(spark, root, "k", files)
    monkeypatch.undo()
    assert res["built"] == 500 and res["unmatched"] == 0
    # driver budget: one status row per file (positions alone would be
    # ~5000 x 4 rows)
    assert sum(collected) <= 500, collected
    # sidecars are real and probe-ready
    probe = BloomProbe(root, ["k"])
    import pathlib

    rel = str(pathlib.Path(files[0]).relative_to(root))
    hits = [v for v in range(5_000) if probe.maybe_contains("k", rel, v) is True]
    assert hits  # the file's ~10 keys answer True
    assert probe.maybe_contains("k", rel, 10_000_000) is False


def test_iceberg_bloom_point_lookup_prunes(spark, tmp_path, orders):
    w = IcebergFixtureWriter(tmp_path / "t", seed=11)
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000, snapshot_id=101)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000, snapshot_id=102)
    t = IcebergTable(tmp_path / "t")
    res = t.build_bloom_index(spark, "o_orderkey")
    assert res["built"] == 2
    key = int(
        orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 1")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    df, plan = t.scan(spark, ScanRequest("t", predicates=[Col("o_orderkey") == Lit(key)]))
    meta = plan.partitions.meta
    assert meta["files_pruned_by_bloom"] == 1, meta
    rows = df.collect()
    assert len(rows) == 1 and rows[0].o_orderkey == key


def test_iceberg_bloom_time_travel_consistent(spark, tmp_path, orders):
    """Bloom pruning at an OLD snapshot still returns exactly the
    old-snapshot rows (the index is per-file, snapshot-agnostic)."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=12)
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000, snapshot_id=201)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000, snapshot_id=202)
    t = IcebergTable(tmp_path / "t")
    t.build_bloom_index(spark, "o_orderkey")
    key = int(
        orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 0")
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    # the even key exists only at snapshot 202
    df_old, _ = t.scan(
        spark, ScanRequest("t", predicates=[Col("o_orderkey") == Lit(key)]),
        snapshot_id=201,
    )
    assert df_old.count() == 0
    df_new, _ = t.scan(
        spark, ScanRequest("t", predicates=[Col("o_orderkey") == Lit(key)]),
        snapshot_id=202,
    )
    assert df_new.count() == 1


def test_delta_bloom_or_of_eq_in_list(spark, tmp_path, orders):
    """IN-list shape (OR of equalities): pruned only when EVERY listed
    value is provably absent; null-safe eq prunes like eq."""
    from cdf_spark.expressions.ast import Binary

    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    w.append(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    t.build_bloom_index(spark, "o_orderkey")
    odd = [
        int(r[0])
        for r in orders.filter("o_orderkey <= 1000 and o_orderkey % 2 = 1")
        .select("o_orderkey").limit(2).collect()
    ]
    pred = Binary("or", Col("o_orderkey") == Lit(odd[0]), Col("o_orderkey") == Lit(odd[1]))
    df, plan = t.scan(spark, ScanRequest("t", predicates=[pred]))
    assert plan.partitions.meta["files_pruned_by_bloom"] == 1  # even file out
    assert df.count() == 2
    nseq = Binary("is_not_distinct_from", Col("o_orderkey"), Lit(odd[0]))
    df2, plan2 = t.scan(spark, ScanRequest("t", predicates=[nseq]))
    assert plan2.partitions.meta["files_pruned_by_bloom"] == 1
    assert df2.count() == 1


def test_delta_vacuum_sweeps_stale_sidecars(spark, tmp_path, orders):
    """Storage reclamation removes sidecars with their data files and
    keeps sidecars of live files."""
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(_interleaved(spark, orders, 1), timestamp_ms=1_000)
    t = DeltaTable(tmp_path / "t")
    t.build_bloom_index(spark, "o_orderkey")
    # overwrite supersedes the v0 file; vacuum with zero retention
    w.overwrite(_interleaved(spark, orders, 0), timestamp_ms=2_000)
    t2 = DeltaTable(tmp_path / "t")
    t2.build_bloom_index(spark, "o_orderkey")
    res = t2.vacuum(retention_ms=0)
    assert res["deleted"] and res["blooms_deleted"]
    import json as _json

    left = list((tmp_path / "t" / "_bloom_index" / "o_orderkey").glob("*.json"))
    assert left  # live file's sidecar survives
    for sc in left:
        assert (tmp_path / "t" / _json.loads(sc.read_text())["path"]).exists()


def test_bloom_legacy_sidecar_rebuilt_with_coltype(spark, tmp_path):
    """A legacy (coltype-less) sidecar is treated as MISSING by the
    next build pass — pre-upgrade tables regain pruning instead of
    silently paying full scans forever."""
    import json as _json

    from cdf_spark.sources.bloom_index import BLOOM_DIR, BloomProbe, build_bloom_index

    root = tmp_path / "t"
    spark.createDataFrame([("a",), ("b",)], ["k"]).coalesce(1).write.parquet(
        str(root / "d")
    )
    files = [str(p) for p in (root / "d").glob("*.parquet")]
    build_bloom_index(spark, root, "k", files)
    sc = next((root / BLOOM_DIR / "k").glob("*.json"))
    meta = _json.loads(sc.read_text())
    del meta["coltype"]
    sc.write_text(_json.dumps(meta))
    rep = build_bloom_index(spark, root, "k", files)
    assert rep["built"] == 1 and rep["skipped"] == 0  # rebuilt, not skipped
    rel = str(__import__("pathlib").Path(files[0]).relative_to(root))
    probe = BloomProbe(root, ["k"])
    assert probe.maybe_contains("k", rel, "absent") is False  # pruning again
    # a current sidecar skips as before
    rep2 = build_bloom_index(spark, root, "k", files)
    assert rep2["built"] == 0 and rep2["skipped"] == 1


def test_maintenance_bloom_refusal_is_isolated(spark, tmp_path):
    """An unindexable column in bloom_index_columns records a refusal
    in the report instead of aborting the maintenance run."""
    from cdf_spark.package.maintenance import _build_blooms
    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    root = tmp_path / "dt"
    w = DeltaFixtureWriter(root)
    df = spark.createDataFrame([(1, 2.5, "x")], ["k", "score", "s"])
    w.append(df, timestamp_ms=1_000)
    t = DeltaTable(root)
    out = _build_blooms(t, spark, ("k", "score", "s"))
    assert "refused" in out["score"] and "probe encoding" in out["score"]["refused"]
    assert out["k"].get("built", 0) >= 0 and out["s"].get("built", 0) >= 0  # others ran


def test_bloom_planner_schedules_legacy_sidecar_rebuild(spark, tmp_path):
    """_bloom_missing treats a coltype-less sidecar as missing — the
    maintenance planner actually schedules the rebuild the typed-probe
    upgrade depends on."""
    import json as _json
    from pathlib import Path

    from cdf_spark.package.maintenance import _bloom_missing
    from cdf_spark.sources.bloom_index import BLOOM_DIR, build_bloom_index

    root = tmp_path / "t"
    spark.createDataFrame([("a",)], ["k"]).coalesce(1).write.parquet(str(root / "d"))
    files = [str(p) for p in (root / "d").glob("*.parquet")]
    build_bloom_index(spark, root, "k", files)
    assert _bloom_missing(Path(root), ["k"], files) == 0
    sc = next((root / BLOOM_DIR / "k").glob("*.json"))
    meta = _json.loads(sc.read_text())
    del meta["coltype"]
    sc.write_text(_json.dumps(meta))
    assert _bloom_missing(Path(root), ["k"], files) == 1
