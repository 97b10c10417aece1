"""Scope leases and negotiated-scan claim validation."""

import time

import pytest

from cdf_spark.expressions.ast import Col
from cdf_spark.package.lease import LeaseHeld, ScopeLeaseManager
from cdf_spark.plans.scan import (
    Capability,
    PushdownFidelity,
    ScanClaimError,
    ScanPredicate,
    ScanRequest,
    negotiate,
    validate_negotiated_scan,
)


def test_lease_exclusive(tmp_path):
    mgr = ScopeLeaseManager(tmp_path, ttl_ms=60_000)
    l1 = mgr.acquire("orders", holder="run-a")
    with pytest.raises(LeaseHeld):
        mgr.acquire("orders", holder="run-b")
    # a different resource is fine
    mgr.acquire("customers", holder="run-b")
    mgr.release(l1)
    l2 = mgr.acquire("orders", holder="run-b")
    assert l2.holder == "run-b"


def test_lease_expiry_and_renewal(tmp_path):
    mgr = ScopeLeaseManager(tmp_path, ttl_ms=50)  # 50ms TTL
    l1 = mgr.acquire("r", holder="a")
    time.sleep(0.08)
    assert l1.expired
    # expired lease is broken by the next claimant
    l2 = mgr.acquire("r", holder="b")
    assert l2.holder == "b"
    # renewal extends
    mgr2 = ScopeLeaseManager(tmp_path, ttl_ms=60_000)
    l3 = mgr2.renew(l2)
    assert not l3.expired
    # the old holder cannot release someone else's lease
    mgr.release(l1)
    assert l2.path.exists()


def test_validate_negotiated_scan_accepts_honest_plans():
    cap = Capability.parquet()
    plan = negotiate(ScanRequest("t", predicates=[Col("a") > 1], limit=5), cap)
    validate_negotiated_scan(plan, cap)  # no raise


def test_validate_negotiated_scan_rejects_overclaims():
    cap = Capability.parquet()
    plan = negotiate(ScanRequest("t", predicates=[Col("a") > 1]), cap)

    # claim exact where source declares inexact
    plan.pushed[0].fidelity = PushdownFidelity.EXACT
    with pytest.raises(ScanClaimError):
        validate_negotiated_scan(plan, cap)

    # undeclared op pushed
    plan2 = negotiate(ScanRequest("t", predicates=[Col("a") > 1]), cap)
    plan2.pushed.append(ScanPredicate(Col("b").is_not_null(), PushdownFidelity.INEXACT))
    with pytest.raises(ScanClaimError):
        validate_negotiated_scan(plan2, cap)

    # limit retained by a limitless source
    cap2 = Capability.text_format()
    cap2.limit = False
    plan3 = negotiate(ScanRequest("t", limit=10), Capability.text_format())
    plan3.limit = 10
    with pytest.raises(ScanClaimError):
        validate_negotiated_scan(plan3, cap2)

    # fake position subsumption
    plan4 = negotiate(ScanRequest("t", predicates=[Col("a") > 1]), cap)
    plan4.pushed[0].subsumed_by_position = True
    with pytest.raises(ScanClaimError):
        validate_negotiated_scan(plan4, cap)


def test_pipeline_holds_lease_during_run(spark, tmp_path, sf_dir):
    """A second pipeline for the same resource is refused while the
    first run's lease is held (simulated by pre-acquiring)."""
    from cdf_spark.package import CheckpointLedger
    from cdf_spark.runtime import LoadPipeline
    from cdf_spark.sources import FileResource, ResourceDescriptor

    ledger = CheckpointLedger(tmp_path / "ledger")
    pipe = LoadPipeline(
        resource=FileResource(ResourceDescriptor("orders"), f"{sf_dir}/orders.parquet"),
        package_root=str(tmp_path / "pkgs"),
        ledger=ledger,
    )
    mgr = ScopeLeaseManager(tmp_path / "ledger" / "leases")
    held = mgr.acquire("orders", holder="someone-else")
    with pytest.raises(LeaseHeld):
        pipe.run(spark)
    mgr.release(held)
    r = pipe.run(spark)  # lease released -> run proceeds and releases its own
    assert r.rows_admitted > 0
    r2 = pipe.run(spark)  # lease not leaked by previous run
    assert r2.rows_admitted > 0
