"""Golden-package conformance: layout, manifest shape, deterministic ids.

The analogue of the reference's golden package suite
(`crates/cdf-conformance/src/golden_package/mod.rs:21-43`,
`golden/prepared-orders-v1/expected.json`): a fixed input must produce
a package with the expected layout, manifest fields, and a STABLE
package id — byte-level file equality is replaced by value-level
identity (Spark task ordering is nondeterministic by design).
"""

import json
from pathlib import Path

from cdf_spark.contracts import Contract, DomainRule, RangeRule
from cdf_spark.expressions.ast import Col
from cdf_spark.package.builder import PackageBuilder
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources import FileResource, ResourceDescriptor

EXPECTED_LAYOUT = {"data", "plan", "schema", "stats", "lineage", "state", "manifest.json"}
EXPECTED_MANIFEST_KEYS = {
    "package_id", "manifest_version", "resource_id", "rows_admitted",
    "rows_quarantined", "value_hash", "schema_fingerprint", "plan_hash",
    "contract_hash", "segments", "created_at_ms",
}


def _build(spark, sf_dir, tmp, shuffle_partitions=None):
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    res = FileResource(ResourceDescriptor(resource_id="orders"), f"{sf_dir}/orders.parquet")
    df, plan = res.scan(
        spark, ScanRequest("orders", predicates=[Col("o_totalprice") > 50000.0])
    )
    contract = Contract(
        rules=[RangeRule("o_totalprice", min=0.0), DomainRule("o_orderstatus", ["O", "F", "P"])]
    )
    from cdf_spark.contracts import evaluate_contract

    cres = evaluate_contract(df, contract)
    return PackageBuilder(tmp, "orders").build(
        admitted=cres.admitted, quarantined=cres.quarantined, scan_plan=plan, contract=contract
    )


def test_golden_layout_and_manifest(spark, sf_dir, tmp_path):
    pkg = _build(spark, sf_dir, tmp_path / "a")
    d = Path(pkg.path)
    assert EXPECTED_LAYOUT <= {p.name for p in d.iterdir()}
    manifest = json.loads((d / "manifest.json").read_text())
    assert set(manifest) == EXPECTED_MANIFEST_KEYS
    assert manifest["manifest_version"] == "cdf-spark-package@1"
    assert manifest["rows_admitted"] > 0
    assert manifest["segments"], "data segments must be listed"
    assert manifest["value_hash"].startswith("xxh64-xor:")
    assert manifest["schema_fingerprint"].startswith("sha256:")
    assert manifest["plan_hash"].startswith("sha256:")
    # plan artifact records the pushed predicate + fidelity
    plan = json.loads((d / "plan" / "scan_plan.json").read_text())
    assert plan["pushed"] and plan["pushed"][0]["fidelity"] == "inexact"
    assert plan["residual"], "inexact pushdown must carry a residual"
    # stats cover every admitted column
    stats = json.loads((d / "stats" / "column_stats.json").read_text())
    assert stats["o_totalprice"]["min"] > 50000.0


def test_golden_id_stable_across_parallelism(spark, sf_dir, tmp_path):
    """Same input -> same package id regardless of partitioning/
    task order (the determinism CDF gets from canonical row ordinals,
    we get from value hashing)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        p1 = _build(spark, sf_dir, tmp_path / "x", shuffle_partitions=2)
        p2 = _build(spark, sf_dir, tmp_path / "y", shuffle_partitions=13)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert p1.package_id == p2.package_id
    assert p1.value_hash == p2.value_hash
