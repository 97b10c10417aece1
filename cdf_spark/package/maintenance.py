"""Policy-driven table maintenance orchestration.

A 100 TB deployment does not run compaction by hand: per-epoch
streaming commits accrete small files, CDC merges accrete tombstones
and deletion vectors, and snapshot history grows without bound. This
module is the autopilot: `plan_maintenance` INSPECTS a table's own
metadata (manifests / log actions / timeline — never the data) and
emits the actions a policy says are due, with the evidence that
triggered each; `run_maintenance` executes them through the format's
maintenance ops (bin-pack, expire/vacuum/clean, orphan removal).

Planning is read-only and O(metadata); running an empty plan is a
no-op, so the orchestrator is safe on a schedule (idempotence is
tested). Format detection mirrors the catalog router
(`sources/catalog.py classify_table`).

Reference parity: the reference schedules per-resource freshness and
scope leases (crates/cdf-kernel/src/lib.rs freshness/trust exports,
package/lease.py here); maintenance is the destination-side analogue —
declarative thresholds, evidence-carrying decisions, commit-atomic
execution.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession


@dataclass
class MaintenancePolicy:
    """Thresholds that make maintenance due. Defaults are the common
    production shape: 32 MiB small-file cutoff packing toward 128 MiB,
    bin-pack once 4+ small files share a partition, keep 20 snapshots,
    reclaim storage after 7 days."""

    small_file_bytes: int = 32 << 20
    target_file_bytes: int = 128 << 20
    min_small_files: int = 4
    max_snapshots: int = 20
    retention_ms: int = 7 * 24 * 3600 * 1000
    hudi_retain_commits: int = 10
    # consolidate positional-delete files once this many accumulate
    # (each is another anti-join side every snapshot read must open)
    max_pos_delete_files: int = 4
    # Delta REORG PURGE once this many live files carry deletion
    # vectors (each pays its anti-join on every read)
    max_dv_files: int = 4
    # MoR compaction once this many file groups carry pending log
    # files (each dirty group pays its log decode + key merge on
    # every snapshot read; compaction folds the debt into new bases)
    max_dirty_mor_groups: int = 4
    # MoR bucket-count evolution: once the p95 live group size (base +
    # pending logs) crosses this, the fixed-width bucket index has
    # outgrown its width — rewrite into 2x buckets (one clustering
    # replacecommit; routing stays a zero-read key function at the new
    # generation). 0 disables.
    max_mor_group_bytes: int = 256 << 20
    # scan-side bloom data skipping: keep a per-file bloom index on
    # these columns (iceberg/delta) — each run indexes only the files
    # new commits added (incremental), so the autopilot keeps point
    # lookups pruned without a manual rebuild. Empty disables.
    bloom_index_columns: tuple = ()


@dataclass
class MaintenanceAction:
    action: str
    reason: str
    evidence: dict = field(default_factory=dict)


def _plan_iceberg(root: Path, policy: MaintenancePolicy) -> list[MaintenanceAction]:
    from ..sources.iceberg import IcebergTable

    t = IcebergTable(root)
    cur = t.current_snapshot_id()
    actions: list[MaintenanceAction] = []
    if cur is None:
        return actions
    # small files per partition record, from manifest entries alone
    from collections import Counter
    import json as _json

    small_by_part: Counter = Counter()
    for mp in t._manifest_paths(t.snapshot(cur)):
        for e in t._manifest_entries(mp):
            dfile = e["data_file"]
            if int(e.get("status", 1)) == 2 or int(dfile.get("content") or 0) != 0:
                continue
            if int(dfile.get("file_size_in_bytes") or 0) < policy.small_file_bytes:
                key = _json.dumps(dfile.get("partition"), sort_keys=True, default=str)
                small_by_part[key] += 1
    n_pos_deletes = sum(
        1
        for mp in t._manifest_paths(t.snapshot(cur))
        for e in t._manifest_entries(mp)
        if int(e.get("status", 1)) != 2
        and int(e["data_file"].get("content") or 0) == 1
    )
    if n_pos_deletes >= policy.max_pos_delete_files:
        actions.append(
            MaintenanceAction(
                "rewrite_position_deletes",
                f"{n_pos_deletes} positional-delete files exceed the "
                f"{policy.max_pos_delete_files} cap",
                {"pos_delete_files": n_pos_deletes},
            )
        )
    packable = {k: n for k, n in small_by_part.items() if n >= policy.min_small_files}
    if packable:
        actions.append(
            MaintenanceAction(
                "rewrite_small_files",
                f"{sum(packable.values())} files under "
                f"{policy.small_file_bytes} B across {len(packable)} partition(s)",
                {"small_files": sum(packable.values()), "partitions": len(packable)},
            )
        )
    snaps = t.snapshots()
    if len(snaps) > policy.max_snapshots:
        actions.append(
            MaintenanceAction(
                "expire_snapshots",
                f"{len(snaps)} snapshots exceed the {policy.max_snapshots} cap",
                {"snapshots": len(snaps)},
            )
        )
    orphans = t.remove_orphan_files(older_than_ms=_now_ms() - policy.retention_ms, dry_run=True)
    if orphans["deleted"]:
        actions.append(
            MaintenanceAction(
                "remove_orphan_files",
                f"{len(orphans['deleted'])} unreferenced data file(s) past retention",
                {"orphans": len(orphans["deleted"])},
            )
        )
    if policy.bloom_index_columns:
        missing = _bloom_missing(
            root, policy.bloom_index_columns, t.files_for_snapshot(cur)
        )
        if missing:
            actions.append(
                MaintenanceAction(
                    "build_bloom_index",
                    f"{missing} live (file, column) pair(s) lack bloom sidecars",
                    {"missing": missing, "columns": list(policy.bloom_index_columns)},
                )
            )
    return actions


def _build_blooms(table, spark, cols) -> dict:
    """Per-column bloom builds with per-column FAILURE ISOLATION: an
    unindexable column (float/date/decimal — build_bloom_index refuses
    types without a provable probe encoding, r12) records a refusal
    instead of aborting the whole maintenance run mid-loop and
    skipping the remaining actions (vacuum, checkpoints) that used to
    run. The planner will keep flagging the column's files as missing
    — the refusal record in every report is the operator's signal to
    drop the column from bloom_index_columns."""
    out = {}
    for c in cols:
        try:
            out[c] = table.build_bloom_index(spark, c)
        except (ValueError, KeyError) as exc:
            # ValueError: unindexable column type; KeyError: the column
            # isn't in the schema at all (config typo) — both are
            # per-column operator errors, never run-aborting
            out[c] = {"refused": str(exc)}
    return out


def _bloom_missing(root: Path, cols, files) -> int:
    """How many live (file, column) pairs lack a CURRENT bloom
    sidecar — root-local files only (linked files are the source
    table's). Legacy coltype-less sidecars count as missing, so the
    planner actually schedules the rebuild the typed-probe upgrade
    depends on (a pre-upgrade table would otherwise never regain
    pruning through the maintenance path)."""
    from ..sources.bloom_index import _sidecar, sidecar_is_current

    rr = root.resolve()
    n = 0
    for col in cols:
        for f in files:
            try:
                rel = str(Path(f).resolve().relative_to(rr))
            except ValueError:
                continue
            sc = _sidecar(root, col, rel)
            if not sc.exists() or not sidecar_is_current(sc):
                n += 1
    return n


def _plan_delta(root: Path, policy: MaintenancePolicy) -> list[MaintenanceAction]:
    from ..sources.delta import DeltaTable

    t = DeltaTable(root)
    cur = t.current_version()
    actions: list[MaintenanceAction] = []
    from collections import Counter

    small_by_part: Counter = Counter()
    dv_files = 0
    for path, add in t.live_add_actions(cur).items():
        if int(add.get("size") or 0) < policy.small_file_bytes:
            small_by_part[tuple(sorted((add.get("partitionValues") or {}).items()))] += 1
        if add.get("deletionVector"):
            dv_files += 1
    packable = {k: n for k, n in small_by_part.items() if n >= policy.min_small_files}
    if packable:
        actions.append(
            MaintenanceAction(
                "optimize_small_files",
                f"{sum(packable.values())} files under "
                f"{policy.small_file_bytes} B across {len(packable)} partition(s)"
                + (f"; {dv_files} carrying deletion vectors" if dv_files else ""),
                {"small_files": sum(packable.values()), "dv_files": dv_files},
            )
        )
    if dv_files >= policy.max_dv_files:
        actions.append(
            MaintenanceAction(
                "reorg_purge",
                f"{dv_files} live files carry deletion vectors (cap "
                f"{policy.max_dv_files}) — fold the deletes in",
                {"dv_files": dv_files},
            )
        )
    vac = t.vacuum(retention_ms=policy.retention_ms, dry_run=True)
    if vac["deleted"]:
        actions.append(
            MaintenanceAction(
                "vacuum",
                f"{len(vac['deleted'])} unreferenced file(s) past retention",
                {"reclaimable": len(vac["deleted"])},
            )
        )
    if len(t.versions()) > policy.max_snapshots:
        actions.append(
            MaintenanceAction(
                "checkpoint_and_clean_log",
                f"{len(t.versions())} commit JSONs exceed the {policy.max_snapshots} cap",
                {"versions": len(t.versions())},
            )
        )
    if policy.bloom_index_columns:
        files = [t._resolve(p) for p in t.live_add_actions(t.current_version())]
        missing = _bloom_missing(root, policy.bloom_index_columns, files)
        if missing:
            actions.append(
                MaintenanceAction(
                    "build_bloom_index",
                    f"{missing} live (file, column) pair(s) lack bloom sidecars",
                    {"missing": missing, "columns": list(policy.bloom_index_columns)},
                )
            )
    return actions


def _is_hudi_mor(root: Path) -> bool:
    hoodie = root / ".hoodie"
    return hoodie.is_dir() and any(hoodie.glob("*.deltacommit"))


def _plan_hudi(root: Path, policy: MaintenancePolicy) -> list[MaintenanceAction]:
    # merge-on-read timelines route to the MoR cleaner (the CoW reader
    # refuses them); slice resolution there already encodes compaction
    # supersession, so pre-compaction bases AND their logs reclaim
    actions: list[MaintenanceAction] = []
    if _is_hudi_mor(root):
        from ..sources.hudi_mor import HudiMorTable

        t = HudiMorTable(root)
        # merge-on-read read debt: every dirty group pays its log
        # decode + key merge per snapshot read until compaction
        dirty = [
            fid
            for fid, _p, _b, logs in t.file_slices(t.latest_instant())
            if logs
        ]
        if len(dirty) >= policy.max_dirty_mor_groups:
            actions.append(
                MaintenanceAction(
                    "mor_compact",
                    f"{len(dirty)} file group(s) carry pending log files "
                    f"(threshold {policy.max_dirty_mor_groups})",
                    {"dirty_groups": len(dirty)},
                )
            )
        # bucket-index width debt: O(groups) driver stat of slice
        # file sizes, no data read
        if policy.max_mor_group_bytes:
            sizes = sorted(
                Path(b).stat().st_size + sum(Path(p).stat().st_size for p, _v in logs)
                for _fid, _p, b, logs in t.file_slices(t.latest_instant())
            )
            if sizes:
                p95 = sizes[min(len(sizes) - 1, int(0.95 * len(sizes)))]
                if p95 > policy.max_mor_group_bytes:
                    actions.append(
                        MaintenanceAction(
                            "mor_resize_buckets",
                            f"p95 file-group size {p95} exceeds "
                            f"{policy.max_mor_group_bytes} — double the bucket "
                            "count (clustering replacecommit)",
                            {"p95_group_bytes": p95, "groups": len(sizes)},
                        )
                    )
    else:
        from ..sources.hudi import HudiError, HudiTable

        t = HudiTable(root)
        # CoW small-file debt: enough under-threshold file groups in
        # one partition make CLUSTERING due (Hudi's replacecommit
        # layout optimizer — the trio twin of Iceberg bin-pack /
        # Delta OPTIMIZE)
        from collections import defaultdict

        try:
            by_part: dict[str, int] = defaultdict(int)
            for _fid, part, path in t.live_file_groups():
                if Path(path).stat().st_size < policy.small_file_bytes:
                    by_part[part] += 1
            worst = max(by_part.values(), default=0)
            if worst >= policy.min_small_files:
                actions.append(
                    MaintenanceAction(
                        "hudi_cluster",
                        f"{worst} file group(s) under "
                        f"{policy.small_file_bytes >> 20} MiB share a partition "
                        f"(threshold {policy.min_small_files})",
                        {"small_groups_worst_partition": worst},
                    )
                )
        except HudiError:
            pass
    res = t.clean(retain_commits=policy.hudi_retain_commits, dry_run=True)
    if res["deleted"]:
        actions.append(
            MaintenanceAction(
                "clean",
                f"{len(res['deleted'])} superseded slice/log version(s) beyond "
                f"the last {policy.hudi_retain_commits} commits",
                {"reclaimable": len(res["deleted"])},
            )
        )
    return actions


def _now_ms() -> int:
    return int(time.time() * 1000)


def plan_maintenance(
    table_path: str | Path, policy: MaintenancePolicy | None = None
) -> list[MaintenanceAction]:
    """Read-only inspection: which maintenance the policy says is due,
    each with the metadata evidence that triggered it."""
    from ..sources.delta import is_delta_layout
    from ..sources.hudi import is_hudi_layout
    from ..sources.iceberg import is_iceberg_layout

    root = Path(table_path)
    policy = policy or MaintenancePolicy()
    # Delta FIRST: a UniForm table (DeltaDestination uniform="iceberg")
    # carries Iceberg metadata/ INSIDE the Delta root and satisfies
    # both layout probes — but Delta OWNS the data files, and
    # Iceberg-side expire_snapshots would delete root-local files
    # still referenced by retained Delta versions (breaking Delta time
    # travel/CDF ahead of Delta's own vacuum retention). Real UniForm
    # forbids Iceberg-side maintenance for exactly this reason.
    if is_delta_layout(root):
        return _plan_delta(root, policy)
    if is_iceberg_layout(root):
        return _plan_iceberg(root, policy)
    if is_hudi_layout(root) or _is_hudi_mor(root):
        return _plan_hudi(root, policy)
    raise ValueError(f"{root} is not a recognized table layout")


def run_maintenance(
    spark: SparkSession,
    table_path: str | Path,
    policy: MaintenancePolicy | None = None,
) -> dict:
    """Plan, then execute each due action through the format's
    maintenance op. Returns {planned: [...], results: {action: ...}};
    an empty plan executes nothing (idempotent on a schedule)."""
    from ..sources.delta import DeltaFixtureWriter, DeltaTable, is_delta_layout
    from ..sources.hudi import HudiTable, is_hudi_layout
    from ..sources.iceberg import IcebergFixtureWriter, IcebergTable, is_iceberg_layout

    root = Path(table_path)
    policy = policy or MaintenancePolicy()
    plan = plan_maintenance(root, policy)
    results: dict[str, object] = {}
    # same dispatch order as plan_maintenance: Delta before Iceberg,
    # so a UniForm root (both layouts) only ever runs DELTA-side
    # maintenance — Iceberg expire/orphan removal on a Delta-owned
    # root would delete files retained Delta versions still reference
    for act in plan:
        if is_delta_layout(root):
            w = DeltaFixtureWriter(root)
            if act.action == "reorg_purge":
                results[act.action] = w.reorg_purge(spark)
            elif act.action == "optimize_small_files":
                results[act.action] = w.optimize_small_files(
                    spark,
                    small_bytes=policy.small_file_bytes,
                    target_bytes=policy.target_file_bytes,
                )
            elif act.action == "vacuum":
                results[act.action] = DeltaTable(root).vacuum(
                    retention_ms=policy.retention_ms
                )
            elif act.action == "checkpoint_and_clean_log":
                v = w.checkpoint()
                removed = w.clean_log(before_version=v)
                results[act.action] = {"checkpoint": v, "cleaned": removed}
            elif act.action == "build_bloom_index":
                t_d = DeltaTable(root)
                results[act.action] = _build_blooms(
                    t_d, spark, policy.bloom_index_columns
                )
        elif is_iceberg_layout(root):
            if act.action == "rewrite_small_files":
                w = IcebergFixtureWriter(root)
                results[act.action] = w.rewrite_small_files(
                    spark,
                    small_bytes=policy.small_file_bytes,
                    target_bytes=policy.target_file_bytes,
                )
            elif act.action == "rewrite_position_deletes":
                w = IcebergFixtureWriter(root)
                results[act.action] = w.rewrite_position_deletes()
            elif act.action == "expire_snapshots":
                results[act.action] = IcebergTable(root).expire_snapshots(
                    keep_last=policy.max_snapshots, delete_orphans=True
                )
            elif act.action == "remove_orphan_files":
                results[act.action] = IcebergTable(root).remove_orphan_files(
                    older_than_ms=_now_ms() - policy.retention_ms
                )
            elif act.action == "build_bloom_index":
                t_i = IcebergTable(root)
                results[act.action] = _build_blooms(
                    t_i, spark, policy.bloom_index_columns
                )
        elif is_hudi_layout(root) or _is_hudi_mor(root):
            if act.action == "mor_compact":
                from ..sources.hudi_mor import HudiMorFixtureWriter

                props = {}
                for line in (
                    (root / ".hoodie" / "hoodie.properties").read_text().splitlines()
                ):
                    if "=" in line:
                        k, v = line.split("=", 1)
                        props[k.strip()] = v.strip()
                w_mor = HudiMorFixtureWriter(
                    root,
                    record_key=props["hoodie.table.recordkey.fields"],
                    precombine=props.get("hoodie.table.precombine.field"),
                    n_buckets=int(props.get("hoodie.index.bucket.num", "4")),
                    partition_by=[
                        c
                        for c in props.get("hoodie.table.partition.fields", "").split(",")
                        if c
                    ],
                )
                results[act.action] = {"instant": w_mor.compact(spark)}
            elif act.action == "mor_resize_buckets":
                from ..sources.hudi_mor import HudiMorFixtureWriter

                props = {}
                for line in (
                    (root / ".hoodie" / "hoodie.properties").read_text().splitlines()
                ):
                    if "=" in line:
                        k, v = line.split("=", 1)
                        props[k.strip()] = v.strip()
                w_mor = HudiMorFixtureWriter(
                    root,
                    record_key=props["hoodie.table.recordkey.fields"],
                    precombine=props.get("hoodie.table.precombine.field"),
                    partition_by=[
                        c
                        for c in props.get("hoodie.table.partition.fields", "").split(",")
                        if c
                    ],
                )  # constructor adopts (count, generation) from properties
                results[act.action] = {
                    "instant": w_mor.resize_buckets(spark, w_mor.n_buckets * 2),
                    "n_buckets": w_mor.n_buckets,
                }
            elif act.action == "hudi_cluster":
                from ..sources.hudi import HudiFixtureWriter

                results[act.action] = HudiFixtureWriter(root).cluster_small_file_groups(
                    spark,
                    small_bytes=policy.small_file_bytes,
                    target_bytes=policy.target_file_bytes,
                    min_small_groups=policy.min_small_files,
                )
            elif act.action == "clean":
                if _is_hudi_mor(root):
                    from ..sources.hudi_mor import HudiMorTable

                    results[act.action] = HudiMorTable(root).clean(
                        retain_commits=policy.hudi_retain_commits
                    )
                else:
                    results[act.action] = HudiTable(root).clean(
                        retain_commits=policy.hudi_retain_commits
                    )
    return {
        "planned": [
            {"action": a.action, "reason": a.reason, "evidence": a.evidence} for a in plan
        ],
        "results": results,
    }
