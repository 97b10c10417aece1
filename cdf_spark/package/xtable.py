"""Cross-format METADATA translation (Apache XTable / Delta UniForm).

A table's data is parquet either way; what makes it "a Delta table" or
"an Iceberg table" is metadata. Translation is therefore a
METADATA-ONLY operation: write the other format's manifests/log
pointing at the SAME data files in place — no rewrite, no copy, O(live
files) metadata work regardless of data size. That is Apache XTable's
premise and Delta UniForm's implementation (Iceberg metadata generated
alongside the Delta log over shared parquet).

Contrast with `cross_format_replication` (operators/effects.py
consumers): replication moves ROWS through a changelog — O(data),
needed when the target must own its files. Translation shares files —
O(metadata), the right call when one engine just needs to READ the
other's table.

Refusal posture (detect-and-refuse, same as the MoR and column-mapping
readers): translation is only honest when the target format can
express the source's CURRENT snapshot losslessly from the shared
files alone —
- Delta deletion vectors / Iceberg delete files: merge-on-read state
  lives in format-specific sidecars the other format cannot read.
  Compact first (REORG PURGE / rewrite_position_deletes + overwrite),
  then translate.
- Column mapping (Delta) / renamed Iceberg fields: physical parquet
  names differ from the logical schema; linking would expose physical
  names. Refused.
- Partitioned sources: both formats omit identity-partition columns
  from data files in their hive-ish layouts, so linked files would
  lose columns. Refused (a follow-up could reconstitute metadata-only
  partition columns).

Reference frame: the reference's destination protocol moves verified
ROWS (crates/cdf-kernel/src/destination.rs); metadata translation is
beyond-ref surface.
"""

from __future__ import annotations

from pathlib import Path

from ..sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable
from ..sources.iceberg import IcebergError, IcebergFixtureWriter, IcebergTable

__all__ = [
    "delta_to_iceberg",
    "hudi_to_iceberg",
    "iceberg_to_delta",
    "iceberg_to_hudi",
    "sync_delta_to_iceberg",
]


def delta_to_iceberg(delta_root: str | Path, iceberg_root: str | Path) -> dict:
    """Expose a Delta table's CURRENT version as an Iceberg table over
    the same parquet files (UniForm direction). Returns
    {delta_version, iceberg_snapshot_id, files_linked}."""
    dt = DeltaTable(delta_root)
    v = dt.current_version()
    if dt._cm_mode(v) != "none":
        raise DeltaError(
            "delta_to_iceberg: column-mapped tables carry physical "
            "col-<uuid> parquet names — translation would expose them; refused"
        )
    if dt.partition_columns(v):
        raise DeltaError(
            "delta_to_iceberg: partitioned Delta omits partition columns "
            "from data files; linking would lose them — refused"
        )
    adds = dt.live_adds(v)
    dv_files = [p for p, dv, _pv in adds if dv is not None]
    if dv_files:
        raise DeltaError(
            f"delta_to_iceberg: {len(dv_files)} live file(s) carry deletion "
            "vectors (Delta-physical merge-on-read state); run REORG PURGE "
            "first, then translate"
        )
    files = [p for p, _dv, _pv in adds]
    w = IcebergFixtureWriter(iceberg_root)
    sid = w.link_files(files)
    return {
        "delta_version": v,
        "iceberg_snapshot_id": sid,
        "files_linked": len(files),
    }


def sync_delta_to_iceberg(delta_root: str | Path, iceberg_root: str | Path) -> dict:
    """CONTINUOUS UniForm sync: one Iceberg snapshot PER Delta commit,
    not a point-in-time export — the translated table keeps the
    source's whole history, so Iceberg time travel lands on the same
    states as Delta time travel (each Iceberg commit is stamped with
    its Delta commit's timestamp). Idempotent and resumable: a durable
    cursor (`xtable_sync.json` beside the Iceberg metadata) records
    the last synced Delta version; re-running syncs only the new
    commits, O(new commits) metadata work.

    Per-commit mapping: adds-only Delta commit -> Iceberg append
    linking the NEW files; any commit with removes (overwrite, delete,
    compaction) -> Iceberg overwrite linking that version's live set;
    metadata-only commits advance the cursor without a snapshot;
    DV-carrying versions are SKIPPED with a recorded gap (linking
    cannot express Delta-physical sidecars) and the translated table
    stays at the last representable state — `stale` in the return
    value flags when that is still the case at the sync head."""
    import json

    dt = DeltaTable(delta_root)
    cur = dt.current_version()
    state_path = Path(iceberg_root) / "xtable_sync.json"
    last = -1
    if state_path.exists():
        last = int(json.loads(state_path.read_text())["last_delta_version"])
    if dt._cm_mode(cur) != "none":
        raise DeltaError("sync_delta_to_iceberg: column-mapped tables refused")
    if dt.partition_columns(cur):
        raise DeltaError("sync_delta_to_iceberg: partitioned tables refused")
    w = IcebergFixtureWriter(iceberg_root)
    synced = []
    for v in range(last + 1, cur + 1):
        if any(dv for _p, dv, _pv in dt.live_adds(v)):
            # a DV-carrying state cannot be expressed by linking (the
            # DVs are Delta-physical sidecars) — SKIP it with a recorded
            # gap rather than wedging the sync forever: the translated
            # table stays at the last representable state until a
            # DV-free commit (REORG PURGE, a later overwrite) arrives,
            # whose live set then lands as one overwrite. If the
            # CURRENT version still carries DVs when the sync ends,
            # that staleness is surfaced in the return value.
            synced.append(
                {
                    "delta_version": v,
                    "iceberg_snapshot_id": None,
                    "skipped": "deletion-vectors",
                }
            )
            state_path.write_text(json.dumps({"last_delta_version": v}))
            continue
        actions = dt.actions(v)
        adds = [a["add"] for a in actions if "add" in a]
        removes = [a for a in actions if "remove" in a]
        ts = dt.commit_timestamp_ms(v)
        if adds and not removes:
            sid = w.link_files(
                [dt._resolve(a["path"]) for a in adds], timestamp_ms=ts
            )
        elif removes:
            sid = w.replace_files(
                dt.files_for_version(v), timestamp_ms=ts, copy=False
            )
        else:
            sid = None  # metadata-only commit: cursor advances, no snapshot
        synced.append({"delta_version": v, "iceberg_snapshot_id": sid})
        state_path.write_text(json.dumps({"last_delta_version": v}))
    # stale = a skipped (unrepresentable) version is newer than the
    # last landed snapshot — the translated table lags the source
    last_landed = max(
        (i for i, e in enumerate(synced) if e["iceberg_snapshot_id"] is not None),
        default=-1,
    )
    last_skipped = max(
        (i for i, e in enumerate(synced) if e.get("skipped") is not None),
        default=-1,
    )
    return {
        "synced": synced,
        "last_delta_version": cur,
        "stale": last_skipped > last_landed,
    }


def hudi_to_iceberg(hudi_root: str | Path, iceberg_root: str | Path) -> dict:
    """Expose a Hudi COPY-ON-WRITE table's latest instant as an
    Iceberg table over the same parquet files (the XTable Hudi leg).
    CoW file slices are plain parquet carrying ALL columns (Hudi keeps
    partition columns in the data files, unlike Delta/Iceberg hive
    layouts), so even partitioned tables link losslessly. Merge-on-read
    tables refuse at the reader layer (`HudiTable` rejects
    .deltacommit timelines — log blocks are Hudi-physical sidecars).
    Returns {hudi_instant, iceberg_snapshot_id, files_linked}."""
    from ..sources.hudi import HudiTable

    ht = HudiTable(hudi_root)  # raises HudiError on a MoR timeline
    instant = ht.latest_instant()
    files = ht.files_for_instant(instant)
    w = IcebergFixtureWriter(iceberg_root)
    sid = w.link_files(files)
    return {
        "hudi_instant": instant,
        "iceberg_snapshot_id": sid,
        "files_linked": len(files),
    }


def iceberg_to_hudi(iceberg_root: str | Path, hudi_root: str | Path) -> dict:
    """Expose an Iceberg table's CURRENT snapshot as a Hudi
    copy-on-write table over the same parquet files — completes the
    any-to-any translation matrix (D→I, I→D, H→I, I→H; D→H composes
    as D→I→H since both are metadata-only). Same refusals as
    `iceberg_to_delta` (delete files, partition specs).
    Returns {iceberg_snapshot_id, hudi_instant, files_linked}."""
    from ..sources.hudi import HudiFixtureWriter

    t = IcebergTable(iceberg_root)
    sid = t.current_snapshot_id()
    if sid is None:
        raise IcebergError("iceberg_to_hudi: empty table has no snapshot")
    if t.delete_files_for_snapshot(sid):
        raise IcebergError(
            "iceberg_to_hudi: the snapshot carries row-level delete files; "
            "compact them away first"
        )
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    if default_spec.get("fields"):
        raise IcebergError("iceberg_to_hudi: partitioned Iceberg refused")
    files = t.files_for_snapshot(sid)
    w = HudiFixtureWriter(hudi_root)
    instant = w.link_files(files)
    return {
        "iceberg_snapshot_id": sid,
        "hudi_instant": instant,
        "files_linked": len(files),
    }


def iceberg_to_delta(iceberg_root: str | Path, delta_root: str | Path) -> dict:
    """Expose an Iceberg table's CURRENT snapshot as a Delta table over
    the same parquet files (XTable direction). Returns
    {iceberg_snapshot_id, delta_version, files_linked}."""
    t = IcebergTable(iceberg_root)
    sid = t.current_snapshot_id()
    if sid is None:
        raise IcebergError("iceberg_to_delta: empty table has no snapshot")
    if t.delete_files_for_snapshot(sid):
        raise IcebergError(
            "iceberg_to_delta: the snapshot carries row-level delete files "
            "(merge-on-read state Delta cannot read); compact them away "
            "(rewrite_position_deletes / overwrite) first"
        )
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    if default_spec.get("fields"):
        raise IcebergError(
            "iceberg_to_delta: partitioned Iceberg may omit identity "
            "partition columns from data files; linking would lose them — refused"
        )
    files = t.files_for_snapshot(sid)
    w = DeltaFixtureWriter(delta_root)
    v = w.link_files(files)
    return {
        "iceberg_snapshot_id": sid,
        "delta_version": v,
        "files_linked": len(files),
    }
