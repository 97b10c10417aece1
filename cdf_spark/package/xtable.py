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
- Partitioned sources (Delta <-> Iceberg): both formats omit
  identity-partition columns from data files in their hive-ish
  layouts, but both CARRY the values in metadata (Delta
  add.partitionValues, Iceberg manifest partition records) — so
  translation reconstitutes them METADATA-ONLY: Delta partitionValues
  become Iceberg identity-spec partition records (the Flink-writer
  metadata-only shape the Iceberg reader already reconstitutes), and
  Iceberg partition records become add.partitionValues (from which
  the Delta reader reconstitutes literal columns for linked files).
  This is the mapping Apache XTable ships. Non-identity Iceberg
  transforms still refuse — a derived value (bucket/truncate/year)
  cannot reconstitute its source column.

Reference frame: the reference's destination protocol moves verified
ROWS (crates/cdf-kernel/src/destination.rs); metadata translation is
beyond-ref surface.
"""

from __future__ import annotations

from pathlib import Path

from ..sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable
from ..sources.iceberg import IcebergError, IcebergFixtureWriter, IcebergTable

__all__ = [
    "delta_to_hudi",
    "delta_to_iceberg",
    "hudi_mor_to_delta",
    "hudi_mor_to_iceberg",
    "hudi_to_delta",
    "hudi_to_iceberg",
    "iceberg_to_delta",
    "iceberg_to_hudi",
    "sync_delta_to_hudi",
    "sync_delta_to_iceberg",
    "sync_hudi_to_delta",
    "sync_hudi_to_iceberg",
    "sync_iceberg_to_delta",
    "sync_iceberg_to_hudi",
]

# Spark schemaString type-name <-> Iceberg primitive type, for carrying
# a declared logical schema (incl. partition columns the data files
# omit) across the translation boundary. Only the types both formats
# express losslessly; anything else refuses rather than corrupting.
_SPARK_TO_ICE = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
}
_ICE_TO_SPARK = {v: k for k, v in _SPARK_TO_ICE.items()}
_ICE_TO_SPARK["timestamptz"] = "timestamp"


def _delta_schema_to_ice_fields(dt: "DeltaTable", version: int) -> list[tuple[str, str]]:
    """Delta schemaString -> ordered (name, iceberg_type) pairs."""
    import json

    ss = dt.metadata_for_version(version).get("schemaString")
    fields = []
    for f in json.loads(ss).get("fields", []):
        t = f.get("type")
        if not isinstance(t, str) or t not in _SPARK_TO_ICE:
            raise DeltaError(
                f"column {f.get('name')!r} has type {t!r} which translation "
                "does not carry losslessly — refused"
            )
        fields.append((f["name"], _SPARK_TO_ICE[t]))
    return fields


def _ice_schema_to_delta_string(t: "IcebergTable") -> str:
    """Iceberg current schema -> Delta schemaString JSON (declared
    column order preserved)."""
    import json

    cur = next(
        (
            s
            for s in t._meta.get("schemas", [])
            if s.get("schema-id", 0) == int(t._meta.get("current-schema-id", 0))
        ),
        {"fields": []},
    )
    out = []
    for f in cur.get("fields", []):
        ice_t = str(f.get("type") or "")
        if ice_t not in _ICE_TO_SPARK:
            raise IcebergError(
                f"column {f.get('name')!r} has iceberg type {ice_t!r} which "
                "translation does not carry losslessly — refused"
            )
        out.append(
            {
                "name": f["name"],
                "type": _ICE_TO_SPARK[ice_t],
                "nullable": True,
                "metadata": {},
            }
        )
    return json.dumps({"type": "struct", "fields": out})


def _ice_partition_to_delta_string(v, ice_type: str):
    """Iceberg partition-record single-value -> Delta partitionValues
    STRING (date: days-since-epoch int -> ISO; numbers/strings: str)."""
    import datetime as _dt

    if v is None:
        return None
    if ice_type == "date" and isinstance(v, int):
        return (_dt.date(1970, 1, 1) + _dt.timedelta(days=v)).isoformat()
    if ice_type in ("timestamp", "timestamptz"):
        raise IcebergError(
            "timestamp partition columns are not carried across translation "
            "(protocol string form is writer-dependent) — refused"
        )
    return str(v)


def _identity_spec_fields(t: "IcebergTable") -> list[tuple[str, str]]:
    """Default-spec fields as (column, iceberg_type), refusing
    non-identity transforms (derived values cannot reconstitute their
    source column)."""
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    cur = next(
        (
            s
            for s in t._meta.get("schemas", [])
            if s.get("schema-id", 0) == int(t._meta.get("current-schema-id", 0))
        ),
        {"fields": []},
    )
    by_id = {int(f["id"]): f for f in cur.get("fields", [])}
    out = []
    for pf in default_spec.get("fields", []):
        if pf.get("transform") != "identity":
            raise IcebergError(
                f"partition transform {pf.get('transform')!r} is not identity — "
                "a derived partition value cannot reconstitute its source "
                "column; refused"
            )
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is None:
            raise IcebergError("partition spec references an unknown field id")
        out.append((src["name"], str(src.get("type") or "")))
    return out



def _derivable_spec_fields(t: "IcebergTable") -> list[dict]:
    """Default-spec fields the DELTA leg can translate: identity plus
    the time transforms whose values are pure derivable functions of a
    DATE source column (year/month/day) — a translated reader can
    reconstitute the partition column from add.partitionValues AND
    recompute it from the source column via the recorded Delta
    generated-column expression, so nothing is writer-dependent.
    bucket (murmur3, engine-internal), truncate (reverse leg
    underivable), hour, and time transforms over TIMESTAMP sources
    (protocol string form writer-dependent, same refusal as identity
    timestamps) still refuse. Returns dicts
    {pcol, src, transform, ice_type} — pcol is the Delta partition
    column (the spec field name for derived transforms, the source
    column for identity)."""
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    cur = next(
        (
            s
            for s in t._meta.get("schemas", [])
            if s.get("schema-id", 0) == int(t._meta.get("current-schema-id", 0))
        ),
        {"fields": []},
    )
    by_id = {int(f["id"]): f for f in cur.get("fields", [])}
    out = []
    for pf in default_spec.get("fields", []):
        tr = str(pf.get("transform") or "identity")
        src = by_id.get(int(pf.get("source-id", -1)))
        if src is None:
            raise IcebergError("partition spec references an unknown field id")
        ice_type = str(src.get("type") or "")
        if tr == "identity":
            out.append(
                {"pcol": src["name"], "src": src["name"], "transform": tr, "ice_type": ice_type}
            )
            continue
        if tr in ("year", "month", "day") and ice_type == "date":
            out.append(
                {
                    "pcol": str(pf.get("name") or f"{src['name']}_{tr}"),
                    "src": src["name"],
                    "transform": tr,
                    "ice_type": ice_type,
                }
            )
            continue
        raise IcebergError(
            f"partition transform {tr!r} over {ice_type!r} is not derivable "
            "by a translated reader (bucket is engine-internal murmur3; "
            "truncate cannot reverse; timestamp string forms are "
            "writer-dependent); refused"
        )
    return out


# Delta generated-column expression + protocol value per derivable
# time transform (the generation expression is the standard Spark SQL
# a real Delta reader would evaluate; the partition VALUE is what the
# linked-file reader reconstitutes from add.partitionValues)
def _derived_delta_field(pcol: str, src: str, transform: str) -> dict:
    exprs = {
        "day": (f"CAST({src} AS DATE)", "date"),
        "year": (f"year({src})", "integer"),
        "month": (f"(year({src}) - 1970) * 12 + month({src}) - 1", "integer"),
    }
    expr, dtype = exprs[transform]
    return {
        "name": pcol,
        "type": dtype,
        "nullable": True,
        "metadata": {"delta.generationExpression": expr},
    }


def _derived_partition_value(v, transform: str, ice_type: str):
    """Iceberg partition-record value of a derivable transform ->
    Delta partitionValues protocol string."""
    import datetime as _dt

    if v is None:
        return None
    if transform == "identity":
        return _ice_partition_to_delta_string(v, ice_type)
    if transform == "day":
        return (_dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))).isoformat()
    # year: years since 1970 -> calendar year; month: keep the spec's
    # months-since-1970 ordinal (matches the recorded generation expr)
    if transform == "year":
        return str(1970 + int(v))
    return str(int(v))


def _iceberg_live_set(iceberg_root: str | Path) -> set[str]:
    """Current live data files of a (possibly empty) Iceberg target —
    the crash-resume idempotence probe: every sync writes its cursor
    AFTER the target commit, so a crash between the two re-offers the
    same source commit on resume. Re-LINKING an append would duplicate
    rows; the guard detects files already live (paths are unique per
    source commit) and advances the cursor instead. O(live files)
    driver metadata, no data read."""
    try:
        t = IcebergTable(iceberg_root)
        sid = t.current_snapshot_id()
        return set(t.files_for_snapshot(sid)) if sid is not None else set()
    except Exception:
        return set()


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
    adds = dt.live_adds(v)
    dv_files = [p for p, dv, _pv in adds if dv is not None]
    if dv_files:
        raise DeltaError(
            f"delta_to_iceberg: {len(dv_files)} live file(s) carry deletion "
            "vectors (Delta-physical merge-on-read state); run REORG PURGE "
            "first, then translate"
        )
    files = [p for p, _dv, _pv in adds]
    pcols = dt.partition_columns(v)
    if not pcols:
        w = IcebergFixtureWriter(iceberg_root)
        sid = w.link_files(files)
    else:
        # Partitioned: the data files omit the partition columns, but
        # add.partitionValues carries them — reconstitute METADATA-ONLY
        # as an identity spec whose manifest partition records hold the
        # typed values (the Flink-writer metadata-only shape the
        # Iceberg reader reconstitutes as per-group constants).
        w = IcebergFixtureWriter(
            iceberg_root, partition_by=list(pcols), omit_partition_cols=True
        )
        w.declare_schema(_delta_schema_to_ice_fields(dt, v))
        sid = w.link_files(files, partition_values=[pv for _p, _dv, pv in adds])
    return {
        "delta_version": v,
        "iceberg_snapshot_id": sid,
        "files_linked": len(files),
        "partition_columns": list(pcols),
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
    pcols = dt.partition_columns(cur)
    if not pcols:
        w = IcebergFixtureWriter(iceberg_root)
    else:
        w = IcebergFixtureWriter(
            iceberg_root, partition_by=list(pcols), omit_partition_cols=True
        )
        if not w._schemas:  # first sync declares; resume rehydrates
            w.declare_schema(_delta_schema_to_ice_fields(dt, cur))
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
            files = [dt._resolve(a["path"]) for a in adds]
            live_now = _iceberg_live_set(iceberg_root)
            if files and all(f in live_now for f in files):
                # crash-resume: this commit's files already linked
                # (the crash hit between target commit and cursor
                # write) — re-linking would DUPLICATE rows
                sid = int(IcebergTable(iceberg_root).current_snapshot_id())
            else:
                sid = w.link_files(
                    files,
                    timestamp_ms=ts,
                    partition_values=(
                        [a.get("partitionValues") or {} for a in adds] if pcols else None
                    ),
                )
        elif removes:
            live = dt.live_adds(v)
            sid = w.replace_files(
                [p for p, _dv, _pv in live],
                timestamp_ms=ts,
                copy=False,
                partition_values=([pv for _p, _dv, pv in live] if pcols else None),
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


def _mor_ro_slices(hudi_root: str | Path, direction: str):
    """Shared compaction gate for the MoR source legs: resolve the
    latest instant's file slices and REFUSE if any group carries
    un-compacted log deltas — the read-optimized view would silently
    drop those records, and log blocks are Hudi-physical sidecars no
    other format can read. Apache XTable takes exactly this posture
    for MoR sources (sync the read-optimized view; compaction is the
    unlock). Returns (instant, clean slices)."""
    from ..sources.hudi import HudiError
    from ..sources.hudi_mor import HudiMorTable

    t = HudiMorTable(hudi_root)
    instant = t.latest_instant()
    slices = t.file_slices(instant)
    if not slices:
        raise HudiError(f"{direction}: no live file slices to link")
    dirty = sorted(fid for fid, _, _, logs in slices if logs)
    if dirty:
        raise HudiError(
            f"{direction}: {len(dirty)} file group(s) carry un-compacted "
            f"log deltas (e.g. {dirty[:3]}) — the read-optimized view would "
            "drop those records; run compact() on the source table first, "
            "then translate"
        )
    return instant, slices


def hudi_mor_to_delta(hudi_root: str | Path, delta_root: str | Path) -> dict:
    """Expose a COMPACTED Hudi MERGE-ON-READ table's read-optimized
    view as a Delta table over the same base parquet files — the MoR
    source leg of the translation matrix (production Hudi streaming
    tables are overwhelmingly MoR). Compaction-gated: refuses while
    any file group carries pending log deltas (see `_mor_ro_slices`);
    after `compact()` the read-optimized view IS the snapshot view,
    so the translation is lossless. Base files carry every column
    (partition columns included — the MoR writer keeps them in data,
    like CoW) plus Hudi's meta columns (_hoodie_commit_time,
    _hoodie_record_key), which the linked table exposes exactly as
    real XTable-translated tables expose Hudi meta columns. Partition
    values parse from the timeline's hive paths into
    add.partitionValues, so Delta-side pruning works. Returns
    {hudi_instant, delta_version, files_linked, partition_columns}."""
    from urllib.parse import unquote

    from ..sources.partitioned_write import HIVE_NULL

    instant, slices = _mor_ro_slices(hudi_root, "hudi_mor_to_delta")
    pcols: list[str] = []
    first_part = slices[0][1]
    if first_part:
        pcols = [seg.split("=", 1)[0] for seg in first_part.split("/")]
    files = [base for _fid, _part, base, _logs in slices]
    if not pcols:
        w = DeltaFixtureWriter(delta_root)
        v = w.link_files(files)
    else:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        pvs = []
        for _fid, part, _path, _logs in slices:
            pv: dict[str, str | None] = {}
            for seg in part.split("/"):
                c, _, raw = seg.partition("=")
                pv[c] = None if raw == HIVE_NULL else unquote(raw)
            pvs.append(pv)
        w = DeltaFixtureWriter(delta_root, partition_by=pcols)
        # MoR base files carry the partition columns, so the footer
        # schema is already the full logical schema
        w.declare_schema(from_arrow_schema(pq.read_schema(files[0])).json())
        v = w.link_files(files, partition_values=pvs)
    return {
        "hudi_instant": instant,
        "delta_version": v,
        "files_linked": len(files),
        "partition_columns": pcols,
    }


def hudi_mor_to_iceberg(hudi_root: str | Path, iceberg_root: str | Path) -> dict:
    """Expose a COMPACTED Hudi MERGE-ON-READ table's read-optimized
    view as an Iceberg table over the same base parquet files — the
    Iceberg twin of `hudi_mor_to_delta`, same compaction gate, same
    lossless-after-compact premise. Like the CoW leg
    (`hudi_to_iceberg`), files carry all columns so the link is plain
    (Iceberg-side reads are correct; hive-path partition values stay
    Hudi-side). Returns {hudi_instant, iceberg_snapshot_id,
    files_linked}."""
    instant, slices = _mor_ro_slices(hudi_root, "hudi_mor_to_iceberg")
    files = [base for _fid, _part, base, _logs in slices]
    w = IcebergFixtureWriter(iceberg_root)
    sid = w.link_files(files)
    return {
        "hudi_instant": instant,
        "iceberg_snapshot_id": sid,
        "files_linked": len(files),
    }


def iceberg_to_hudi(iceberg_root: str | Path, hudi_root: str | Path) -> dict:
    """Expose an Iceberg table's CURRENT snapshot as a Hudi
    copy-on-write table over the same parquet files (part of the
    direct any-to-any matrix). Same refusals as `iceberg_to_delta`
    for delete files. Partitioned tables translate since r11 WHEN the
    data files carry the partition columns (the regular Iceberg write
    shape): identity partition records become hive partition paths in
    the write stats, so Hudi-side partition pruning works on the
    linked table. The metadata-only (Flink) shape — files OMIT the
    columns — refuses for the Hudi target specifically: Hudi has no
    typed per-file partition record to reconstitute from (translate
    to Delta instead, whose log carries partitionValues). Returns
    {iceberg_snapshot_id, hudi_instant, files_linked,
    partition_columns}."""
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
    if not default_spec.get("fields"):
        files = t.files_for_snapshot(sid)
        w = HudiFixtureWriter(hudi_root)
        instant = w.link_files(files)
        pcols: list[str] = []
    else:
        import pyarrow.parquet as pq

        from ..sources.partitioned_write import HIVE_NULL

        spec_fields = _identity_spec_fields(t)  # refuses derived transforms
        pcols = [c for c, _t in spec_fields]
        typ_of = dict(spec_fields)
        entries = t._data_entries(sid)
        files = [e["path"] for e in entries]
        # check EVERY file's footer, not a sample: one snapshot can mix
        # regular-write files (columns present) with metadata-only
        # Flink-shape files (columns omitted) — linking such a mix
        # would produce a Hudi table whose unchecked files fail or
        # misread at scan time. Footer reads are O(files) metadata,
        # the budget a translation already spends on the entries scan.
        for f in files:
            carried = set(pq.read_schema(f).names)
            missing = [c for c in pcols if c not in carried]
            if missing:
                raise IcebergError(
                    f"iceberg_to_hudi: data file {f} omits partition columns "
                    f"{missing} (the metadata-only identity shape) and Hudi "
                    "has no typed per-file partition record to reconstitute "
                    "them from — refused (translate to Delta instead)"
                )
        ppaths = []
        for e in entries:
            segs = []
            for c in pcols:
                v = _ice_partition_to_delta_string((e["partition"] or {}).get(c), typ_of[c])
                segs.append(f"{c}={HIVE_NULL if v is None else v}")
            ppaths.append("/".join(segs))
        w = HudiFixtureWriter(hudi_root, partition_by=pcols)
        instant = w.link_files(files, partition_paths=ppaths)
    return {
        "iceberg_snapshot_id": sid,
        "hudi_instant": instant,
        "files_linked": len(files),
        "partition_columns": pcols,
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
    if not default_spec.get("fields"):
        files = t.files_for_snapshot(sid)
        w = DeltaFixtureWriter(delta_root)
        v = w.link_files(files)
        pcols: list[str] = []
    else:
        # Partitioned: manifest partition records ->
        # add.partitionValues protocol strings; the Delta reader
        # reconstitutes literal columns for linked files from the log,
        # never from directory names. Identity fields map 1:1;
        # DERIVABLE time transforms (year/month/day over date) land as
        # Delta GENERATED partition columns — the spec field becomes a
        # synthesized column with its generation expression recorded
        # in the schema metadata and its per-file value reconstituted
        # from partitionValues, so Delta-side partition pruning works
        # on the derived column (r12; bucket/truncate still refuse).
        import json as _json

        spec_fields = _derivable_spec_fields(t)
        pcols = [sf_["pcol"] for sf_ in spec_fields]
        entries = t._data_entries(sid)
        files = [e["path"] for e in entries]
        pvs = []
        for e in entries:
            rec = e["partition"] or {}
            pv: dict[str, str | None] = {}
            for sf_ in spec_fields:
                raw = rec.get(sf_["pcol"]) if sf_["transform"] != "identity" else rec.get(sf_["src"])
                pv[sf_["pcol"]] = _derived_partition_value(
                    raw, sf_["transform"], sf_["ice_type"]
                )
            pvs.append(pv)
        schema = _json.loads(_ice_schema_to_delta_string(t))
        for sf_ in spec_fields:
            if sf_["transform"] != "identity":
                schema["fields"].append(
                    _derived_delta_field(sf_["pcol"], sf_["src"], sf_["transform"])
                )
        w = DeltaFixtureWriter(delta_root, partition_by=pcols)
        w.declare_schema(_json.dumps(schema))
        v = w.link_files(files, partition_values=pvs)
    return {
        "iceberg_snapshot_id": sid,
        "delta_version": v,
        "files_linked": len(files),
        "partition_columns": pcols,
    }


def delta_to_hudi(delta_root: str | Path, hudi_root: str | Path) -> dict:
    """Expose a Delta table's CURRENT version as a Hudi copy-on-write
    table over the same parquet files — the DIRECT leg of the
    any-to-any matrix (previously documented as the D→I→H
    composition). Same refusals as `delta_to_iceberg` for column
    mapping and deletion vectors; partitioned Delta additionally
    refuses for the Hudi target specifically: Hudi carries partition
    values only in partition PATHS and expects CoW base files to carry
    the columns, while Delta's hive layout omits them from the files —
    there is no typed per-file partition record to reconstitute from
    on the Hudi side. Returns {delta_version, hudi_instant,
    files_linked}."""
    from ..sources.hudi import HudiFixtureWriter

    dt = DeltaTable(delta_root)
    v = dt.current_version()
    if dt._cm_mode(v) != "none":
        raise DeltaError(
            "delta_to_hudi: column-mapped tables carry physical col-<uuid> "
            "parquet names — translation would expose them; refused"
        )
    if dt.partition_columns(v):
        raise DeltaError(
            "delta_to_hudi: partitioned Delta omits partition columns from "
            "data files and Hudi has no typed per-file partition record to "
            "reconstitute them from — refused (translate to Iceberg instead)"
        )
    adds = dt.live_adds(v)
    dv_files = [p for p, dv, _pv in adds if dv is not None]
    if dv_files:
        raise DeltaError(
            f"delta_to_hudi: {len(dv_files)} live file(s) carry deletion "
            "vectors; run REORG PURGE first, then translate"
        )
    files = [p for p, _dv, _pv in adds]
    w = HudiFixtureWriter(hudi_root)
    instant = w.link_files(files)
    return {
        "delta_version": v,
        "hudi_instant": instant,
        "files_linked": len(files),
    }


def sync_delta_to_hudi(delta_root: str | Path, hudi_root: str | Path) -> dict:
    """CONTINUOUS sync into a Hudi target: one Hudi instant PER Delta
    commit, so the translated table keeps the source's whole history
    and Hudi time travel (instant-addressed) lands on the same states
    as Delta version travel. Same cursor discipline as
    `sync_delta_to_iceberg` (durable `xtable_sync.json` under
    `.hoodie`, idempotent resume, O(new commits) metadata work); the
    same DV-gap semantics (unrepresentable versions skip with a
    recorded gap and `stale` flags a lagging head). Per-commit
    mapping: adds-only -> link commit; any removes -> replacecommit
    linking that version's live set; metadata-only -> cursor only."""
    import json

    from ..sources.hudi import HudiFixtureWriter

    dt = DeltaTable(delta_root)
    cur = dt.current_version()
    if dt._cm_mode(cur) != "none":
        raise DeltaError("sync_delta_to_hudi: column-mapped tables refused")
    if dt.partition_columns(cur):
        raise DeltaError(
            "sync_delta_to_hudi: partitioned Delta refused for the Hudi "
            "target (no typed per-file partition record to reconstitute from)"
        )
    w = HudiFixtureWriter(hudi_root)
    state_path = Path(hudi_root) / ".hoodie" / "xtable_sync.json"
    last = -1
    if state_path.exists():
        last = int(json.loads(state_path.read_text())["last_delta_version"])
    synced = []
    for v in range(last + 1, cur + 1):
        if any(dv for _p, dv, _pv in dt.live_adds(v)):
            synced.append(
                {"delta_version": v, "hudi_instant": None, "skipped": "deletion-vectors"}
            )
            state_path.write_text(json.dumps({"last_delta_version": v}))
            continue
        actions = dt.actions(v)
        adds = [a["add"] for a in actions if "add" in a]
        removes = [a for a in actions if "remove" in a]
        if adds and not removes:
            files = [dt._resolve(a["path"]) for a in adds]
            try:
                from ..sources.hudi import HudiTable as _HT

                ht = _HT(hudi_root)
                live_now = set(ht.files_for_instant(ht.latest_instant()))
            except Exception:
                live_now = set()
            if files and all(f in live_now for f in files):
                instant = ht.latest_instant()  # crash-resume: already linked
            else:
                instant = w.link_files(files)
        elif removes:
            instant = w.replace_with_links(dt.files_for_version(v))
        else:
            instant = None  # metadata-only commit: cursor advances
        synced.append({"delta_version": v, "hudi_instant": instant})
        state_path.write_text(json.dumps({"last_delta_version": v}))
    last_landed = max(
        (i for i, e in enumerate(synced) if e["hudi_instant"] is not None), default=-1
    )
    last_skipped = max(
        (i for i, e in enumerate(synced) if e.get("skipped") is not None), default=-1
    )
    return {
        "synced": synced,
        "last_delta_version": cur,
        "stale": last_skipped > last_landed,
    }


def hudi_to_delta(hudi_root: str | Path, delta_root: str | Path) -> dict:
    """Expose a Hudi COPY-ON-WRITE table's latest instant as a Delta
    table over the same parquet files — the last direct leg: with
    r11's delta_to_hudi this closes the any-to-any matrix natively in
    all six directions. Hudi CoW base files carry ALL columns
    (partition columns included), so even partitioned tables link
    losslessly: partition values parse from the hive partition paths
    the timeline already records, landing as add.partitionValues so
    the Delta side keeps partition pruning. Merge-on-read timelines
    refuse at the reader (`HudiTable` rejects .deltacommit — log
    blocks are Hudi-physical). Returns {hudi_instant, delta_version,
    files_linked, partition_columns}."""
    from urllib.parse import unquote

    from ..sources.hudi import HudiTable
    from ..sources.partitioned_write import HIVE_NULL

    ht = HudiTable(hudi_root)  # raises HudiError on a MoR timeline
    instant = ht.latest_instant()
    groups = ht.live_file_groups(instant)
    if not groups:
        raise DeltaError("hudi_to_delta: no live file groups to link")
    pcols: list[str] = []
    first_part = groups[0][1]
    if first_part:
        pcols = [seg.split("=", 1)[0] for seg in first_part.split("/")]
    files = [path for _fid, _part, path in groups]
    if not pcols:
        w = DeltaFixtureWriter(delta_root)
        v = w.link_files(files)
    else:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        pvs = []
        for _fid, part, _path in groups:
            pv: dict[str, str | None] = {}
            for seg in part.split("/"):
                c, _, raw = seg.partition("=")
                pv[c] = None if raw == HIVE_NULL else unquote(raw)
            pvs.append(pv)
        w = DeltaFixtureWriter(delta_root, partition_by=pcols)
        # CoW files carry the partition columns, so the footer schema
        # is already the full logical schema
        w.declare_schema(from_arrow_schema(pq.read_schema(files[0])).json())
        v = w.link_files(files, partition_values=pvs)
    return {
        "hudi_instant": instant,
        "delta_version": v,
        "files_linked": len(files),
        "partition_columns": pcols,
    }


def sync_iceberg_to_delta(iceberg_root: str | Path, delta_root: str | Path) -> dict:
    """CONTINUOUS sync in the REVERSE direction — one Delta commit per
    Iceberg snapshot on the current ancestry, so both sync directions
    exist (D→I since r10, I→D since r11; Apache XTable ships
    incremental sync both ways). Cursor = the last synced snapshot's
    SEQUENCE NUMBER (snapshot ids are random 64-bit by spec and carry
    no order), durable in `xtable_sync.json` beside the Delta log;
    idempotent resume, O(new snapshots) metadata work. Per snapshot:
    append -> Delta commit LINKING the snapshot's added files;
    anything else (overwrite/replace/delete) -> `replace_with_links`
    of that snapshot's live set; each Delta commit is stamped with the
    Iceberg snapshot's timestamp so timestamp time travel lands on the
    same states. Snapshots carrying row-level delete files cannot be
    expressed by linking — skipped with a recorded gap and a `stale`
    flag, same semantics as the D→I sync's DV gaps. Partitioned
    identity specs carry their partition records as
    add.partitionValues."""
    import json

    t = IcebergTable(iceberg_root)
    cur = t.current_snapshot_id()
    if cur is None:
        raise IcebergError("sync_iceberg_to_delta: empty table has no snapshot")
    state_path = Path(delta_root) / "xtable_sync.json"
    last_seq = -1
    if state_path.exists():
        last_seq = int(json.loads(state_path.read_text())["last_sequence_number"])

    # current ancestry, oldest first (rollbacks abandon branch tips —
    # they must not sync)
    by_id = {int(s["snapshot-id"]): s for s in t._meta.get("snapshots", [])}
    chain = []
    sid = int(cur)
    while sid in by_id:
        s = by_id[sid]
        chain.append(s)
        parent = s.get("parent-snapshot-id")
        if parent is None:
            break
        sid = int(parent)
    chain.reverse()

    spec_fields = []
    pcols: list[str] = []
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    if default_spec.get("fields"):
        # identity + derivable time transforms (year/month/day over
        # date), same generated-column mapping as the direct leg (r12)
        spec_fields = _derivable_spec_fields(t)
        pcols = [sf_["pcol"] for sf_ in spec_fields]

    w = DeltaFixtureWriter(delta_root, partition_by=list(pcols))
    if pcols and w._schema_string is None:
        schema = json.loads(_ice_schema_to_delta_string(t))
        for sf_ in spec_fields:
            if sf_["transform"] != "identity":
                schema["fields"].append(
                    _derived_delta_field(sf_["pcol"], sf_["src"], sf_["transform"])
                )
        w.declare_schema(json.dumps(schema))

    def _pvs(entries: list[dict]) -> list[dict] | None:
        if not pcols:
            return None
        out = []
        for e in entries:
            rec = e["partition"] or {}
            pv: dict[str, str | None] = {}
            for sf_ in spec_fields:
                raw = rec.get(
                    sf_["pcol"] if sf_["transform"] != "identity" else sf_["src"]
                )
                pv[sf_["pcol"]] = _derived_partition_value(
                    raw, sf_["transform"], sf_["ice_type"]
                )
            out.append(pv)
        return out

    synced = []
    for s in chain:
        seq = int(s.get("sequence-number", 0))
        if seq <= last_seq:
            continue
        sid = int(s["snapshot-id"])
        ts = int(s.get("timestamp-ms") or 0) or None
        if t.delete_files_for_snapshot(sid):
            synced.append(
                {
                    "iceberg_snapshot_id": sid,
                    "delta_version": None,
                    "skipped": "row-level-delete-files",
                }
            )
            state_path.write_text(json.dumps({"last_sequence_number": seq}))
            continue
        op = str((s.get("summary") or {}).get("operation", ""))
        entries = t._data_entries(sid)
        if op == "append":
            added = set(t.added_files(sid))
            ents = [e for e in entries if e["path"] in added]
            try:
                dt_probe = DeltaTable(delta_root)
                live_now = set(dt_probe.live_add_actions(dt_probe.current_version()))
            except Exception:
                live_now = set()
            if ents and all(e["path"] in live_now for e in ents):
                v = DeltaTable(delta_root).current_version()  # crash-resume
            elif ents:
                v = w.link_files(
                    [e["path"] for e in ents],
                    timestamp_ms=ts,
                    partition_values=_pvs(ents),
                )
            else:
                v = None  # metadata-only append: cursor advances
        else:
            v = w.replace_with_links(
                [e["path"] for e in entries],
                timestamp_ms=ts,
                partition_values=_pvs(entries),
            )
        synced.append({"iceberg_snapshot_id": sid, "delta_version": v})
        state_path.write_text(json.dumps({"last_sequence_number": seq}))
    last_landed = max(
        (i for i, e in enumerate(synced) if e["delta_version"] is not None), default=-1
    )
    last_skipped = max(
        (i for i, e in enumerate(synced) if e.get("skipped") is not None), default=-1
    )
    return {
        "synced": synced,
        "last_sequence_number": max(
            (int(s.get("sequence-number", 0)) for s in chain), default=last_seq
        ),
        "stale": last_skipped > last_landed,
    }


def sync_hudi_to_iceberg(hudi_root: str | Path, iceberg_root: str | Path) -> dict:
    """CONTINUOUS sync from a HUDI CoW source — one Iceberg snapshot
    per Hudi instant, completing the continuous-sync fan: the
    translated table keeps the whole timeline, so Iceberg time travel
    lands on the same states as Hudi instant travel (each Iceberg
    commit is stamped with the instant's wall-clock meaning where
    parseable). Cursor = the last synced INSTANT string (Hudi instants
    are totally ordered timestamps by construction), durable in
    `xtable_sync.json` beside the Iceberg metadata; idempotent resume,
    O(new instants) metadata work. Per instant: a commit writing only
    NEW file groups -> Iceberg append linking the new base files; a
    commit REWRITING existing groups (CoW upsert) or a replacecommit
    -> Iceberg overwrite linking that instant's live slice set.
    Merge-on-read timelines refuse at the reader, as every Hudi leg
    does."""
    import datetime as _dt
    import json

    from ..sources.hudi import HudiTable

    ht = HudiTable(hudi_root)  # raises HudiError on a MoR timeline
    instants = ht.instants()
    state_path = Path(iceberg_root) / "xtable_sync.json"
    last = ""
    if state_path.exists():
        last = str(json.loads(state_path.read_text())["last_hudi_instant"])
    w = IcebergFixtureWriter(iceberg_root)

    def _instant_ms(i: str) -> int | None:
        try:
            return int(
                _dt.datetime.strptime(i[:17], "%Y%m%d%H%M%S%f")
                .replace(tzinfo=_dt.timezone.utc)
                .timestamp()
                * 1000
            )
        except ValueError:
            return None

    seen_fids: set[str] = set()
    synced = []
    for i in instants:
        written = ht._written_files(i)
        replaced = ht._replaced_fids(i)
        if i <= last:
            seen_fids |= {fid for fid, _i, _p, _part in written}
            continue
        rewrites = bool(replaced) or any(
            fid in seen_fids for fid, _i, _p, _part in written
        )
        ts = _instant_ms(i)
        if not rewrites:
            files = [str(Path(hudi_root) / p) for _f, _i, p, _part in written]
            live_now = _iceberg_live_set(iceberg_root)
            if files and all(f in live_now for f in files):
                sid = int(IcebergTable(iceberg_root).current_snapshot_id())
            else:
                sid = w.link_files(files, timestamp_ms=ts)
        else:
            sid = w.replace_files(
                ht.files_for_instant(i), timestamp_ms=ts, copy=False
            )
        seen_fids |= {fid for fid, _i, _p, _part in written}
        synced.append({"hudi_instant": i, "iceberg_snapshot_id": sid})
        state_path.write_text(json.dumps({"last_hudi_instant": i}))
    return {"synced": synced, "last_hudi_instant": instants[-1]}


def sync_iceberg_to_hudi(iceberg_root: str | Path, hudi_root: str | Path) -> dict:
    """CONTINUOUS sync Iceberg -> Hudi — with `sync_hudi_to_delta`
    this closes the continuous matrix in all SIX directions (every
    ordered pair of {Delta, Iceberg, Hudi} has both point-in-time
    translation and incremental sync). Cursor on the snapshot
    SEQUENCE NUMBER like the I->D sync; appends land as Hudi link
    commits, anything else as a replacecommit linking the live set.
    Same Hudi-target constraint as the point-in-time leg: data files
    must CARRY any partition columns (unpartitioned tables always
    qualify); delete-file snapshots skip with a recorded gap."""
    import json

    from ..sources.hudi import HudiFixtureWriter, HudiTable

    t = IcebergTable(iceberg_root)
    cur = t.current_snapshot_id()
    if cur is None:
        raise IcebergError("sync_iceberg_to_hudi: empty table has no snapshot")
    specs = t._meta.get("partition-specs", [])
    default_spec = next(
        (s for s in specs if s.get("spec-id", 0) == int(t._meta.get("default-spec-id", 0))),
        {"fields": []},
    )
    if default_spec.get("fields"):
        raise IcebergError(
            "sync_iceberg_to_hudi: partitioned Iceberg sync to the Hudi "
            "target is not supported (per-commit partition-path derivation "
            "composes later; use the point-in-time leg or the Delta target)"
        )
    state_path = Path(hudi_root) / ".hoodie" / "xtable_sync.json"
    Path(hudi_root, ".hoodie").mkdir(parents=True, exist_ok=True)
    last_seq = -1
    if state_path.exists():
        last_seq = int(json.loads(state_path.read_text())["last_sequence_number"])
    by_id = {int(s["snapshot-id"]): s for s in t._meta.get("snapshots", [])}
    chain = []
    sid = int(cur)
    while sid in by_id:
        s = by_id[sid]
        chain.append(s)
        parent = s.get("parent-snapshot-id")
        if parent is None:
            break
        sid = int(parent)
    chain.reverse()
    w = HudiFixtureWriter(hudi_root)
    synced = []
    for s in chain:
        seq = int(s.get("sequence-number", 0))
        if seq <= last_seq:
            continue
        sid = int(s["snapshot-id"])
        if t.delete_files_for_snapshot(sid):
            synced.append(
                {
                    "iceberg_snapshot_id": sid,
                    "hudi_instant": None,
                    "skipped": "row-level-delete-files",
                }
            )
            state_path.write_text(json.dumps({"last_sequence_number": seq}))
            continue
        op = str((s.get("summary") or {}).get("operation", ""))
        if op == "append":
            files = t.added_files(sid)
            try:
                ht = HudiTable(hudi_root)
                live_now = set(ht.files_for_instant(ht.latest_instant()))
            except Exception:
                live_now = set()
            if files and all(f in live_now for f in files):
                instant = ht.latest_instant()  # crash-resume guard
            elif files:
                instant = w.link_files(files)
            else:
                instant = None
        else:
            instant = w.replace_with_links(t.files_for_snapshot(sid))
        synced.append({"iceberg_snapshot_id": sid, "hudi_instant": instant})
        state_path.write_text(json.dumps({"last_sequence_number": seq}))
    return {
        "synced": synced,
        "last_sequence_number": max(
            (int(s.get("sequence-number", 0)) for s in chain), default=last_seq
        ),
    }


def sync_hudi_to_delta(hudi_root: str | Path, delta_root: str | Path) -> dict:
    """CONTINUOUS sync Hudi CoW -> Delta — one Delta commit per Hudi
    instant, the sixth and last continuous direction. Cursor on the
    instant string; insert-only commits link the new base files, a
    group-rewriting upsert or replacecommit lands as
    `replace_with_links` of that instant's live slice set. Each Delta
    commit is stamped with the instant's wall-clock meaning where
    parseable. Unpartitioned CoW timelines (partitioned composes via
    the I or point-in-time legs); MoR refuses at the reader."""
    import datetime as _dt
    import json

    from ..sources.hudi import HudiTable

    ht = HudiTable(hudi_root)  # raises HudiError on a MoR timeline
    instants = ht.instants()
    if any(part for i in instants for _f, _i, _p, part in ht._written_files(i)):
        raise DeltaError(
            "sync_hudi_to_delta: partitioned Hudi sync is not supported "
            "(use the point-in-time hudi_to_delta leg, which carries "
            "partition paths)"
        )
    state_path = Path(delta_root) / "xtable_sync.json"
    last = ""
    if state_path.exists():
        last = str(json.loads(state_path.read_text())["last_hudi_instant"])
    w = DeltaFixtureWriter(delta_root)

    def _instant_ms(i: str) -> int | None:
        try:
            return int(
                _dt.datetime.strptime(i[:17], "%Y%m%d%H%M%S%f")
                .replace(tzinfo=_dt.timezone.utc)
                .timestamp()
                * 1000
            )
        except ValueError:
            return None

    seen_fids: set[str] = set()
    synced = []
    for i in instants:
        written = ht._written_files(i)
        replaced = ht._replaced_fids(i)
        if i <= last:
            seen_fids |= {fid for fid, _i, _p, _part in written}
            continue
        rewrites = bool(replaced) or any(
            fid in seen_fids for fid, _i, _p, _part in written
        )
        ts = _instant_ms(i)
        if not rewrites:
            files = [str(Path(hudi_root) / p) for _f, _i, p, _part in written]
            try:
                dt_probe = DeltaTable(delta_root)
                live_now = set(dt_probe.live_add_actions(dt_probe.current_version()))
            except Exception:
                live_now = set()
            if files and all(f in live_now for f in files):
                v = DeltaTable(delta_root).current_version()  # crash-resume
            else:
                v = w.link_files(files, timestamp_ms=ts)
        else:
            v = w.replace_with_links(ht.files_for_instant(i), timestamp_ms=ts)
        seen_fids |= {fid for fid, _i, _p, _part in written}
        synced.append({"hudi_instant": i, "delta_version": v})
        state_path.write_text(json.dumps({"last_hudi_instant": i}))
    return {"synced": synced, "last_hudi_instant": instants[-1]}
