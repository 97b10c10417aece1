"""Hudi merge-on-read table reader: delta-commit timeline, log-file
block decode, per-file-group record merge, compaction supersession —
no Hudi jars.

Completes the Hudi surface next to the copy-on-write reader
(`hudi.py`): `HudiTable` refuses `.deltacommit` timelines honestly;
this module reads them. Reference context: the reference engine has no
Hudi source at all (its table-format surface is Iceberg-only via
DataFusion — `crates/cdf-source-*`), so this is beyond-reference
coverage, built purely from the public Apache Hudi format:

    <root>/.hoodie/hoodie.properties        table type, record key,
                                            precombine field, buckets
    <root>/.hoodie/<instant>.deltacommit    delta commit (JSON;
                                            base-file inserts + log
                                            appends, partitionToWriteStats)
    <root>/.hoodie/<instant>.commit         compaction result (new base
                                            file versions, supersedes logs)
    <root>/<fileId>_<token>_<instant>.parquet          base file version
    <root>/.<fileId>_<baseInstant>.log.<v>_<token>     log file

Log files carry HoodieLogFormat-shaped blocks: `#HUDI#` magic, then
length-framed versioned blocks (Avro data blocks with the writer
schema in the header, delete blocks naming victim keys) — framing
constants follow the public `HoodieLogBlockType` / `HeaderMetadataType`
enums structurally; with no Hudi jars in the image the byte layout is
validated by round-trip + semantics, not against a live Hudi writer
(same honesty boundary as `avro_format.py`'s jar-free container codec).
Record payload semantics are `OverwriteWithLatestAvroPayload` /
`DefaultHoodieRecordPayload`: per record key, the record with the
largest (precombine value, commit instant, arrival order) wins; a
delete tombstone winning removes the key.

Scale design. The timeline and file-slice resolution are tiny
driver-side metadata (same discipline as the Iceberg/Delta/CoW
readers). Data never moves through the driver:

- base files are a plain multi-file parquet scan (Catalyst splits,
  pushdown on the read-optimized path);
- log files are decoded EXECUTOR-side — `binaryFile` source →
  `mapInPandas`, one task per log file;
- the merge runs ONLY over dirty file groups (groups with pending
  logs). Clean groups pass through with zero shuffle; dirty groups pay
  one hash shuffle on the record key (a key lives in exactly one file
  group — Hudi's index invariant — so the merge window never mixes
  groups' rows beyond the hash partitioning). After compaction the
  dirty set is empty and snapshot == read_optimized == pure scan.

At 100 TB the expensive state is bounded by log volume since the last
compaction, exactly as in Hudi itself: compaction is the knob, and
`compact()` here writes real `.commit` supersession the reader prices
in (logs against an older base version are excluded from the slice).

Snapshot-query pushdown honesty: merge-on-read defeats scan-level
predicate pushdown (a log record can move a row into or out of the
predicate's range), so `scan()` reports every predicate as residual
and applies it POST-merge; hive-partition pruning remains safe (a
record's partition is stable under the non-global index) and uses the
same tri-state `_eval_on_values` discipline as the CoW reader.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..expressions.lowering import lower
from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from ..positions import TableSnapshotPosition
from .avro_format import AvroTypeError, _decode, _encode, avro_schema_to_spark
from .hudi import HudiEmptyWindowError, HudiError

MAGIC = b"#HUDI#"

# public HoodieLogBlockType ordinals (structural)
BLOCK_COMMAND = 0
BLOCK_DELETE = 1
BLOCK_CORRUPT = 2
BLOCK_AVRO_DATA = 3

# public HeaderMetadataType ordinals (structural)
HEADER_INSTANT_TIME = 0
HEADER_TARGET_INSTANT_TIME = 1
HEADER_SCHEMA = 2
HEADER_COMMAND_BLOCK_TYPE = 3

LOG_FORMAT_VERSION = 1
DATA_BLOCK_FORMAT_VERSION = 3  # HoodieAvroDataBlock content version

_INSTANT_BASE = 20240101000000000
META_COMMIT_TIME = "_hoodie_commit_time"
META_RECORD_KEY = "_hoodie_record_key"
META_COLS = (META_COMMIT_TIME, META_RECORD_KEY)

_DELETE_RECORD_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecord",
    "fields": [
        {"name": "recordKey", "type": "string"},
        {"name": "partitionPath", "type": "string"},
        {"name": "orderingVal", "type": ["null", "double"]},
    ],
}


# ---------------------------------------------------------------------------
# log block framing


def _write_map(out: io.BytesIO, m: dict[int, str]) -> None:
    out.write(struct.pack(">i", len(m)))
    for k, v in m.items():
        vb = v.encode("utf-8")
        out.write(struct.pack(">i", k))
        out.write(struct.pack(">i", len(vb)))
        out.write(vb)


def _read_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out = {}
    for _ in range(n):
        (k,) = struct.unpack(">i", buf.read(4))
        (ln,) = struct.unpack(">i", buf.read(4))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def encode_block(block_type: int, header: dict[int, str], content: bytes) -> bytes:
    """One framed log block: magic + total length + version + type +
    header map + length-prefixed content + footer map + trailing total
    length (the trailer enables reverse log scans, as in the public
    format)."""
    body = io.BytesIO()
    body.write(struct.pack(">i", LOG_FORMAT_VERSION))
    body.write(struct.pack(">i", block_type))
    _write_map(body, header)
    body.write(struct.pack(">q", len(content)))
    body.write(content)
    _write_map(body, {})  # footer
    payload = body.getvalue()
    total = len(MAGIC) + 8 + len(payload) + 8
    return MAGIC + struct.pack(">q", total) + payload + struct.pack(">q", total)


def decode_blocks(raw: bytes) -> list[tuple[int, dict[int, str], bytes]]:
    """-> [(block_type, header, content)] in write order."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + len(MAGIC)] != MAGIC:
            raise HudiError(f"log corrupt at offset {pos}: bad magic")
        (total,) = struct.unpack_from(">q", raw, pos + len(MAGIC))
        buf = io.BytesIO(raw[pos + len(MAGIC) + 8 : pos + total - 8])
        (ver,) = struct.unpack(">i", buf.read(4))
        if ver != LOG_FORMAT_VERSION:
            raise HudiError(f"unsupported log format version {ver}")
        (btype,) = struct.unpack(">i", buf.read(4))
        header = _read_map(buf)
        (clen,) = struct.unpack(">q", buf.read(8))
        content = buf.read(clen)
        (trailer,) = struct.unpack_from(">q", raw, pos + total - 8)
        if trailer != total:
            raise HudiError("log corrupt: trailer length mismatch")
        out.append((btype, header, content))
        pos += total
    return out


def encode_data_block(schema: dict, rows: list[dict], instant: str) -> bytes:
    content = io.BytesIO()
    content.write(struct.pack(">i", DATA_BLOCK_FORMAT_VERSION))
    content.write(struct.pack(">i", len(rows)))
    for r in rows:
        rec = io.BytesIO()
        _encode(schema, r, rec)
        b = rec.getvalue()
        content.write(struct.pack(">i", len(b)))
        content.write(b)
    header = {HEADER_INSTANT_TIME: instant, HEADER_SCHEMA: json.dumps(schema)}
    return encode_block(BLOCK_AVRO_DATA, header, content.getvalue())


def decode_data_block(header: dict[int, str], content: bytes) -> list[dict]:
    schema = json.loads(header[HEADER_SCHEMA])
    buf = io.BytesIO(content)
    (_ver,) = struct.unpack(">i", buf.read(4))
    (count,) = struct.unpack(">i", buf.read(4))
    rows = []
    for _ in range(count):
        (ln,) = struct.unpack(">i", buf.read(4))
        rows.append(_decode(schema, io.BytesIO(buf.read(ln))))
    return rows


def encode_delete_block(keys: list[tuple[str, str]], instant: str) -> bytes:
    content = io.BytesIO()
    content.write(struct.pack(">i", DATA_BLOCK_FORMAT_VERSION))
    content.write(struct.pack(">i", len(keys)))
    for key, part in keys:
        rec = io.BytesIO()
        _encode(
            _DELETE_RECORD_SCHEMA,
            {"recordKey": key, "partitionPath": part, "orderingVal": None},
            rec,
        )
        b = rec.getvalue()
        content.write(struct.pack(">i", len(b)))
        content.write(b)
    return encode_block(BLOCK_DELETE, {HEADER_INSTANT_TIME: instant}, content.getvalue())


def decode_delete_block(content: bytes) -> list[dict]:
    buf = io.BytesIO(content)
    (_ver,) = struct.unpack(">i", buf.read(4))
    (count,) = struct.unpack(">i", buf.read(4))
    out = []
    for _ in range(count):
        (ln,) = struct.unpack(">i", buf.read(4))
        out.append(_decode(_DELETE_RECORD_SCHEMA, io.BytesIO(buf.read(ln))))
    return out


# ---------------------------------------------------------------------------
# table reader


def _parse_log_name(name: str) -> tuple[str, str, int] | None:
    """'.{fileId}_{baseInstant}.log.{version}_{token}' ->
    (fileId, baseInstant, version)."""
    if not name.startswith(".") or ".log." not in name:
        return None
    head, tail = name.split(".log.", 1)
    head = head[1:]  # leading dot
    if "_" not in head:
        return None
    fid, base_instant = head.rsplit("_", 1)
    ver = tail.split("_", 1)[0]
    try:
        return fid, base_instant, int(ver)
    except ValueError:
        return None


class HudiMorTable:
    """Read-side driver over a Hudi merge-on-read table directory."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.hoodie = self.root / ".hoodie"
        if not self.hoodie.is_dir():
            raise HudiError(f"{self.root} has no .hoodie/ — not a Hudi table")
        props = self.hoodie / "hoodie.properties"
        self.properties: dict[str, str] = {}
        if props.exists():
            for line in props.read_text().splitlines():
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    self.properties[k] = v
        ttype = self.properties.get("hoodie.table.type", "MERGE_ON_READ")
        if ttype != "MERGE_ON_READ":
            raise HudiError(f"table type {ttype}: use HudiTable for copy-on-write")
        self.record_key = self.properties.get("hoodie.table.recordkey.fields", "")
        if not self.record_key or "," in self.record_key:
            raise HudiError(
                "merge-on-read requires exactly one hoodie.table.recordkey.fields "
                f"(got {self.record_key!r}) — the merge is keyed"
            )
        self.precombine = self.properties.get("hoodie.table.precombine.field") or None

    # -- timeline ---------------------------------------------------------
    def instants(self) -> list[str]:
        out = (
            sorted(p.stem for p in self.hoodie.glob("*.deltacommit"))
            + sorted(p.stem for p in self.hoodie.glob("*.commit"))
            + sorted(p.stem for p in self.hoodie.glob("*.replacecommit"))
        )
        if not out:
            raise HudiError(f"no completed commits under {self.hoodie}")
        return sorted(out)

    def latest_instant(self) -> str:
        return self.instants()[-1]

    def instant_as_of(self, instant: str) -> str:
        eligible = [i for i in self.instants() if i <= instant]
        if not eligible:
            raise HudiError(f"no commit at or before instant {instant}")
        return eligible[-1]

    def position(self) -> TableSnapshotPosition:
        return TableSnapshotPosition(snapshot_id=int(self.latest_instant()))

    def _commit_meta(self, instant: str) -> dict:
        for suffix in (".deltacommit", ".commit", ".replacecommit"):
            p = self.hoodie / f"{instant}{suffix}"
            if p.exists():
                return json.loads(p.read_text())
        raise HudiError(f"instant {instant} not in timeline")

    # -- file-slice resolution -------------------------------------------
    def file_slices(
        self, instant: str
    ) -> list[tuple[str, str, str, list[tuple[str, int]]]]:
        """Per file group at/under `instant`:
        (fileId, partitionPath, base_path, [(log_path, version), ...]).
        Base = latest base-parquet version <= instant; logs = log files
        written against THAT base version (logs against an older base
        are superseded by the compaction that produced the newer base)."""
        bases: dict[str, tuple[str, str, str]] = {}  # fid -> (instant, path, part)
        logs: dict[tuple[str, str], list[tuple[str, int]]] = {}
        # replacecommit supersession (clustering / bucket resize): a
        # group listed in partitionToReplaceFileIds at instant r is
        # retired for any base written at or before r — readers drop
        # it without any file being touched (time travel to < r still
        # resolves it)
        replaced_at: dict[str, str] = {}
        for i in self.instants():
            if i > instant:
                continue
            meta = self._commit_meta(i)
            for _part, fids in meta.get("partitionToReplaceFileIds", {}).items():
                for fid in fids:
                    replaced_at[fid] = max(replaced_at.get(fid, ""), i)
            for part, stats in meta.get("partitionToWriteStats", {}).items():
                for st in stats:
                    path = st["path"]
                    name = Path(path).name
                    if name.endswith(".parquet"):
                        prev = bases.get(st["fileId"])
                        if prev is None or i > prev[0]:
                            bases[st["fileId"]] = (i, path, part)
                    else:
                        parsed = _parse_log_name(name)
                        if parsed is None:
                            raise HudiError(f"unrecognized write-stat path {path!r}")
                        fid, base_instant, ver = parsed
                        logs.setdefault((fid, base_instant), []).append((path, ver))
        out = []
        for fid, (base_inst, path, part) in sorted(bases.items()):
            if fid in replaced_at and base_inst <= replaced_at[fid]:
                continue  # retired by a replacecommit at/after its base
            group_logs = sorted(set(logs.get((fid, base_inst), [])), key=lambda pv: pv[1])
            out.append((fid, part, str(self.root / path), [(str(self.root / p), v) for p, v in group_logs]))
        return out

    def clean(self, retain_commits: int = 10, dry_run: bool = False) -> dict:
        """Merge-on-read cleaner, KEEP_LATEST_COMMITS: compaction
        leaves the pre-compaction base AND its log files on disk
        forever without this — a CDC-cadence MoR table's physical size
        is O(log blocks), not O(rows). Keep every base/log a file
        slice of the newest `retain_commits` instants needs (slice
        resolution already encodes compaction supersession: logs
        against an older base are superseded by the newer base);
        delete anything older, record a `.clean` instant. Same policy
        and timeline discipline as the copy-on-write cleaner."""
        instants = self.instants()
        retained = instants[-retain_commits:]
        earliest = retained[0]
        keep: set[str] = set()
        for i in retained:
            for _fid, _part, base, logs in self.file_slices(i):
                keep.add(base)
                keep.update(p for p, _v in logs)
        all_written: list[tuple[str, str]] = []
        for i in instants:
            meta = self._commit_meta(i)
            for _part, stats in meta.get("partitionToWriteStats", {}).items():
                for st in stats:
                    all_written.append((i, str(self.root / st["path"])))
        deleted: list[str] = []
        root_resolved = self.root.resolve()
        for inst, p in sorted(all_written):
            if p in keep or inst >= earliest:
                continue
            try:
                Path(p).resolve().relative_to(root_resolved)
            except ValueError:
                continue  # linked file: lifecycle owned by the source table
            if not Path(p).exists():
                continue  # reclaimed by an earlier clean
            if not dry_run:
                Path(p).unlink(missing_ok=True)
            deleted.append(p)
        if deleted and not dry_run:
            clean_instant = f"{int(self.latest_instant()) + 1:017d}"
            (self.hoodie / f"{clean_instant}.clean").write_text(
                json.dumps(
                    {
                        "earliestCommitToRetain": earliest,
                        "filesDeleted": [
                            str(Path(p).relative_to(self.root)) for p in deleted
                        ],
                    },
                    indent=1,
                )
            )
        return {"deleted": deleted, "earliest_retained": earliest, "dry_run": dry_run}

    def change_stream(
        self,
        spark: SparkSession,
        from_instant: str | None = None,
        to_instant: str | None = None,
    ) -> DataFrame:
        """Row-level CHANGE STREAM from the merge-on-read log itself —
        the third format's CDC replay (Delta has table_changes,
        Iceberg changelog_scan): MoR log blocks ARE the change
        stream, so no derivation is needed at all. Per instant in
        (from, to]: base-writing INSERT commits contribute their
        files' rows as 'upsert'; log data blocks are 'upsert' rows
        and delete blocks 'delete' tombstones (data columns null, the
        record key reconstituted into its table column); COMPACT
        commits contribute nothing (no logical change). Output: data
        columns + `_change_type` + `_instant`."""
        from functools import reduce as _reduce

        instants = self.instants()
        hi = to_instant if to_instant is not None else instants[-1]
        lo = from_instant or ""
        parts: list[DataFrame] = []
        schema_src = self.read_optimized(spark, instant=hi)
        data_cols = [c for c in schema_src.columns]
        key_type = dict(schema_src.dtypes)[self.record_key]
        for i in instants:
            if not (lo < i <= hi):
                continue
            meta = self._commit_meta(i)
            op = str(meta.get("operationType", ""))
            if op in ("COMPACT", "CLUSTER"):
                continue  # layout maintenance: no logical row change
            base_files = [
                str(self.root / st["path"])
                for _part, stats in meta.get("partitionToWriteStats", {}).items()
                for st in stats
                if Path(st["path"]).name.endswith(".parquet")
            ]
            if base_files:
                gone = [p for p in base_files if not Path(p).exists()]
                if gone:
                    raise HudiError(
                        f"base file {gone[0]!r} was cleaned — the change "
                        f"stream for instant {i} is no longer replayable"
                    )
                parts.append(
                    spark.read.parquet(*base_files)
                    .select(*data_cols)
                    .withColumn("_change_type", F.lit("upsert"))
                    .withColumn("_instant", F.lit(i))
                )
        # log blocks once (shared log files carry many instants): the
        # decoder already tags every record with its block's commit
        # time and op — the change stream is a filter + projection.
        # Log files come from the WINDOW's commit metadata, NOT from
        # current file slices: compaction supersedes old logs out of
        # slice resolution, but their blocks are still this window's
        # history (a cleaned log raises, honestly).
        log_paths_set: set[str] = set()
        log_version: dict[str, int] = {}
        for i in instants:
            if not (lo < i <= hi):
                continue
            meta = self._commit_meta(i)
            for _part, stats in meta.get("partitionToWriteStats", {}).items():
                for st in stats:
                    name = Path(st["path"]).name
                    if name.endswith(".parquet"):
                        continue
                    parsed = _parse_log_name(name)
                    if parsed is None:
                        raise HudiError(f"unrecognized write-stat path {st['path']!r}")
                    p_abs = str(self.root / st["path"])
                    if not Path(p_abs).exists():
                        raise HudiError(
                            f"log file {st['path']!r} was cleaned — the change "
                            f"stream for instant {i} is no longer replayable"
                        )
                    log_paths_set.add(p_abs)
                    log_version[p_abs] = parsed[2]
        log_paths = sorted(log_paths_set)
        if log_paths:
            slices = self.file_slices(hi)
            base = spark.read.parquet(*[b for _fid, _part, b, _l in slices])
            recs = _read_log_records(spark, log_paths, log_version, base.schema, hi)
            recs = recs.filter(F.col(META_COMMIT_TIME) > F.lit(lo))
            key_col = F.when(
                F.col("_cdf_op") == "d",
                F.col(META_RECORD_KEY).cast(key_type),
            ).otherwise(F.col(self.record_key))
            proj = [
                key_col.alias(c) if c == self.record_key else F.col(c)
                for c in data_cols
            ]
            parts.append(
                recs.select(
                    *proj,
                    F.when(F.col("_cdf_op") == "d", F.lit("delete"))
                    .otherwise(F.lit("upsert"))
                    .alias("_change_type"),
                    F.col(META_COMMIT_TIME).alias("_instant"),
                )
            )
        if not parts:
            raise HudiEmptyWindowError(
                f"no instants in ({lo!r}, {hi!r}] produced changes"
            )
        return _reduce(lambda a, b: a.unionByName(b), parts)

    def capabilities(self) -> Capability:
        # merge-on-read: predicates cannot be pushed below the merge (a
        # log record can move a row across the predicate boundary), so
        # the capability sheet offers NO filter ops — negotiate routes
        # every predicate to the residual set, applied post-merge
        cap = Capability(projection="exact", filter_ops={}, limit=True)
        cap.position_enforced = True
        return cap

    # -- reads ------------------------------------------------------------
    def read_optimized(self, spark: SparkSession, instant: str | None = None) -> DataFrame:
        """Base files only — Hudi's read-optimized query: latest
        compacted state, pending log records invisible. Plain parquet
        scan; full Catalyst pushdown applies."""
        instant = instant or self.latest_instant()
        files = [b for _, _, b, _ in self.file_slices(instant)]
        if not files:
            raise HudiError(f"instant {instant} has no file slices")
        return spark.read.parquet(*files).drop(*META_COLS)

    def snapshot(
        self,
        spark: SparkSession,
        instant: str | None = None,
        as_of_instant: str | None = None,
        keep_meta: bool = False,
        _slices: list | None = None,
    ) -> DataFrame:
        """Snapshot query: base ∪ log records merged per record key,
        latest (precombine, instant, arrival) wins, delete tombstones
        drop the key. Clean file groups (no pending logs) bypass the
        merge entirely — zero shuffle; dirty groups pay one hash
        shuffle on the record key."""
        if instant is None:
            instant = (
                self.instant_as_of(as_of_instant)
                if as_of_instant is not None
                else self.latest_instant()
            )
        slices = _slices if _slices is not None else self.file_slices(instant)
        if not slices:
            raise HudiError(f"instant {instant} has no file slices")
        clean = [b for _, _, b, logs in slices if not logs]
        dirty = [(b, logs) for _, _, b, logs in slices if logs]
        out: DataFrame | None = None
        if clean:
            out = spark.read.parquet(*clean)
        if dirty:
            merged = self._merge_dirty(spark, dirty, instant)
            out = merged if out is None else out.unionByName(merged)
        assert out is not None
        return out if keep_meta else out.drop(*META_COLS)

    def _merge_dirty(
        self, spark: SparkSession, dirty: list[tuple[str, list[tuple[str, int]]]], instant: str
    ) -> DataFrame:
        from pyspark.sql.window import Window

        base = spark.read.parquet(*[b for b, _ in dirty])
        out_schema = base.schema
        data_cols = [f.name for f in out_schema.fields]
        log_paths = sorted({p for _, logs in dirty for p, _ in logs})
        log_version = {p: v for _, logs in dirty for p, v in logs}
        log_rows = _read_log_records(spark, log_paths, log_version, out_schema, instant)
        # base rows: arrival seq -1 so any log record at the same or a
        # later instant supersedes them
        b = base.withColumn("_cdf_seq", F.lit(-1).cast("long")).withColumn(
            "_cdf_op", F.lit("u")
        )
        merged = b.unionByName(log_rows)
        # OverwriteWithLatestAvroPayload (Hudi's default payload): the
        # latest COMMIT wins outright — deletes included; the precombine
        # field only breaks ties among writes to the same key WITHIN one
        # commit (preCombine picks the largest), arrival order last
        order = [F.col(META_COMMIT_TIME).desc()]
        if self.precombine:
            order.append(F.col(self.precombine).desc_nulls_last())
        order.append(F.col("_cdf_seq").desc())
        w = Window.partitionBy(META_RECORD_KEY).orderBy(*order)
        winner = (
            merged.withColumn("_cdf_rank", F.row_number().over(w))
            .filter(F.col("_cdf_rank") == 1)
            .filter(F.col("_cdf_op") == F.lit("u"))
            .select(*data_cols)
        )
        return winner

    def read(self, spark: SparkSession, instant: str | None = None, **kw) -> DataFrame:
        return self.snapshot(spark, instant=instant, **kw)

    def changes_since(
        self, spark: SparkSession, position: TableSnapshotPosition | None
    ) -> tuple[DataFrame | None, TableSnapshotPosition]:
        """Hudi incremental query: latest state of every record whose
        last touch is strictly after the position (`_hoodie_commit_time
        > begin`). Deletes vanish from the snapshot, so — like Hudi's
        own incremental reads on MoR — deletions surface as absence,
        not tombstone rows."""
        cur = self.latest_instant()
        new_pos = TableSnapshotPosition(snapshot_id=int(cur))
        seen = None if position is None else f"{position.snapshot_id:017d}"
        if seen is not None and cur <= seen:
            return None, new_pos
        snap = self.snapshot(spark, instant=cur, keep_meta=True)
        if seen is not None:
            snap = snap.filter(F.col(META_COMMIT_TIME) > F.lit(seen))
        return snap.drop(*META_COLS), new_pos

    def scan(
        self,
        spark: SparkSession,
        request: ScanRequest,
        instant: str | None = None,
        as_of_instant: str | None = None,
    ) -> tuple[DataFrame, ScanPlan]:
        """Negotiated snapshot scan. All predicates are residual (the
        merge sits below them — capabilities() declares no predicate
        pushdown, so `negotiate` routes every filter to the residual
        set and fidelity stays honest); projection is applied
        post-merge."""
        plan = negotiate(request, self.capabilities())
        if instant is None:
            instant = (
                self.instant_as_of(as_of_instant)
                if as_of_instant is not None
                else self.latest_instant()
            )
        # hive-partitioned layouts: whole FILE GROUPS (base + their
        # logs together) prune by the slice's partitionPath, tri-state
        # (same discipline as the CoW reader and the catalog's manifest
        # pruning). Safe below the merge because file groups are
        # partition-local — a group's base rows AND its log records all
        # belong to that partition, so dropping an excluded group can
        # never change another group's merge; undecidable keeps the
        # group, and every predicate is re-applied post-merge anyway.
        from .catalog import _eval_on_values
        from .hudi import HudiTable

        slices = self.file_slices(instant)
        kept = []
        pruned = 0
        for s in slices:
            part = s[1]
            values = HudiTable._partition_values(part) if part else {}
            if values and any(
                _eval_on_values(p, values) is False for p in request.predicates
            ):
                pruned += 1
                continue
            kept.append(s)
        if kept:
            df = self.snapshot(spark, instant=instant, _slices=kept)
        else:
            # every group pruned: empty result with the table's schema
            schema = (
                spark.read.parquet(slices[0][2]).drop(*META_COLS).schema
            )
            df = spark.createDataFrame([], schema)
        from ..plans.scan import PartitionPlan as _PP

        plan.partitions = _PP(
            kind="files",
            units=[{"path": b} for _, _, b, _ in kept],
            meta={
                "file_groups_total": len(slices),
                "file_groups_kept": len(kept),
                "files_pruned": pruned,
                "instant": instant,
            },
        )
        for e in plan.all_engine_predicates():
            df = df.filter(lower(e))
        if plan.projection:
            df = df.select(*plan.projection)
        if plan.order_by:
            df = df.orderBy(
                *[
                    F.col(o.field).asc() if o.ascending else F.col(o.field).desc()
                    for o in plan.order_by
                ]
            )
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df, plan


def _pack_arrival_seq(ver: int, bi: int) -> int:
    """Bit-packed arrival-order base for one log block: ver<<44 |
    bi<<24, leaving 24 bits for the record index. A single shared
    `.log.1` accumulates one block per upsert/delete commit, so block
    counts beyond 1000 are routine — the old decimal packing
    ((ver*1000+bi)*1_000_000) collided block 1000 of version v with
    block 0 of version v+1, corrupting within-instant tie-break order.
    Bounds-checked so overflow raises instead of silently colliding."""
    if ver < 0 or bi < 0 or ver >= (1 << 19) or bi >= (1 << 20):
        raise HudiError(f"log arrival-order overflow: version={ver} block={bi}")
    return (ver << 44) | (bi << 24)


def _read_log_records(
    spark: SparkSession,
    log_paths: list[str],
    log_version: dict[str, int],
    out_schema,
    instant: str,
) -> DataFrame:
    """Decode log files EXECUTOR-side into ONE DataFrame aligned to
    `out_schema` + (_cdf_seq, _cdf_op) — upserts carry op='u', delete
    tombstones op='d' with null data columns; the merge window filters
    the winner's op at the end, so each log file is read exactly once.

    One task per log file: Hudi log files are dot-prefixed (hidden),
    which Spark's file index filters out unconditionally — the same
    reason real Hudi ships its own HoodieLogFormatReader instead of a
    stock file source. So the path list (driver metadata, O(log files))
    is distributed as rows and each task opens its file directly;
    blocks with a header instant AFTER the queried instant are skipped
    (time travel over a shared log file). `_cdf_seq` orders arrivals
    within one instant: (log version, block index, record index) packed
    into one long — record-key uniqueness per file group means the
    ordering only ever breaks ties among writes to the SAME key in the
    same commit.
    """
    import pandas as pd

    from pyspark.sql import types as T

    names = [f.name for f in out_schema.fields]
    full = T.StructType(
        list(out_schema.fields)
        + [T.StructField("_cdf_seq", T.LongType()), T.StructField("_cdf_op", T.StringType())]
    )

    def decode_files(batches):
        for pdf in batches:
            for path, ver in zip(pdf["path"], pdf["ver"]):
                with open(path, "rb") as f:
                    content = f.read()
                rows: list[dict] = []
                for bi, (btype, header, blob) in enumerate(decode_blocks(bytes(content))):
                    binst = header.get(HEADER_INSTANT_TIME, "")
                    if binst > instant:
                        continue  # block written after the queried instant
                    seq_base = _pack_arrival_seq(ver, bi)
                    if btype == BLOCK_AVRO_DATA:
                        recs = list(decode_data_block(header, blob))
                        if len(recs) > (1 << 24):
                            raise HudiError(f"log arrival-order overflow: {len(recs)} records in one block")
                        for ri, rec in enumerate(recs):
                            row = {n: rec.get(n) for n in names}
                            row[META_COMMIT_TIME] = binst
                            row["_cdf_seq"] = seq_base + ri
                            row["_cdf_op"] = "u"
                            rows.append(row)
                    elif btype == BLOCK_DELETE:
                        recs = list(decode_delete_block(blob))
                        if len(recs) > (1 << 24):
                            raise HudiError(f"log arrival-order overflow: {len(recs)} records in one block")
                        for ri, rec in enumerate(recs):
                            row = {n: None for n in names}
                            row[META_COMMIT_TIME] = binst
                            row[META_RECORD_KEY] = rec["recordKey"]
                            row["_cdf_seq"] = seq_base + ri
                            row["_cdf_op"] = "d"
                            rows.append(row)
                    elif btype == BLOCK_COMMAND:
                        continue  # rollback handling out of scope (documented)
                    else:
                        raise HudiError(f"unsupported log block type {btype}")
                yield pd.DataFrame.from_records(rows, columns=[f.name for f in full.fields])

    files = spark.createDataFrame(
        [(p, int(log_version.get(p, 0))) for p in log_paths], "path string, ver int"
    ).repartition(len(log_paths))
    return files.mapInPandas(decode_files, schema=full)


# ---------------------------------------------------------------------------
# fixture writer (bucket index)


class HudiMorFixtureWriter:
    """Emits the merge-on-read layout `HudiMorTable` reads, using
    Hudi's BUCKET index semantics: fileId == deterministic bucket of
    the record key (`pmod(crc32(key), n_buckets)`), so routing needs
    NO driver-side key state — the same property real Hudi's bucket
    index buys at scale.

    `insert` is the initial load (one call; distributed parquet write,
    one base file group per bucket). `upsert`/`delete` append log
    blocks — DRIVER-side encode, capped at `max_rows` per call (log
    batches are deltas by construction; bulk rewrites belong in
    `insert`/`compact` — same boundary discipline as
    `avro_format.write_avro`). `compact()` merges every dirty group
    into new base versions through a real `.commit`, using the
    reader's own merge (distributed) so compaction and snapshot can
    never disagree.
    """

    def __init__(
        self,
        root: str | Path,
        record_key: str,
        precombine: str | None = None,
        n_buckets: int = 4,
        max_rows: int = 100_000,
        partition_by: list[str] | None = None,
    ):
        """`partition_by` (identity columns) produces a hive-partitioned
        MoR layout: base and log files live under `col=value/` dirs,
        `partitionToWriteStats` is keyed by the partition path, and
        file groups are PARTITION-LOCAL (fileId embeds a partition
        digest) — the layout real Hudi writes with a partitioned bucket
        index. Record keys must be globally unique (the engine-wide
        fixture contract; Hudi's partition-local identity would treat
        one key in two partitions as two records)."""
        self.root = Path(root)
        self.hoodie = self.root / ".hoodie"
        self.hoodie.mkdir(parents=True, exist_ok=True)
        self.record_key = record_key
        self.precombine = precombine
        self.n_buckets = n_buckets
        self.max_rows = max_rows
        self.partition_by = list(partition_by or [])
        # resume the instant sequence and insert state from an existing
        # timeline, so per-run writer/destination instances continue one
        # monotone commit lineage (same discipline as the CoW writer)
        self._n = 0
        self._inserted = False
        existing = sorted(
            p.name.split(".")[0]
            for p in self.hoodie.glob("*")
            if p.suffix in (".deltacommit", ".commit", ".replacecommit")
        )
        if existing:
            self._n = max(0, int(existing[-1]) - _INSTANT_BASE)
            self._inserted = any(
                self.hoodie.glob("*.deltacommit")
            )
        # BUCKET-INDEX AUTHORITY: an existing table's hoodie.properties
        # owns the bucket count and generation — a resize_buckets()
        # rewrite may have evolved them past any constructor default,
        # and routing with a stale count would scatter keys across
        # file groups. Per-run writer/destination instances ADOPT the
        # table's recorded values; the constructor arg only seeds a
        # fresh table.
        self.bucket_generation = 0
        props_path = self.hoodie / "hoodie.properties"
        if existing and props_path.exists():
            recorded = dict(
                line.split("=", 1)
                for line in props_path.read_text().splitlines()
                if "=" in line
            )
            self.n_buckets = int(
                recorded.get("hoodie.index.bucket.num", self.n_buckets)
            )
            self.bucket_generation = int(
                recorded.get("hoodie.index.bucket.generation", 0)
            )
        self._write_properties()

    def _write_properties(self) -> None:
        props = [
            "hoodie.table.type=MERGE_ON_READ",
            f"hoodie.table.recordkey.fields={self.record_key}",
            f"hoodie.index.bucket.num={self.n_buckets}",
            f"hoodie.index.bucket.generation={self.bucket_generation}",
        ]
        if self.precombine:
            props.append(f"hoodie.table.precombine.field={self.precombine}")
        if self.partition_by:
            props.append(
                f"hoodie.table.partition.fields={','.join(self.partition_by)}"
            )
        (self.hoodie / "hoodie.properties").write_text("\n".join(props) + "\n")

    def _next_instant(self) -> str:
        self._n += 1
        return f"{_INSTANT_BASE + self._n:017d}"

    def _bucket_of(self, key) -> int:
        return zlib.crc32(str(key).encode("utf-8")) % self.n_buckets

    def _part_path(self, values: dict) -> str:
        """Hive partition path for one row's partition values."""
        return "/".join(f"{c}={values[c]}" for c in self.partition_by)

    @staticmethod
    def _fid(part: str, bucket: int, gen: int = 0) -> str:
        """Partition-local file group id: partition digest + bucket
        (real Hudi fileIds are per-partition uuids; the digest keeps
        them collision-free across partitions while staying
        deterministic for the bucket-index routing). `gen` is the
        bucket-index GENERATION: a resize_buckets() rewrite retires
        every generation-g group and re-keys routing into
        generation-g+1 names, so a pre- and post-resize group with the
        same bucket number can never collide in the slice resolver
        (generation 0 keeps the legacy names for existing tables)."""
        prefix = f"g{gen}-" if gen else ""
        if not part:
            return f"{prefix}bucket{bucket}"
        return f"{prefix}p{zlib.crc32(part.encode('utf-8')):08x}-bucket{bucket}"

    def insert(self, df: DataFrame) -> str:
        """Initial load: one distributed write, one base file group per
        (partition, bucket), meta columns materialized (as real Hudi
        base files are). Exactly one insert per fixture table — later
        data arrives via upsert/delete/compact (bucket-index file
        groups are fixed at load)."""
        import shutil

        if self._inserted:
            raise HudiError(
                "fixture bucket index fixes file groups at the initial load — "
                "use upsert()/delete() for subsequent commits"
            )
        instant = self._next_instant()
        key = F.col(self.record_key)
        staged = (
            df.withColumn(META_COMMIT_TIME, F.lit(instant))
            .withColumn(META_RECORD_KEY, key.cast("string"))
            .withColumn(
                "_cdf_bucket",
                F.pmod(F.crc32(key.cast("string").cast("binary")), F.lit(self.n_buckets)),
            )
        )
        from .partitioned_write import hive_partitioned_write

        # partition columns split the write but STAY in the data files
        # (hive_partitioned_write re-injects them); only the derived
        # bucket column is dropped
        split_cols = [f"__hp_{c}" for c in self.partition_by] + ["_cdf_bucket"]
        for c in self.partition_by:
            staged = staged.withColumn(f"__hp_{c}", F.col(c))
        tmp_root, parts = hive_partitioned_write(
            staged, split_cols, drop_partition_cols=True,
            max_partitions=10_000,
        )
        stats: dict[str, list[dict]] = {}
        for raw, files in parts:
            bucket = int(raw["_cdf_bucket"])
            part = "/".join(
                f"{c}={raw[f'__hp_{c}']}" for c in self.partition_by
            )
            fid = self._fid(part, bucket, self.bucket_generation)
            rel = f"{part}/{fid}_0-0-0_{instant}.parquet" if part else f"{fid}_0-0-0_{instant}.parquet"
            if len(files) != 1:
                # coalesce inside hive_partitioned_write should give one
                # file per partition; merge defensively via pandas-free move
                raise HudiError(f"expected one file per group, got {len(files)}")
            (self.root / rel).parent.mkdir(parents=True, exist_ok=True)
            shutil.move(files[0], str(self.root / rel))
            stats.setdefault(part, []).append({"fileId": fid, "path": rel, "numWrites": -1})
        shutil.rmtree(tmp_root, ignore_errors=True)
        meta = {"partitionToWriteStats": stats, "operationType": "INSERT"}
        (self.hoodie / f"{instant}.deltacommit").write_text(json.dumps(meta, indent=1))
        self._inserted = True
        return instant

    # -- log appends ------------------------------------------------------
    def _base_instant(self, part: str, fid: str) -> str:
        base_dir = self.root / part if part else self.root
        cands = sorted(base_dir.glob(f"{fid}_*_*.parquet"))
        if not cands:
            raise HudiError(f"no base file for group {fid} — insert() first")
        return max(p.stem.rsplit("_", 1)[1] for p in cands)

    def _append_log(self, part: str, fid: str, block: bytes) -> str:
        base_instant = self._base_instant(part, fid)
        name = f".{fid}_{base_instant}.log.1_0-0-0"
        rel = f"{part}/{name}" if part else name
        with open(self.root / rel, "ab") as f:
            f.write(block)
        return rel

    def _collect_capped(self, df: DataFrame, what: str) -> list:
        rows = df.limit(self.max_rows + 1).collect()
        if len(rows) > self.max_rows:
            raise HudiError(
                f"{what} batch exceeds the fixture writer's {self.max_rows}-row "
                "driver-side cap — log batches are deltas; bulk data belongs in "
                "insert() or a compact()ed rewrite"
            )
        return rows

    def _df_avro_schema(self, df: DataFrame) -> dict:
        from pyspark.sql import types as T

        prim = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BinaryType: "bytes",
        }

        def conv(dt):
            for k, v in prim.items():
                if isinstance(dt, k):
                    return v
            raise AvroTypeError(f"log-record type {dt} not supported by the fixture writer")

        return {
            "type": "record",
            "name": "HoodieRecord",
            "fields": [
                {"name": f.name, "type": ["null", conv(f.dataType)]} for f in df.schema.fields
            ],
        }

    def upsert(self, df: DataFrame) -> str:
        """Appends one Avro data block per touched (partition, bucket)
        file group — rows route by their OWN partition column values
        (partition-local groups)."""
        instant = self._next_instant()
        staged = df.withColumn(META_COMMIT_TIME, F.lit(instant)).withColumn(
            META_RECORD_KEY, F.col(self.record_key).cast("string")
        )
        schema = self._df_avro_schema(staged)
        rows = self._collect_capped(staged, "upsert")
        by_group: dict[tuple[str, int], list[dict]] = {}
        for r in rows:
            d = r.asDict()
            part = self._part_path(d) if self.partition_by else ""
            by_group.setdefault((part, self._bucket_of(d[self.record_key])), []).append(d)
        stats: dict[str, list[dict]] = {}
        for (part, bucket), recs in sorted(by_group.items()):
            fid = self._fid(part, bucket, self.bucket_generation)
            name = self._append_log(part, fid, encode_data_block(schema, recs, instant))
            stats.setdefault(part, []).append(
                {"fileId": fid, "path": name, "numWrites": len(recs)}
            )
        meta = {"partitionToWriteStats": stats, "operationType": "UPSERT"}
        (self.hoodie / f"{instant}.deltacommit").write_text(json.dumps(meta, indent=1))
        return instant

    def delete(self, keys_df: DataFrame) -> str:
        """Appends one delete block per touched file group; `keys_df`
        holds the record-key column (plus the partition columns for a
        partitioned table — routing is partition-local)."""
        instant = self._next_instant()
        cols = [self.record_key] + self.partition_by
        rows = self._collect_capped(keys_df.select(*cols), "delete")
        by_group: dict[tuple[str, int], list[tuple[str, str]]] = {}
        for r in rows:
            d = r.asDict()
            k = d[self.record_key]
            part = self._part_path(d) if self.partition_by else ""
            by_group.setdefault((part, self._bucket_of(k)), []).append((str(k), ""))
        stats: dict[str, list[dict]] = {}
        for (part, bucket), keys in sorted(by_group.items()):
            fid = self._fid(part, bucket, self.bucket_generation)
            name = self._append_log(part, fid, encode_delete_block(keys, instant))
            stats.setdefault(part, []).append(
                {"fileId": fid, "path": name, "numWrites": len(keys)}
            )
        meta = {"partitionToWriteStats": stats, "operationType": "DELETE"}
        (self.hoodie / f"{instant}.deltacommit").write_text(json.dumps(meta, indent=1))
        return instant

    def compact(self, spark: SparkSession) -> str | None:
        """Merges every dirty file group into a new base version via a
        real `.commit` — the reader's slice rule then drops the old
        logs (supersession). Uses the READER's merge so compaction and
        snapshot semantics are one code path."""
        import shutil
        import tempfile

        table = HudiMorTable(self.root)
        latest = table.latest_instant()
        dirty = [
            (fid, part, base, logs)
            for fid, part, base, logs in table.file_slices(latest)
            if logs
        ]
        if not dirty:
            return None
        instant = self._next_instant()
        stats: dict[str, list[dict]] = {}
        for fid, part, base, logs in dirty:
            merged = table._merge_dirty(spark, [(base, logs)], latest)
            # compacted base keeps the last-touch commit time per record
            # (real compaction preserves each record's meta columns)
            tmp = tempfile.mkdtemp(prefix="hudi_compact_")
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            files = sorted(str(p) for p in Path(tmp).glob("*.parquet"))
            rel = f"{part}/{fid}_0-0-0_{instant}.parquet" if part else f"{fid}_0-0-0_{instant}.parquet"
            (self.root / rel).parent.mkdir(parents=True, exist_ok=True)
            shutil.move(files[0], str(self.root / rel))
            shutil.rmtree(tmp, ignore_errors=True)
            stats.setdefault(part, []).append({"fileId": fid, "path": rel, "numWrites": -1})
        meta = {"partitionToWriteStats": stats, "operationType": "COMPACT"}
        (self.hoodie / f"{instant}.commit").write_text(json.dumps(meta, indent=1))
        return instant

    def resize_buckets(self, spark: SparkSession, new_n: int) -> str | None:
        """BUCKET-COUNT EVOLUTION (Hudi's bucket-rescale clustering):
        rewrite every live file group into `new_n` buckets under the
        NEXT bucket-index generation, committed as ONE `.replacecommit`
        that retires all current groups (operationType CLUSTER — no
        logical row change; change streams skip it, time travel to
        earlier instants still resolves the old layout).

        The fixed-width bucket index is what makes per-epoch routing a
        zero-read pure key function; its cost is that groups grow
        without bound as the table grows. Resize pays ONE O(table)
        distributed rewrite — the same bill clustering always pays —
        and every epoch after it routes `pmod(crc32(key), new_n)` into
        generation-g+1 group names, still with zero table reads: the
        authority for (count, generation) is hoodie.properties, O(1)
        metadata adopted by each per-run writer/destination instance.
        Generation naming keeps old and new groups collision-free in
        the slice resolver (see `_fid`)."""
        import shutil

        if new_n == self.n_buckets:
            return None
        table = HudiMorTable(self.root)
        latest = table.latest_instant()
        live = table.file_slices(latest)
        if not live:
            return None
        snap = table.snapshot(spark, instant=latest, keep_meta=True)
        gen = self.bucket_generation + 1
        instant = self._next_instant()
        staged = snap.withColumn(
            "_cdf_bucket",
            F.pmod(
                F.crc32(F.col(self.record_key).cast("string").cast("binary")),
                F.lit(new_n),
            ),
        )
        from .partitioned_write import hive_partitioned_write

        split_cols = [f"__hp_{c}" for c in self.partition_by] + ["_cdf_bucket"]
        for c in self.partition_by:
            staged = staged.withColumn(f"__hp_{c}", F.col(c))
        tmp_root, parts = hive_partitioned_write(
            staged, split_cols, drop_partition_cols=True, max_partitions=10_000
        )
        stats: dict[str, list[dict]] = {}
        for raw, files in parts:
            bucket = int(raw["_cdf_bucket"])
            part = "/".join(
                f"{c}={raw[f'__hp_{c}']}" for c in self.partition_by
            )
            fid = self._fid(part, bucket, gen)
            rel = (
                f"{part}/{fid}_0-0-0_{instant}.parquet"
                if part
                else f"{fid}_0-0-0_{instant}.parquet"
            )
            if len(files) != 1:
                raise HudiError(f"expected one file per group, got {len(files)}")
            (self.root / rel).parent.mkdir(parents=True, exist_ok=True)
            shutil.move(files[0], str(self.root / rel))
            stats.setdefault(part, []).append(
                {"fileId": fid, "path": rel, "numWrites": -1}
            )
        shutil.rmtree(tmp_root, ignore_errors=True)
        replaced: dict[str, list[str]] = {}
        for fid, part, _base, _logs in live:
            replaced.setdefault(part, []).append(fid)
        meta = {
            "partitionToWriteStats": stats,
            "partitionToReplaceFileIds": replaced,
            "operationType": "CLUSTER",
        }
        (self.hoodie / f"{instant}.replacecommit").write_text(json.dumps(meta, indent=1))
        self.n_buckets = new_n
        self.bucket_generation = gen
        self._write_properties()
        return instant
