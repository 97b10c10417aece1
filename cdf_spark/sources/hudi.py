"""Hudi copy-on-write table reader: commit-timeline replay, instant
time travel, and incremental `changes_since` — no Hudi jars.

Hudi's copy-on-write layout (the common analytics configuration):

    <root>/.hoodie/<instant>.commit        completed-commit metadata
                                           (JSON; instant = yyyyMMddHHmmssSSS)
    <root>/[partition/]<fileId>_<writeToken>_<instant>.parquet

A *file group* (fileId) is a logical file whose versions are written
by successive commits; the reader resolves each group to its LATEST
version at or before the requested instant (a copy-on-write commit
rewrites the whole group, so the newest version subsumes older ones —
Hudi's core snapshotting mechanism). The commit file's
`partitionToWriteStats` records which file versions each commit wrote,
which is also what makes incremental consumption (`changes_since`)
possible without listing the filesystem.

Scale design matches the Iceberg/Delta readers: the timeline is tiny
driver-side metadata; data reads are plain multi-file parquet scans so
pushdown/pruning/splits stay with Catalyst. Instants are lexically
ordered timestamps (Hudi's own invariant), so
`TableSnapshotPosition(snapshot_id=int(instant))` orders naturally.

Scope: copy-on-write with `.commit` instants. Merge-on-read (log files
+ compaction, `.deltacommit`) is detected and routed to its own reader
(`hudi_mor.py`) — never silently misread here.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..expressions.lowering import lower
from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from ..positions import TableSnapshotPosition


class HudiError(ValueError):
    pass


class HudiEmptyWindowError(HudiError):
    """A change-stream window containing no logical row changes
    (compaction/cluster-only instants). A TYPED signal, not a message
    substring: callers that treat an empty window as a benign
    cursor-advance (matview's Hudi IVM leg) must never be able to
    swallow a real replay failure by accident."""


def is_hudi_layout(root: str | Path) -> bool:
    hoodie = Path(str(root)) / ".hoodie"
    return hoodie.is_dir() and any(hoodie.glob("*.commit"))


class HudiTable:
    """Read-side driver over a Hudi copy-on-write table directory."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.hoodie = self.root / ".hoodie"
        if not self.hoodie.is_dir():
            raise HudiError(f"{self.root} has no .hoodie/ — not a Hudi table")
        if any(self.hoodie.glob("*.deltacommit")):
            raise HudiError(
                "merge-on-read timeline (.deltacommit): use HudiMorTable "
                "(sources/hudi_mor.py) — this reader is copy-on-write only"
            )

    # -- timeline ---------------------------------------------------------
    def instants(self) -> list[str]:
        out = sorted(
            p.stem
            for pat in ("*.commit", "*.replacecommit")
            for p in self.hoodie.glob(pat)
        )
        if not out:
            raise HudiError(f"no completed commits under {self.hoodie}")
        return out

    def latest_instant(self) -> str:
        return self.instants()[-1]

    def commit_meta(self, instant: str) -> dict:
        for ext in ("commit", "replacecommit"):
            p = self.hoodie / f"{instant}.{ext}"
            if p.exists():
                return json.loads(p.read_text())
        raise HudiError(f"instant {instant} not in timeline")

    def _replaced_fids(self, instant: str) -> set[str]:
        """File groups REPLACED by this instant (insert_overwrite's
        `partitionToReplaceFileIds`) — they stop being live even though
        no new version of them is written."""
        meta = self.commit_meta(instant)
        return {
            fid
            for fids in meta.get("partitionToReplaceFileIds", {}).values()
            for fid in fids
        }

    def instant_as_of(self, instant: str) -> str:
        eligible = [i for i in self.instants() if i <= instant]
        if not eligible:
            raise HudiError(f"no commit at or before instant {instant}")
        return eligible[-1]

    def position(self) -> TableSnapshotPosition:
        return TableSnapshotPosition(snapshot_id=int(self.latest_instant()))

    # -- file-slice resolution -------------------------------------------
    def _written_files(self, instant: str) -> list[tuple[str, str, str, str]]:
        """(fileId, instant, path, partitionPath) written by one commit."""
        meta = self.commit_meta(instant)
        out = []
        for part, stats in meta.get("partitionToWriteStats", {}).items():
            for st in stats:
                out.append((st["fileId"], instant, st["path"], part))
        return out

    def file_slices_for_instant(self, instant: str) -> list[tuple[str, str]]:
        """Latest version of every file group at or before `instant` as
        (partitionPath, absolute file path) — copy-on-write snapshot
        resolution."""
        if instant not in self.instants():
            raise HudiError(f"instant {instant} not in timeline")
        latest: dict[str, tuple[str, str, str]] = {}  # fileId -> (instant, path, part)
        for i in self.instants():
            if i > instant:
                break
            # replacecommit first: replaced groups go dark at this
            # instant; the same commit's NEW groups are added below
            for fid in self._replaced_fids(i):
                latest.pop(fid, None)
            for file_id, inst, path, part in self._written_files(i):
                prev = latest.get(file_id)
                if prev is None or inst > prev[0]:
                    latest[file_id] = (inst, path, part)
        return sorted((part, str(self.root / path)) for _, path, part in latest.values())

    def files_for_instant(self, instant: str) -> list[str]:
        return sorted(p for _, p in self.file_slices_for_instant(instant))

    def live_file_groups(self, instant: str | None = None) -> list[tuple[str, str, str]]:
        """Latest version of every file group as (fileId, partitionPath,
        absolute file path) — the (row address -> file group) map the
        copy-on-write UPSERT path needs to route updates to their
        existing groups."""
        instant = instant or self.latest_instant()
        if instant not in self.instants():
            raise HudiError(f"instant {instant} not in timeline")
        latest: dict[str, tuple[str, str, str]] = {}
        for i in self.instants():
            if i > instant:
                break
            for fid in self._replaced_fids(i):
                latest.pop(fid, None)
            for file_id, inst, path, part in self._written_files(i):
                prev = latest.get(file_id)
                if prev is None or inst > prev[0]:
                    latest[file_id] = (inst, path, part)
        return sorted(
            (fid, part, str(self.root / path))
            for fid, (_, path, part) in latest.items()
        )

    def clean(self, retain_commits: int = 10, dry_run: bool = False) -> dict:
        """Hudi cleaner, KEEP_LATEST_COMMITS policy: every copy-on-write
        UPSERT rewrites whole file groups, so superseded slice versions
        accumulate forever without this — at per-epoch CDC cadence the
        table's physical size is O(commits), not O(rows). Retain the
        slices needed to serve the newest `retain_commits` instants
        (for each file group: its latest version at-or-before the
        earliest retained instant, plus everything newer); delete older
        versions and record them in a `.clean` instant on the timeline,
        exactly where real Hudi readers look for cleaner history.
        Time travel to instants older than the earliest retained one
        stops resolving cleaned slices — the documented tradeoff."""
        instants = self.instants()
        if not instants:
            raise HudiError("empty timeline")
        retained = instants[-retain_commits:]
        earliest = retained[0]
        keep: set[str] = set()
        # newest version per file group at-or-before each retained
        # instant stays readable
        for i in retained:
            keep.update(p for _part, p in self.file_slices_for_instant(i))
        deleted: list[str] = []
        all_written: list[tuple[str, str]] = []  # (instant, abs path)
        for i in instants:
            for _fid, inst, path, _part in self._written_files(i):
                all_written.append((inst, str(self.root / path)))
        root_resolved = self.root.resolve()
        for inst, p in sorted(all_written):
            if p in keep:
                continue
            if inst >= earliest:
                # a superseded slice inside the retained window still
                # serves time travel to mid-window instants
                continue
            try:
                Path(p).resolve().relative_to(root_resolved)
            except ValueError:
                # LINKED file (absolute path outside this table) — its
                # lifecycle belongs to the SOURCE table the translation
                # layer linked it from; a cleaner that unlinked it
                # would destroy another table's data. Never touch.
                continue
            if not Path(p).exists():
                continue  # reclaimed by an earlier clean
            if not dry_run:
                Path(p).unlink(missing_ok=True)
            deleted.append(p)
        if deleted and not dry_run:
            clean_instant = f"{int(self.latest_instant()) + 1:017d}"
            (self.root / ".hoodie" / f"{clean_instant}.clean").write_text(
                json.dumps(
                    {
                        "earliestCommitToRetain": earliest,
                        "filesDeleted": [str(Path(p).relative_to(self.root)) for p in deleted],
                    },
                    indent=1,
                )
            )
        # reclaim bloom-index entries (written by HudiDestination's
        # key_index="bloom") whose file-group version no longer exists
        # — keyed by the data file's RELATIVE path, so the sweep can
        # never touch anything outside this table root
        blooms_deleted: list[str] = []
        bdir = self.root / ".hoodie" / "bloom"
        if bdir.is_dir():
            for bj in sorted(bdir.glob("*.json")):
                try:
                    rel = json.loads(bj.read_text()).get("path", "")
                except Exception:  # noqa: BLE001 — unreadable: leave it
                    continue
                if rel and not (self.root / rel).exists():
                    if not dry_run:
                        bj.unlink(missing_ok=True)
                    blooms_deleted.append(str(bj))
        return {
            "deleted": deleted,
            "blooms_deleted": blooms_deleted,
            "earliest_retained": earliest,
            "dry_run": dry_run,
        }

    @staticmethod
    def _partition_values(partition_path: str) -> dict[str, object]:
        """Hive-style partition path -> typed values ("status=F/y=2024"
        -> {status: 'F', y: 2024}); numerically-shaped values coerce so
        predicates on int/float partition columns prune correctly. A
        mis-coercion (string column whose values LOOK numeric, e.g.
        '01234') cannot prune wrongly: cross-type eq/ne is undecidable
        in `_eval_on_values` (returns None -> partition kept, residual
        filter re-applied on rows)."""
        out: dict[str, object] = {}
        for seg in partition_path.split("/"):
            if "=" not in seg:
                continue
            k, v = seg.split("=", 1)
            coerced: object = v
            try:
                coerced = int(v)
            except ValueError:
                try:
                    coerced = float(v)
                except ValueError:
                    pass
            out[k] = coerced
        return out

    # -- reads -------------------------------------------------------------
    def capabilities(self) -> Capability:
        cap = Capability.parquet()
        cap.position_enforced = True  # instant pin IS the position
        return cap

    def scan(
        self,
        spark: SparkSession,
        request: ScanRequest,
        instant: str | None = None,
        as_of_instant: str | None = None,
    ) -> tuple[DataFrame, ScanPlan]:
        """Negotiated scan against a pinned instant (same pushdown
        contract as the Iceberg/Delta readers; catalog.negotiate routes
        HUDI-classified tables here)."""
        plan = negotiate(request, self.capabilities())
        if instant is None:
            instant = (
                self.instant_as_of(as_of_instant)
                if as_of_instant is not None
                else self.latest_instant()
            )
        # partition-path pruning: hive-style partition values from each
        # file slice's partitionPath evaluate against the request
        # predicates tri-state (same discipline as the catalog's
        # manifest pruning) — undecidable keeps the slice, and every
        # predicate is re-applied below, so a miss widens the scan but
        # never corrupts it
        from .catalog import _eval_on_values

        slices = self.file_slices_for_instant(instant)
        kept = []
        for part, path in slices:
            values = self._partition_values(part)
            if not values:
                kept.append(path)
                continue
            verdicts = [_eval_on_values(p, values) for p in request.predicates]
            if all(v is not False for v in verdicts):
                kept.append(path)
        from ..plans.scan import PartitionPlan as _PP

        plan.partitions = _PP(
            kind="files",
            units=[{"path": p} for p in kept],
            meta={
                "files_total": len(slices),
                "files_kept": len(kept),
                "files_pruned": len(slices) - len(kept),
                "instant": instant,
            },
        )
        df = self.read(spark, instant=instant, _files=kept)
        if plan.projection:
            df = df.select(*plan.projection)
        # pushed predicates re-apply row-level (these readers ARE the
        # engine — Spark's parquet pushdown rides the filter), and
        # UNSUPPORTED ones must apply too: negotiate() classifies
        # composite/unfamiliar shapes as unsupported for the SOURCE,
        # which obliges the engine to enforce them itself — silently
        # dropping them returned extra rows (caught by the delta
        # data-skipping tests, latent in five scan paths).
        for p in plan.pushed + plan.residual + plan.unsupported:
            df = df.filter(lower(p.expr))
        if plan.order_by:
            from pyspark.sql import functions as F

            df = df.orderBy(
                *[
                    F.col(o.field).asc() if o.ascending else F.col(o.field).desc()
                    for o in plan.order_by
                ]
            )
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df, plan

    def read(
        self,
        spark: SparkSession,
        instant: str | None = None,
        as_of_instant: str | None = None,
        _files: list[str] | None = None,
    ) -> DataFrame:
        if instant is None:
            instant = (
                self.instant_as_of(as_of_instant)
                if as_of_instant is not None
                else self.latest_instant()
            )
        all_files = self.files_for_instant(instant)
        if not all_files:
            raise HudiError(f"instant {instant} has no file slices")
        files = all_files if _files is None else _files
        # mergeSchema: file groups written before a schema-widening
        # commit lack the new columns — Spark's default single-footer
        # schema would silently DROP a widened column whenever an old
        # group's footer wins. Hudi readers reconcile by name and
        # null-fill (the commit metadata carries the evolved schema in
        # real Hudi; footer-merge is the jar-free equivalent).
        if not files:
            # every slice pruned: empty result with the table schema
            schema = spark.read.option("mergeSchema", "true").parquet(*all_files).schema
            return spark.createDataFrame([], schema)
        return spark.read.option("mergeSchema", "true").parquet(*files)

    def changes_since(
        self, spark: SparkSession, position: TableSnapshotPosition | None
    ) -> tuple[DataFrame | None, TableSnapshotPosition]:
        """Rows of file versions written by instants strictly after the
        position. Copy-on-write rewrites whole groups, so a commit that
        REVISES an existing group (same fileId seen before) invalidates
        previously-delivered rows -> full re-read of current; commits
        that only create NEW groups (pure inserts) deliver a delta."""
        cur = self.latest_instant()
        new_pos = TableSnapshotPosition(snapshot_id=int(cur))
        seen = None if position is None else f"{position.snapshot_id:017d}"
        newer = [i for i in self.instants() if seen is None or i > seen]
        if not newer:
            return None, new_pos
        prior_groups: set[str] = set()
        if seen is not None:
            for i in self.instants():
                if i <= seen:
                    prior_groups.update(fid for fid, _, _, _ in self._written_files(i))
        # latest version per NEW file group only: a group created and then
        # rewritten by two post-checkpoint commits was never delivered at v1,
        # so only its newest version ships; a rewrite of a group the consumer
        # already saw invalidates delivered rows -> full re-read.
        latest_new: dict[str, tuple[str, str]] = {}  # fid -> (instant, path)
        for i in newer:
            if self._replaced_fids(i):
                # insert_overwrite replaced groups the consumer may have
                # seen — delivered rows are invalidated, full re-read
                return self.read(spark, instant=cur), new_pos
            for fid, inst, path, _part in self._written_files(i):
                if fid in prior_groups:
                    return self.read(spark, instant=cur), new_pos  # group rewrite
                prev = latest_new.get(fid)
                if prev is None or inst > prev[0]:
                    latest_new[fid] = (inst, path)
        files = sorted(str(self.root / path) for _, path in latest_new.values())
        return spark.read.parquet(*files), new_pos


# ---------------------------------------------------------------------------
# fixture writer


class HudiFixtureWriter:
    """Emits the copy-on-write layout `HudiTable` reads: timeline
    `.commit` JSON with partitionToWriteStats, file-group parquet
    versions named `<fileId>_<token>_<instant>.parquet`."""

    def __init__(
        self,
        root: str | Path,
        partition_by: list[str] | None = None,
        max_partitions_per_commit: int = 10_000,
    ):
        self.root = Path(root)
        (self.root / ".hoodie").mkdir(parents=True, exist_ok=True)
        # resume the instant sequence from an existing timeline so a
        # per-run writer (the destination path) never collides or
        # regresses instants; a fresh directory resumes from zero,
        # which is the original fixture behavior
        self._n = 0
        for pat in ("*.commit", "*.replacecommit"):
            for f in (self.root / ".hoodie").glob(pat):
                try:
                    self._n = max(self._n, int(f.stem) - 20240101000000000)
                except ValueError:
                    continue
        # hive-style partitioned layout: each commit's frame splits by
        # the partition tuple, files land under `col=value/` dirs and
        # partitionToWriteStats is keyed by the partition path — the
        # standard Hudi CoW shape readers prune on
        self.partition_by = list(partition_by or [])
        self.max_partitions_per_commit = max_partitions_per_commit

    def _next_instant(self) -> str:
        self._n += 1
        return f"{20240101000000000 + self._n:017d}"

    def commit(self, df: DataFrame, file_id: str | None = None) -> str:
        """One commit writing one file group per partition (new groups
        by default; pass an existing file_id to REWRITE — the
        copy-on-write update path; partitioned tables suffix the fid
        with the partition path so groups stay partition-local)."""
        import shutil
        import tempfile

        instant = self._next_instant()
        base_fid = file_id or uuid.uuid4().hex[:8]

        # partitioned commits: ONE distributed hive-partitioned write;
        # the driver walks only directory names (O(partitions), never
        # O(rows) — the old per-tuple filter ran one full scan per
        # partition and collected the tuples driver-side), and the
        # partition count is guarded against degenerate keys.
        slices: list[tuple[str, list[str]]] = []
        tmps: list[str] = []
        if self.partition_by:
            from .partitioned_write import HIVE_NULL, hive_partitioned_write

            tmp_root, parts = hive_partitioned_write(
                df,
                self.partition_by,
                drop_partition_cols=False,
                max_partitions=self.max_partitions_per_commit,
            )
            tmps.append(tmp_root)
            for raw, files in parts:
                part_path = "/".join(
                    f"{c}={raw[c] if raw[c] is not None else HIVE_NULL}"
                    for c in self.partition_by
                )
                slices.append((part_path, files))
        else:
            tmp = tempfile.mkdtemp(prefix="hudi_commit_")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            tmps.append(tmp)
            slices.append(("", sorted(str(p) for p in Path(tmp).glob("*.parquet"))))

        stats: dict[str, list[dict]] = {}
        for part_path, files in slices:
            base = (
                f"{base_fid}-{part_path.replace('/', '_').replace('=', '-')}"
                if part_path
                else base_fid
            )
            rel_dir = self.root / part_path if part_path else self.root
            rel_dir.mkdir(parents=True, exist_ok=True)
            for i, src in enumerate(files):
                fid = base if i == 0 else f"{base}-{i}"
                rel = (f"{part_path}/" if part_path else "") + f"{fid}_0-0-0_{instant}.parquet"
                shutil.move(str(src), str(self.root / rel))
                stats.setdefault(part_path, []).append(
                    {"fileId": fid, "path": rel, "numWrites": -1}
                )
        for t in tmps:
            shutil.rmtree(t, ignore_errors=True)
        meta = {
            "partitionToWriteStats": stats,
            "operationType": "UPSERT" if file_id else "INSERT",
        }
        (self.hoodie_dir / f"{instant}.commit").write_text(json.dumps(meta, indent=1))
        return instant

    def link_files(
        self, paths: list[str], partition_paths: list[str] | None = None
    ) -> str:
        """One commit that LINKS existing parquet files IN PLACE —
        write stats carry the source files' ABSOLUTE paths (the
        timeline resolver's `root / path` join yields the absolute
        path unchanged), nothing is copied. The XTable translation
        primitive in the →Hudi direction; the linked files' lifecycle
        stays with the source table (clean there, not here).

        Partitioned linking: `partition_paths` carries one hive-style
        `col=value/...` key per path (derived from the SOURCE format's
        partition metadata, never from file contents) — the write
        stats key partitions exactly as a native partitioned commit
        would, so partition-path pruning works on the linked table;
        the linked files must carry the partition columns themselves
        (Hudi base files always do — the caller enforces it for
        foreign files)."""
        if not paths:
            raise HudiError("link_files requires at least one parquet file")
        if self.partition_by:
            if partition_paths is None or len(partition_paths) != len(paths):
                raise HudiError(
                    "partitioned link_files requires one partition path per file"
                )
        elif partition_paths:
            raise HudiError("partition_paths given for an unpartitioned table")
        instant = self._next_instant()
        stats: dict[str, list[dict]] = {}
        for i, p in enumerate(paths):
            key = partition_paths[i] if partition_paths is not None else ""
            stats.setdefault(key, []).append(
                {
                    "fileId": uuid.uuid4().hex[:8],
                    "path": str(Path(p).resolve()),
                    "numWrites": -1,
                }
            )
        meta = {"partitionToWriteStats": stats, "operationType": "INSERT"}
        (self.hoodie_dir / f"{instant}.commit").write_text(json.dumps(meta, indent=1))
        return instant

    def replace_with_links(self, paths: list[str]) -> str:
        """INSERT_OVERWRITE_TABLE as a `.replacecommit` whose NEW file
        groups LINK existing parquet in place (absolute paths, nothing
        copied) while `partitionToReplaceFileIds` retires every
        currently-live group — the XTable sync primitive for a source
        overwrite commit: after it, the table's live set is exactly
        the linked files, and time travel to earlier instants still
        resolves the prior (linked) state. Unpartitioned only, like
        `link_files`."""
        if not paths:
            raise HudiError("replace_with_links requires at least one parquet file")
        if self.partition_by:
            raise HudiError("replace_with_links into a partitioned table is not supported")
        replaced: dict[str, list[str]] = {}
        try:
            for fid, part, _path in HudiTable(self.root).live_file_groups():
                replaced.setdefault(part, []).append(fid)
        except HudiError:
            pass  # empty timeline: a replace of nothing is an insert
        instant = self._next_instant()
        stats = {
            "": [
                {
                    "fileId": uuid.uuid4().hex[:8],
                    "path": str(Path(p).resolve()),
                    "numWrites": -1,
                }
                for p in paths
            ]
        }
        meta = {
            "partitionToWriteStats": stats,
            "partitionToReplaceFileIds": replaced,
            "operationType": "INSERT_OVERWRITE_TABLE",
        }
        (self.hoodie_dir / f"{instant}.replacecommit").write_text(json.dumps(meta, indent=1))
        return instant

    def replace_table(self, df: DataFrame) -> str:
        """INSERT_OVERWRITE_TABLE as a `.replacecommit`: one instant
        whose `partitionToWriteStats` carries the NEW file groups and
        whose `partitionToReplaceFileIds` marks every currently-live
        group replaced — readers drop them at this instant without any
        file being touched, so time travel to earlier instants still
        resolves the old state (until the cleaner reclaims it)."""
        import shutil
        import tempfile

        replaced: dict[str, list[str]] = {}
        try:
            for fid, part, _path in HudiTable(self.root).live_file_groups():
                replaced.setdefault(part, []).append(fid)
        except HudiError:
            pass  # empty timeline: a replace of nothing is an insert

        instant = self._next_instant()
        base_fid = uuid.uuid4().hex[:8]
        slices: list[tuple[str, list[str]]] = []
        tmps: list[str] = []
        if self.partition_by:
            from .partitioned_write import HIVE_NULL, hive_partitioned_write

            tmp_root, parts = hive_partitioned_write(
                df,
                self.partition_by,
                drop_partition_cols=False,
                max_partitions=self.max_partitions_per_commit,
            )
            tmps.append(tmp_root)
            for raw, files in parts:
                part_path = "/".join(
                    f"{c}={raw[c] if raw[c] is not None else HIVE_NULL}"
                    for c in self.partition_by
                )
                slices.append((part_path, files))
        else:
            tmp = tempfile.mkdtemp(prefix="hudi_replace_")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            tmps.append(tmp)
            slices.append(("", sorted(str(p) for p in Path(tmp).glob("*.parquet"))))

        stats: dict[str, list[dict]] = {}
        for part_path, files in slices:
            base = (
                f"{base_fid}-{part_path.replace('/', '_').replace('=', '-')}"
                if part_path
                else base_fid
            )
            rel_dir = self.root / part_path if part_path else self.root
            rel_dir.mkdir(parents=True, exist_ok=True)
            for i, src in enumerate(files):
                fid = base if i == 0 else f"{base}-{i}"
                rel = (f"{part_path}/" if part_path else "") + f"{fid}_0-0-0_{instant}.parquet"
                shutil.move(str(src), str(self.root / rel))
                stats.setdefault(part_path, []).append(
                    {"fileId": fid, "path": rel, "numWrites": -1}
                )
        for t in tmps:
            shutil.rmtree(t, ignore_errors=True)
        meta = {
            "partitionToWriteStats": stats,
            "partitionToReplaceFileIds": replaced,
            "operationType": "INSERT_OVERWRITE_TABLE",
        }
        (self.hoodie_dir / f"{instant}.replacecommit").write_text(json.dumps(meta, indent=1))
        return instant

    def cluster_small_file_groups(
        self,
        spark: SparkSession,
        small_bytes: int = 32 << 20,
        target_bytes: int = 128 << 20,
        min_small_groups: int = 2,
    ) -> dict:
        """CLUSTERING (r10) — Hudi's small-file layout optimizer as a
        partial `.replacecommit`: per partition, live file groups whose
        base file is under `small_bytes` merge into new right-sized
        group(s) (ceil(total/target) files); ONLY those group ids land
        in `partitionToReplaceFileIds`, so untouched groups stay live
        and time travel to pre-cluster instants still resolves (no file
        deleted — the cleaner reclaims). The CoW twin of Iceberg
        bin-pack / Delta OPTIMIZE, completing maintenance symmetry
        across the destination trio. One distributed read+write over
        the small groups only; control moves O(groups) paths."""
        import math
        import shutil
        import tempfile
        from collections import defaultdict

        t = HudiTable(self.root)
        try:
            live = t.live_file_groups()
        except HudiError:
            return {"clustered_groups": 0, "new_groups": 0}
        by_part: dict[str, list[tuple[str, str, int]]] = defaultdict(list)
        for fid, part, path in live:
            sz = Path(path).stat().st_size
            if sz < small_bytes:
                by_part[part].append((fid, path, sz))
        todo = {p: g for p, g in by_part.items() if len(g) >= min_small_groups}
        if not todo:
            return {"clustered_groups": 0, "new_groups": 0}
        instant = self._next_instant()
        stats: dict[str, list[dict]] = {}
        replaced: dict[str, list[str]] = {}
        n_new = 0
        for part, smalls in sorted(todo.items()):
            merged = spark.read.option("mergeSchema", "true").parquet(
                *[p for _f, p, _s in smalls]
            )
            k = max(1, math.ceil(sum(s for _f, _p, s in smalls) / target_bytes))
            tmp = tempfile.mkdtemp(prefix="hudi_cluster_")
            try:
                merged.coalesce(k).write.mode("overwrite").parquet(tmp)
                base = "c" + uuid.uuid4().hex[:8]
                rel_dir = self.root / part if part else self.root
                rel_dir.mkdir(parents=True, exist_ok=True)
                for i, src in enumerate(sorted(Path(tmp).glob("*.parquet"))):
                    fid = base if i == 0 else f"{base}-{i}"
                    rel = (f"{part}/" if part else "") + f"{fid}_0-0-0_{instant}.parquet"
                    shutil.move(str(src), str(self.root / rel))
                    stats.setdefault(part, []).append(
                        {"fileId": fid, "path": rel, "numWrites": -1}
                    )
                    n_new += 1
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            replaced[part] = sorted(f for f, _p, _s in smalls)
        meta = {
            "partitionToWriteStats": stats,
            "partitionToReplaceFileIds": replaced,
            "operationType": "CLUSTER",
        }
        (self.hoodie_dir / f"{instant}.replacecommit").write_text(
            json.dumps(meta, indent=1)
        )
        return {
            "clustered_groups": sum(len(v) for v in replaced.values()),
            "new_groups": n_new,
            "instant": instant,
        }

    def commit_file_groups(
        self,
        groups: list[tuple[str, str, list[str]]],
        operation: str = "UPSERT",
    ) -> str:
        """One commit from PRE-WRITTEN parquet files with explicit file
        groups: `groups` is [(fileId, partitionPath, [src files])] —
        each file becomes a NEW VERSION of its group named
        `<fileId>_<token>_<instant>.parquet` (newest instant per group
        wins at read, the copy-on-write supersession rule). The row
        data was written by the EXECUTORS (the destination's
        group-partitioned write); control moves O(files) paths and
        writes the timeline entry."""
        import shutil

        instant = self._next_instant()
        stats: dict[str, list[dict]] = {}
        for fid, part_path, files in groups:
            rel_dir = self.root / part_path if part_path else self.root
            rel_dir.mkdir(parents=True, exist_ok=True)
            for i, src in enumerate(files):
                gfid = fid if i == 0 else f"{fid}-{i}"
                rel = (
                    f"{part_path}/" if part_path else ""
                ) + f"{gfid}_0-0-0_{instant}.parquet"
                shutil.move(str(src), str(self.root / rel))
                stats.setdefault(part_path, []).append(
                    {"fileId": gfid, "path": rel, "numWrites": -1}
                )
        meta = {"partitionToWriteStats": stats, "operationType": operation}
        (self.hoodie_dir / f"{instant}.commit").write_text(json.dumps(meta, indent=1))
        return instant

    @property
    def hoodie_dir(self) -> Path:
        return self.root / ".hoodie"
