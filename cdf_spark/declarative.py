"""Declarative resources: TOML/dict declarations -> compiled pipelines.

Re-expresses the reference's declarative layer
(`crates/cdf-declarative/src/declarations.rs` -> `compiled.rs`;
contract compilation `crates/cdf-contract/src/compiler.rs:1-1362`;
artifact store `.cdf/compiled/<resource>@<hash>.json`,
`docs/architecture.md:29-31`): a resource is declared once —
source, schema, keys, cursor, contract, destination — compiled into
an immutable content-hashed artifact, and run by id.

Declaration shape (TOML or an equivalent dict):

    [resources.orders]
    source = { kind = "files", path = "/data/orders/*.parquet", format = "parquet" }
    schema = { id = "int64", amount = "float64", status = "utf8" }   # optional
    primary_key = ["id"]
    cursor = { field = "id" }
    write_disposition = "merge"
    dedup = { keys = ["id"], keep = "last" }

    [[resources.orders.contract.rules]]
    rule = "range"
    column = "amount"
    min = 0.0

    [[resources.orders.contract.transforms]]
    transform = "derive"
    column = "amount2"
    expression = "amount > 100"       # admitted predicate grammar

    [resources.orders.destination]
    kind = "parquet"
    path = "/warehouse/orders"
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

from .contracts.policy import (
    CastT,
    Contract,
    DedupRule,
    DeriveT,
    DomainRule,
    FilterT,
    FreshnessRule,
    NullabilityRule,
    RangeRule,
    RedactT,
    RegexRule,
    RenameT,
)
from .expressions.ast import parse_predicate_text
from .package.ledger import CheckpointLedger, ParquetDestination
from .runtime import LoadPipeline
from .sources.base import CursorSpec, ResourceDescriptor, WriteDisposition
from .sources.files import FileResource

_RULES = {
    "nullability": lambda d: NullabilityRule(d["column"], d.get("on_violation", "quarantine")),
    "domain": lambda d: DomainRule(d["column"], list(d.get("allowed", [])), d.get("on_violation", "quarantine")),
    "range": lambda d: RangeRule(d["column"], d.get("min"), d.get("max"), d.get("on_violation", "quarantine")),
    "regex": lambda d: RegexRule(d["column"], d.get("pattern", ".*"), d.get("on_violation", "quarantine")),
    "freshness": lambda d: FreshnessRule(d["column"], int(d.get("max_age_ms", 86_400_000)), d.get("on_violation", "freeze")),
    "dedup": lambda d: DedupRule(list(d.get("keys", [])), d.get("keep", "last"), d.get("on_violation", "quarantine")),
}

_TRANSFORMS = {
    "rename": lambda d: RenameT(d["from"], d["to"]),
    "cast": lambda d: CastT(d["column"], d["to"], bool(d.get("lossy_allowed", False))),
    "redact": lambda d: RedactT(d["column"], d.get("mode", "hash"), d.get("replacement", "***")),
    "derive": lambda d: DeriveT(d["column"], parse_predicate_text(d["expression"])),
    "filter": lambda d: FilterT(parse_predicate_text(d["expression"])),
}


class DeclarationError(ValueError):
    pass


@dataclass
class CompiledResource:
    resource_id: str
    declaration: dict
    artifact_hash: str

    def descriptor(self) -> ResourceDescriptor:
        d = self.declaration
        cursor = d.get("cursor")
        dedup = d.get("dedup", {})
        return ResourceDescriptor(
            resource_id=self.resource_id,
            schema=d.get("schema"),
            primary_key=list(d.get("primary_key", [])),
            merge_key=list(d.get("merge_key", d.get("primary_key", []))),
            cursor=CursorSpec(cursor["field"], cursor.get("initial_value")) if cursor else None,
            write_disposition=WriteDisposition(d.get("write_disposition", "append")),
            dedup_keys=list(dedup.get("keys", [])),
            dedup_keep=dedup.get("keep", "last"),
            trust_level=d.get("trust_level", "declared"),
        )

    def contract(self) -> Contract | None:
        c = self.declaration.get("contract")
        if not c:
            return None
        rules = []
        for r in c.get("rules", []):
            kind = r.get("rule", "").lower()
            if kind not in _RULES:
                raise DeclarationError(f"unknown rule kind {kind!r}")
            rules.append(_RULES[kind](r))
        transforms = []
        for t in c.get("transforms", []):
            kind = t.get("transform", "").lower()
            if kind not in _TRANSFORMS:
                raise DeclarationError(f"unknown transform kind {kind!r}")
            transforms.append(_TRANSFORMS[kind](t))
        return Contract(rules=rules, transforms=transforms)

    def streaming_pipeline(self, workspace: str | Path):
        """Build the streaming load pipeline for extent=drain/resident
        declarations:

            [resources.ev.stream]
            extent = "drain"              # or "resident"
            watermark = { column = "seq", delay = 20 }
            late_action = "quarantine"
        """
        from .streaming import StreamExtent, StreamingLoadPipeline, WatermarkPolicy
        from .types.schema import CanonicalSchema

        d = self.declaration
        src = d.get("source") or {}
        stream = d.get("stream") or {}
        if not d.get("schema"):
            raise DeclarationError("streaming resources require a declared schema")
        wm_cfg = stream.get("watermark")
        workspace = Path(workspace)
        dest_cfg = d.get("destination") or {}
        destination = _build_destination(
            dest_cfg, workspace, self.resource_id, self.descriptor().primary_key
        )
        return StreamingLoadPipeline(
            descriptor=self.descriptor(),
            source_path=src["path"],
            schema=CanonicalSchema.from_declared(d["schema"]).to_spark(),
            contract=self.contract(),
            watermark=WatermarkPolicy(wm_cfg["column"], float(wm_cfg.get("delay", 0))) if wm_cfg else None,
            late_action=stream.get("late_action", "quarantine"),
            package_root=str(workspace / "packages"),
            ledger_root=str(workspace / "ledger"),
            destination=destination,
            extent=StreamExtent(stream.get("extent", "drain")),
            source_format=src.get("format", "parquet"),
        )

    def pipeline(self, workspace: str | Path) -> LoadPipeline:
        d = self.declaration
        src = d.get("source") or {}
        desc = self.descriptor()
        resource = _build_resource(src, desc)
        workspace = Path(workspace)
        dest_cfg = d.get("destination") or {}
        destination = _build_destination(
            dest_cfg, workspace, self.resource_id, desc.merge_key or desc.primary_key
        )
        return LoadPipeline(
            resource=resource,
            contract=self.contract(),
            package_root=str(workspace / "packages"),
            ledger=CheckpointLedger(workspace / "ledger"),
            destination=destination,
            disposition=desc.write_disposition,
        )



class _TableFormatResource:
    """Adapter: an open-table-format reader (Iceberg / Delta / Hudi /
    snapshot) as a pipeline resource — descriptor + negotiated scan,
    with the declaration's pin (snapshot id / version / instant)
    applied on every scan. The same CompiledResource -> LoadPipeline
    path the reference compiles from TOML
    (`crates/cdf-declarative/src/declarations.rs`, `compiled.rs`)."""

    def __init__(self, descriptor: ResourceDescriptor, table, scan_kwargs: dict | None = None):
        self.descriptor = descriptor
        self.table = table
        self._kw = dict(scan_kwargs or {})

    def capabilities(self):
        return self.table.capabilities()

    def scan(self, spark, request):
        return self.table.scan(spark, request, **self._kw)


class _ReadResource:
    """Adapter: a read()-style resource (REST pages, python generator)
    as a negotiated scan. Pushdown capability is honest: none — every
    predicate is residual, enforced engine-side after the fetch; the
    cursor resume value still reaches the inner resource, which pushes
    it to its upstream (query param / context view)."""

    def __init__(self, inner):
        self.inner = inner
        self.descriptor = inner.descriptor

    def capabilities(self):
        from .plans.scan import Capability

        return Capability.text_format()

    def scan(self, spark, request):
        import inspect

        from .expressions.lowering import lower
        from .plans.scan import Capability, negotiate

        plan = negotiate(request, Capability.text_format())
        # pass the resume position only to resources whose read()
        # accepts it (REST/python push it upstream; a collection scan
        # has no resume parameter and the residual filter covers it)
        kwargs = {}
        if "cursor_resume" in inspect.signature(self.inner.read).parameters:
            kwargs["cursor_resume"] = request.cursor_resume_value
        out = self.inner.read(spark, **kwargs)
        df = out[0] if isinstance(out, tuple) else out
        if plan.projection:
            df = df.select(*plan.projection)
        for p in list(plan.pushed) + list(plan.residual):
            df = df.filter(lower(p.expr))
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df, plan


def _build_resource(src: dict, desc: ResourceDescriptor):
    """Source factory for declarative resources: `kind` selects the
    reader — files (glob manifests), iceberg / delta / hudi (open
    table formats, optionally pinned), duckdb / sqlite (DB-API scans
    with negotiated SQL pushdown), jdbc (Spark JDBC), rest (paged
    HTTP), python (dotted-path generator). All expose the same
    descriptor + scan(spark, request) surface LoadPipeline speaks."""
    kind = src.get("kind", "files")
    if kind == "files":
        return FileResource(
            desc,
            src["path"],
            format=src.get("format", "parquet"),
            **{k: str(v) for k, v in src.get("options", {}).items()},
        )
    if kind == "iceberg":
        from .sources.iceberg import IcebergTable

        kw = {}
        if src.get("snapshot_id") is not None:
            kw["snapshot_id"] = int(src["snapshot_id"])
        if src.get("as_of_timestamp_ms") is not None:
            kw["as_of_timestamp_ms"] = int(src["as_of_timestamp_ms"])
        return _TableFormatResource(desc, IcebergTable(src["path"]), kw)
    if kind == "delta":
        from .sources.delta import DeltaTable

        kw = {}
        if src.get("version") is not None:
            kw["version"] = int(src["version"])
        if src.get("as_of_timestamp_ms") is not None:
            kw["as_of_ms"] = int(src["as_of_timestamp_ms"])
        return _TableFormatResource(desc, DeltaTable(src["path"]), kw)
    if kind == "hudi":
        from pathlib import Path as _Path

        from .sources.hudi import HudiTable

        kw = {}
        if src.get("instant") is not None:
            kw["instant"] = str(src["instant"])
        if src.get("as_of_instant") is not None:
            kw["as_of_instant"] = str(src["as_of_instant"])
        # timeline decides the reader (same routing as the catalog):
        # `.deltacommit` instants -> merge-on-read
        if any((_Path(src["path"]) / ".hoodie").glob("*.deltacommit")):
            from .sources.hudi_mor import HudiMorTable

            return _TableFormatResource(desc, HudiMorTable(src["path"]), kw)
        return _TableFormatResource(desc, HudiTable(src["path"]), kw)
    if kind in ("duckdb", "sqlite"):
        from .sources.dbapi import DbApiResource

        path, table = src["path"], src["table"]
        if kind == "duckdb":
            def connect(p=path):
                import duckdb

                return duckdb.connect(p, read_only=True)
        else:
            def connect(p=path):
                import sqlite3

                return sqlite3.connect(p)
        return DbApiResource(desc, connect, table, arrow=(kind == "duckdb"))
    if kind == "jdbc":
        from .sources.jdbc import JdbcResource

        return JdbcResource(
            desc, url=src["url"], table=src["table"],
            **{k: str(v) for k, v in src.get("options", {}).items()},
        )
    if kind == "rest":
        from .sources.rest import Pagination, RestResource

        pg = src.get("pagination") or {}
        return _ReadResource(
            RestResource(
                descriptor=desc,
                url=src["url"],
                pagination=Pagination(**pg) if pg else Pagination(),
                params={k: str(v) for k, v in src.get("params", {}).items()},
                headers={k: str(v) for k, v in src.get("headers", {}).items()},
            )
        )
    if kind == "mongo":
        from .sources.mongo_source import MongoCollectionResource

        return _ReadResource(MongoCollectionResource(descriptor=desc, path=src["path"]))
    if kind == "clickhouse":
        from .package.clickhouse_dest import NativeTransport
        from .sources.clickhouse_source import ClickHouseScanResource

        dsn = src["dsn"]
        return ClickHouseScanResource(
            desc,
            transport_factory=lambda d=dsn: NativeTransport(d),
            table=src["table"],
            columns=[str(c) for c in src.get("columns", [])],
        )
    if kind == "python":
        import importlib

        from .sources.python_source import PythonResource

        target = src["callable"]
        mod_name, _, attr = target.partition(":")
        if not attr:
            mod_name, _, attr = target.rpartition(".")
        fn = getattr(importlib.import_module(mod_name), attr)
        fn = getattr(fn, "fn", fn)  # unwrap an @python_resource decoration
        return _ReadResource(PythonResource(descriptor=desc, fn=fn))
    raise DeclarationError(f"unknown source kind {kind!r}")


def _build_destination(dest_cfg: dict, workspace: Path, resource_id: str, merge_keys):
    """Destination factory for declarative resources: `kind` selects
    the sink — parquet (default), iceberg / delta / hudi (open table
    formats any engine reads), duckdb (database file), tombstone
    (merge-on-read parquet). All speak the same commit/verify
    protocol, so the pipeline wiring is identical."""
    if not dest_cfg:
        return None
    kind = dest_cfg.get("kind", "parquet")
    path = dest_cfg.get("path", workspace / "warehouse" / resource_id)
    if kind == "parquet":
        return ParquetDestination(path, merge_keys=merge_keys)
    if kind == "iceberg":
        from .package.iceberg_dest import IcebergDestination

        # TOML partition_by: strings (identity) or arrays like
        # ["bucket", 4, "col"] — the writer's transform vocabulary.
        # stage_branch = "audit" turns the commit/verify protocol into
        # Write-Audit-Publish: verification gates main-table VISIBILITY
        return IcebergDestination(
            path,
            merge_keys=merge_keys,
            partition_by=dest_cfg.get("partition_by"),
            stage_branch=dest_cfg.get("stage_branch"),
        )
    if kind == "delta":
        from .package.delta_dest import DeltaDestination

        # TOML partition_by: identity column names (Delta's native
        # partitioning); an existing table's spec wins on rehydrate.
        # uniform = "iceberg" turns on per-commit UniForm metadata
        # generation inside the table dir (package/delta_dest.py).
        return DeltaDestination(
            path,
            merge_keys=merge_keys,
            partition_by=dest_cfg.get("partition_by"),
            uniform=dest_cfg.get("uniform"),
        )
    if kind == "hudi":
        from .package.hudi_dest import HudiDestination

        # TOML partition_by: identity column names (Hudi's hive-style
        # partition paths); MERGE is flat-table copy-on-write upsert;
        # key_index="bloom" adds the per-group bloom routing cut
        return HudiDestination(
            path,
            merge_keys=merge_keys,
            partition_by=dest_cfg.get("partition_by"),
            key_index=dest_cfg.get("key_index", "stats"),
        )
    if kind == "hudi_mor":
        from .package.hudi_mor_dest import HudiMorDestination

        # merge-on-read: MERGE appends log blocks (O(batch) write
        # amplification — the streaming-upsert shape); compaction and
        # cleaning ride the auto-maintenance block. record_key defaults
        # to the single merge key.
        rk = dest_cfg.get("record_key") or (merge_keys[0] if merge_keys else None)
        if not rk:
            raise DeclarationError(
                "destination kind 'hudi_mor' needs record_key (or one merge key)"
            )
        return HudiMorDestination(
            path,
            record_key=rk,
            precombine=dest_cfg.get("precombine"),
            n_buckets=int(dest_cfg.get("n_buckets", 4)),
            partition_by=dest_cfg.get("partition_by"),
        )
    if kind == "duckdb":
        from .package.duckdb_dest import DuckDbDestination

        return DuckDbDestination(
            path, dest_cfg.get("table", resource_id), merge_keys=merge_keys
        )
    if kind == "tombstone":
        from .package.tombstone import TombstoneParquetDestination

        return TombstoneParquetDestination(path, merge_keys=merge_keys)
    raise DeclarationError(f"unknown destination kind {kind!r}")


class Workspace:
    """A declarative project: declarations + compiled artifacts + ledgers.

    Mirrors the reference's project layout: compiled resources are
    immutable JSON artifacts at `<workspace>/compiled/<id>@<hash>.json`.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        (self.root / "compiled").mkdir(parents=True, exist_ok=True)

    def load_declarations(self, path: str | Path) -> dict[str, dict]:
        import tomllib

        text = Path(path).read_text()
        doc = tomllib.loads(text)
        resources = doc.get("resources")
        if not isinstance(resources, dict) or not resources:
            raise DeclarationError("declaration document has no [resources.*] tables")
        return resources

    def compile(self, resource_id: str, declaration: dict) -> CompiledResource:
        """Validate + hash + persist the immutable compiled artifact."""
        compiled = CompiledResource(
            resource_id=resource_id,
            declaration=declaration,
            artifact_hash="",
        )
        # validation: these must construct
        compiled.descriptor()
        compiled.contract()
        dest = declaration.get("destination") or {}
        if dest.get("maintenance") and dest.get("kind", "parquet") not in ("iceberg", "delta"):
            raise DeclarationError(
                "destination.maintenance requires an iceberg or delta destination "
                f"(kind={dest.get('kind', 'parquet')!r} has no maintenance surface)"
            )
        js = json.dumps(declaration, sort_keys=True, default=str)
        h = hashlib.sha256(js.encode()).hexdigest()[:16]
        compiled.artifact_hash = f"sha256:{h}"
        artifact = self.root / "compiled" / f"{resource_id}@{h}.json"
        if not artifact.exists():
            artifact.write_text(
                json.dumps(
                    {"resource_id": resource_id, "hash": compiled.artifact_hash, "declaration": declaration},
                    indent=1,
                    default=str,
                )
            )
        return compiled

    def compile_file(self, path: str | Path) -> dict[str, CompiledResource]:
        return {rid: self.compile(rid, decl) for rid, decl in self.load_declarations(path).items()}

    def run(self, spark, compiled: CompiledResource):
        if compiled.declaration.get("stream"):
            result = compiled.streaming_pipeline(self.root).run(spark)
        else:
            result = compiled.pipeline(self.root).run(spark)
        self._maybe_maintain(spark, compiled)
        return result

    def _maybe_maintain(self, spark, compiled: CompiledResource) -> dict | None:
        """Declarative auto-maintenance: a
        `[resources.X.destination.maintenance]` table turns the policy
        orchestrator on after every successful run — per-epoch
        streaming commits stay bounded (small files, tombstones,
        snapshot history) without an external scheduler. The report is
        persisted as an evidence artifact under
        `<workspace>/maintenance/`, same discipline as compiled
        resources and ledgers."""
        dest_cfg = compiled.declaration.get("destination") or {}
        mcfg = dest_cfg.get("maintenance")
        if not mcfg or mcfg.get("auto", True) is False:
            return None
        from .package.maintenance import MaintenancePolicy, run_maintenance

        path = dest_cfg.get("path", self.root / "warehouse" / compiled.resource_id)
        fields = {k: int(v) for k, v in mcfg.items() if k != "auto"}
        unknown = set(fields) - set(MaintenancePolicy.__dataclass_fields__)
        if unknown:
            raise DeclarationError(f"unknown maintenance policy fields: {sorted(unknown)}")
        report = run_maintenance(spark, path, MaintenancePolicy(**fields))
        out_dir = self.root / "maintenance"
        out_dir.mkdir(exist_ok=True)
        (out_dir / f"{compiled.resource_id}.json").write_text(
            json.dumps(report, indent=1, default=str)
        )
        return report


# ---------------------------------------------------------------------------
# Declarative TRANSLATION jobs ([translations.NAME] tables): the
# cross-format metadata layer (package/xtable.py) driven from TOML like
# every source and destination kind — point-in-time ("snapshot") or
# incremental ("sync") in any of the six directions.

_TRANSLATION_SNAPSHOT = {
    ("delta", "iceberg"): "delta_to_iceberg",
    ("iceberg", "delta"): "iceberg_to_delta",
    ("hudi", "iceberg"): "hudi_to_iceberg",
    ("iceberg", "hudi"): "iceberg_to_hudi",
    ("delta", "hudi"): "delta_to_hudi",
    ("hudi", "delta"): "hudi_to_delta",
}
_TRANSLATION_SYNC = {
    ("delta", "iceberg"): "sync_delta_to_iceberg",
    ("iceberg", "delta"): "sync_iceberg_to_delta",
    ("hudi", "iceberg"): "sync_hudi_to_iceberg",
    ("iceberg", "hudi"): "sync_iceberg_to_hudi",
    ("delta", "hudi"): "sync_delta_to_hudi",
    ("hudi", "delta"): "sync_hudi_to_delta",
}


def run_translation(decl: dict) -> dict:
    """Execute one translation declaration:
    {source_format, source_path, target_format, target_path,
    mode: "sync" (default) | "snapshot"}."""
    from .package import xtable

    sf_, tf = decl.get("source_format"), decl.get("target_format")
    sp, tp = decl.get("source_path"), decl.get("target_path")
    mode = decl.get("mode", "sync")
    if not all((sf_, tf, sp, tp)):
        raise DeclarationError(
            "translation requires source_format, source_path, "
            "target_format, target_path"
        )
    table = _TRANSLATION_SYNC if mode == "sync" else _TRANSLATION_SNAPSHOT
    if mode not in ("sync", "snapshot"):
        raise DeclarationError(f"unknown translation mode {mode!r}")
    if mode == "snapshot":
        # point-in-time translation is one-shot: re-running it into an
        # existing target would LINK the same files again (duplicate
        # rows); repeated runs belong to mode="sync", whose cursor
        # makes them idempotent
        t = Path(str(tp))
        if any((t / d).exists() for d in ("_delta_log", "metadata", ".hoodie")):
            raise DeclarationError(
                f"snapshot translation target {tp!r} already exists — "
                "snapshot mode is one-shot; use mode = \"sync\" for "
                "repeated runs"
            )
    fn_name = table.get((str(sf_), str(tf)))
    if fn_name is None:
        raise DeclarationError(
            f"no {mode} translation from {sf_!r} to {tf!r} "
            f"(formats: delta, iceberg, hudi; source != target)"
        )
    # MERGE-ON-READ Hudi sources route to the compaction-gated MoR
    # legs (r12): the CoW reader would refuse the .deltacommit
    # timeline outright, but a compacted MoR table's read-optimized
    # view translates losslessly — same routing rule the catalog and
    # source kinds use
    if str(sf_) == "hudi" and any(
        (Path(str(sp)) / ".hoodie").glob("*.deltacommit")
    ):
        if mode == "sync":
            raise DeclarationError(
                "sync translation from a merge-on-read Hudi source is not "
                "supported (log deltas are Hudi-physical); run compaction "
                'and use mode = "snapshot", or replicate rows via CDC '
                "(cross_format_replication)"
            )
        fn_name = {"delta": "hudi_mor_to_delta", "iceberg": "hudi_mor_to_iceberg"}[
            str(tf)
        ]
    return getattr(xtable, fn_name)(sp, tp)


def _workspace_run_translations(self, path: str | Path) -> dict[str, dict]:
    """Run every [translations.NAME] table in a declaration file;
    reports persist under `<workspace>/translations/NAME.json` (the
    same evidence-artifact discipline as maintenance reports).
    Sync-mode jobs are idempotent — re-running a workspace re-syncs
    only new source commits."""
    import tomllib

    doc = tomllib.loads(Path(path).read_text())
    jobs = doc.get("translations") or {}
    if not isinstance(jobs, dict):
        raise DeclarationError("[translations] must be a table of named jobs")
    out: dict[str, dict] = {}
    out_dir = self.root / "translations"
    for name, decl in jobs.items():
        report = run_translation(decl)
        out_dir.mkdir(exist_ok=True)
        (out_dir / f"{name}.json").write_text(json.dumps(report, indent=1, default=str))
        out[name] = report
    return out


Workspace.run_translations = _workspace_run_translations


# ---------------------------------------------------------------------------
# Declarative INDEX jobs ([indexes.NAME] tables): the persisted
# incremental-index family (LM, NB, ExactSubstr, MinHash-LSH, IVF ANN,
# BM25 inverted, DSIR selector) driven from a declaration — build once,
# then every run folds ONLY the source rows past a durable cursor
# (monotone id/watermark column), the same
# declare-don't-script discipline the source/destination/translation
# kinds follow. Reference frame: the reference's TOML workspace is its
# defining control surface (crates/cdf-runtime/src/workspace);
# persisted index artifacts are the beyond-ref extension.

_INDEX_KINDS = ("bm25", "nb", "dsir", "ivf", "lm", "exact_substr", "minhash")


def _int_types():
    from pyspark.sql import types as T

    return (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


_INT_TYPES = _int_types()


def run_index_job(spark, decl: dict, cursor: int | None = None) -> dict:
    """Execute one index declaration incrementally:
    {kind, root, source, [predicate], [cursor_col], [id_col],
     [text_col], kind-specific knobs}. Folds rows with
    cursor_col > cursor (all rows when cursor is None) and returns
    {kind, rows_folded, cursor} — the caller persists the cursor, so
    re-runs are incremental and a no-delta run is a no-op.

    Crash-safety: the cursor file lands AFTER the fold, so a crash in
    between re-offers the same batch — the fold itself must be the
    fence. The batch watermark (max cursor value, a strictly
    increasing integer across runs) is passed as the index `epoch`,
    so a replayed fold is a fenced no-op for every kind that carries
    the fence (all but minhash — its add() is append-only without an
    epoch; the report's `fenced` field says which contract a job
    got). The cursor column must be INTEGER-valued (ids, epoch
    millis): that is what makes the watermark an epoch; a
    non-integer column refuses up front instead of folding and then
    failing to record the cursor."""
    from pyspark.sql import functions as F

    kind, root, source = decl.get("kind"), decl.get("root"), decl.get("source")
    if kind not in _INDEX_KINDS:
        raise DeclarationError(f"unknown index kind {kind!r} (kinds: {_INDEX_KINDS})")
    if not root or not source:
        raise DeclarationError("index job requires kind, root, source")
    id_col = decl.get("id_col", "vec_id" if kind == "ivf" else "doc_id")
    text_col = decl.get("text_col", "text")
    cursor_col = decl.get("cursor_col", id_col)
    df = spark.read.parquet(str(source))
    if cursor_col not in df.columns:
        raise DeclarationError(
            f"index cursor column {cursor_col!r} not in source schema "
            f"({', '.join(df.columns)})"
        )
    if not isinstance(df.schema[cursor_col].dataType, _INT_TYPES):
        raise DeclarationError(
            f"index cursor column {cursor_col!r} must be integer-typed "
            f"(got {df.schema[cursor_col].dataType.simpleString()}) — the "
            "watermark doubles as the replay-fence epoch"
        )
    if decl.get("predicate"):
        df = df.filter(str(decl["predicate"]))
    from pathlib import Path as _P

    # the index's OWN recorded watermark is the authoritative fence:
    # a crashed run may have folded rows the cursor file never saw,
    # and NEW rows may have landed since — a retry that re-selects
    # `> stale cursor` would otherwise mix already-folded rows into a
    # higher-watermark batch and double-fold them past the epoch
    # check. Folding strictly ABOVE max(cursor, index last_epoch)
    # re-offers only genuinely unfolded rows. (exact_substr records
    # no meta watermark but its novel-gram anti-join fold is
    # idempotent by construction; minhash has neither — its report
    # says fenced=false.)
    meta_p = _P(str(root)) / "meta.json"
    built = meta_p.exists()
    fence = None
    if built:
        try:
            fence = json.loads(meta_p.read_text()).get("last_epoch")
        except Exception:  # noqa: BLE001 — unreadable meta: job cursor only
            fence = None
    eff = cursor
    if fence is not None and int(fence) >= 0:
        eff = int(fence) if eff is None else max(int(eff), int(fence))
    batch = df if eff is None else df.filter(F.col(cursor_col) > F.lit(eff))
    hi, n = batch.agg(F.max(cursor_col), F.count(F.lit(1))).collect()[0]
    fenced = kind not in ("minhash",)
    if not n:
        return {
            "kind": kind,
            "root": str(root),
            "rows_folded": 0,
            "cursor": eff if eff is not None else cursor,
            "fenced": fenced,
        }
    epoch = int(hi)
    if kind == "bm25":
        from .operators.retrieval import InvertedIndex

        idx = InvertedIndex(root)
        (idx.add if built else idx.build)(
            spark, batch, text_col=text_col, id_col=id_col, epoch=epoch
        )
    elif kind == "nb":
        from .operators.classifier import NBIndex

        NBIndex(root).update(
            spark,
            batch,
            text_col=text_col,
            label_col=decl.get("label_col", "lang"),
            epoch=epoch,
        )
    elif kind == "lm":
        from .operators.curation import LMIndex

        LMIndex(root).update(spark, batch, text_col=text_col, id_col=id_col, epoch=epoch)
    elif kind == "dsir":
        from .operators.curation import DSIRIndex

        idx = DSIRIndex(root)
        if not built:
            tpath = decl.get("target")
            if not tpath:
                raise DeclarationError(
                    "dsir index requires target (the reference-set parquet path)"
                )
            target = spark.read.parquet(str(tpath))
            if decl.get("target_predicate"):
                target = target.filter(str(decl["target_predicate"]))
            idx.build(spark, target, text_col=text_col, dim=int(decl.get("dim", 4096)))
        idx.update(spark, batch, text_col=text_col, epoch=epoch)
    elif kind == "ivf":
        from .operators.similarity import IVFIndex

        idx = IVFIndex(root)
        vec_col = decl.get("vec_col", "embedding")
        if built:
            idx.add(spark, batch, id_col=id_col, vec_col=vec_col, epoch=epoch)
        else:
            idx.build(
                spark,
                batch,
                centroid_modulus=int(decl.get("centroid_modulus", 50)),
                id_col=id_col,
                vec_col=vec_col,
                epoch=epoch,
            )
    elif kind == "exact_substr":
        from .operators.curation import ExactSubstrIndex

        idx = ExactSubstrIndex(root)
        if built:
            idx.add(batch, text_col=text_col, id_col=id_col, epoch=epoch)
        else:
            idx.build(batch, text_col=text_col, id_col=id_col, k=int(decl.get("gram_k", 10)))
    elif kind == "minhash":
        from .operators.dedup_approx import MinHashLSHIndex

        idx = MinHashLSHIndex(root)
        if built:
            idx.add(batch, text_col=text_col, id_col=id_col)
        else:
            idx.build(
                batch,
                text_col=text_col,
                id_col=id_col,
                hash_fn=decl.get("hash_fn", "xxhash64"),
            )
    return {
        "kind": kind,
        "root": str(root),
        "rows_folded": int(n),
        "cursor": epoch,
        "fenced": fenced,
    }


def _workspace_run_indexes(self, spark, path: str | Path) -> dict[str, dict]:
    """Run every [indexes.NAME] table in a declaration file. Each
    job's cursor persists at `<workspace>/indexes/NAME.cursor.json`
    — repeated runs fold only rows past it (a no-delta run is a
    no-op); reports land beside it (the evidence-artifact
    discipline maintenance and translations follow)."""
    import tomllib

    doc = tomllib.loads(Path(path).read_text())
    jobs = doc.get("indexes") or {}
    if not isinstance(jobs, dict):
        raise DeclarationError("[indexes] must be a table of named jobs")
    out: dict[str, dict] = {}
    out_dir = self.root / "indexes"
    out_dir.mkdir(exist_ok=True)
    for name, decl in jobs.items():
        cfile = out_dir / f"{name}.cursor.json"
        cursor = json.loads(cfile.read_text())["cursor"] if cfile.exists() else None
        report = run_index_job(spark, decl, cursor)
        if report["cursor"] is not None:
            tmp = out_dir / f"{name}.cursor.json.tmp"
            tmp.write_text(json.dumps({"cursor": report["cursor"]}))
            tmp.replace(cfile)
        (out_dir / f"{name}.json").write_text(json.dumps(report, indent=1, default=str))
        out[name] = report
    return out


Workspace.run_indexes = _workspace_run_indexes


# Declarative VIEW jobs ([views.NAME] tables): incremental view
# maintenance driven from a declaration — initialize once from the
# Delta snapshot, then every run folds the change feed past the
# view's own Delta-version cursor (the artifact is self-fencing, so
# unlike [indexes.*] no workspace cursor file is needed). Same
# declare-don't-script discipline as the source/destination/
# translation/index kinds.


def run_view_job(spark, decl: dict) -> dict:
    """Execute one materialized-view declaration:
    {table, root, keys, sums, mins?, maxs?, extreme_k?, format?}.
    Builds on first run, refreshes after; returns
    {action: build|refresh|noop, version, cursor, ...}. The declared
    spec must match an already-initialized artifact — a drifted
    declaration refuses instead of silently serving an aggregate with
    different semantics. `format` picks the change-feed leg (delta /
    iceberg / hudi); mins/maxs ride the r13 bounded-heap maintenance."""
    from .operators.matview import MaterializedAggregate

    table, root = decl.get("table"), decl.get("root")
    keys = decl.get("keys")
    sums = decl.get("sums") or []
    mins = decl.get("mins") or []
    maxs = decl.get("maxs") or []
    if not table or not root:
        raise DeclarationError("view job requires table (delta root) and root")
    if not isinstance(keys, list) or not keys:
        raise DeclarationError("view job requires a non-empty keys list")
    for name, v in (("sums", sums), ("mins", mins), ("maxs", maxs)):
        if not isinstance(v, list):
            raise DeclarationError(f"view job {name} must be a list")
    if not (sums or mins or maxs):
        raise DeclarationError("view job requires at least one of sums/mins/maxs")
    keys = [str(k) for k in keys]
    sums, mins, maxs = [str(c) for c in sums], [str(c) for c in mins], [str(c) for c in maxs]
    mv = MaterializedAggregate(root)
    meta0 = mv._meta()
    if meta0 is None:
        meta = mv.build(
            spark,
            str(table),
            keys=keys,
            sums=sums,
            mins=mins,
            maxs=maxs,
            extreme_k=int(decl.get("extreme_k", 16)),
            source_format=str(decl.get("format", "delta")),
        )
        action = "build"
    else:
        declared = (
            keys, sums, mins, maxs,
            str(decl.get("format", "delta")),
            int(decl.get("extreme_k", 16)) if (mins or maxs) else int(meta0.get("extreme_k", 16)),
        )
        recorded = (
            meta0["keys"],
            meta0["sums"],
            meta0.get("mins", []),
            meta0.get("maxs", []),
            meta0.get("format", "delta"),
            int(meta0.get("extreme_k", 16)),
        )
        if recorded != declared:
            raise DeclarationError(
                f"view spec drift: artifact at {root} is keyed "
                f"{recorded}, declaration says {declared} — "
                "declare a new root for a different aggregate"
            )
        meta = mv.refresh(spark)
        action = "noop" if meta["cursor"] == meta0["cursor"] else "refresh"
    return {
        "root": str(root),
        "table": str(table),
        "action": action,
        "version": meta["version"],
        "cursor": meta["cursor"],
    }


def _workspace_run_views(self, spark, path: str | Path) -> dict[str, dict]:
    """Run every [views.NAME] table in a declaration file; reports
    land under `<workspace>/views/` (the evidence-artifact discipline
    maintenance/translations/indexes follow)."""
    import tomllib

    doc = tomllib.loads(Path(path).read_text())
    jobs = doc.get("views") or {}
    if not isinstance(jobs, dict):
        raise DeclarationError("[views] must be a table of named jobs")
    out: dict[str, dict] = {}
    out_dir = self.root / "views"
    out_dir.mkdir(exist_ok=True)
    for name, decl in jobs.items():
        report = run_view_job(spark, decl)
        (out_dir / f"{name}.json").write_text(json.dumps(report, indent=1, default=str))
        out[name] = report
    return out


Workspace.run_views = _workspace_run_views


# Declarative DRIFT MONITOR jobs ([monitors.NAME] tables): population-
# stability alarms driven from a declaration — the first run pins the
# table's CURRENT version/snapshot/instant as the baseline; every later
# run time-travels back to that baseline and reports the PSI of the
# current snapshot against it (Siddiqi's conventional reading: < 0.10
# stable, 0.10-0.25 drifting, > 0.25 shifted — thresholds in micro
# units, overridable). `rebaseline = true` re-pins after reporting.
# Same declare-don't-script discipline as the other kinds; the
# baseline artifact is self-fencing like a view's cursor.


def run_monitor_job(spark, decl: dict) -> dict:
    """Execute one drift-monitor declaration: {table, root, column,
    format?, bins?, by?, drifting_unat?, shifted_unat?, rebaseline?}.
    First run records the baseline cursor (action=baseline); later
    runs report {action: report, total_psi_unat, verdict, bins,
    baseline_cursor, cursor}. With ``by`` (a stratum column —
    language/domain/source), the PSI is computed per stratum in one
    pass (`operators/drift.psi_drift_by`, numeric equal-width only)
    and the report carries per-stratum verdicts under ``strata`` plus
    the WORST stratum's verdict as the headline — the production cut
    that catches a drift confined to one slice."""
    from .operators.drift import psi_drift, psi_drift_by
    from .operators.index_base import IndexArtifact
    from .operators.matview import _FORMATS

    table, root, column = decl.get("table"), decl.get("root"), decl.get("column")
    if not table or not root or not column:
        raise DeclarationError("monitor job requires table, root and column")
    fmt = str(decl.get("format", "delta"))
    if fmt not in _FORMATS:
        raise DeclarationError(
            f"unknown monitor format {fmt!r} (formats: {sorted(_FORMATS)})"
        )
    bins = decl.get("bins")
    if bins is not None:
        bins = int(bins)
    by = decl.get("by")
    if by is not None and bins is None:
        raise DeclarationError(
            "per-stratum monitors (by=...) are numeric equal-width — set bins"
        )
    drifting = int(decl.get("drifting_unat", 100_000))
    shifted = int(decl.get("shifted_unat", 250_000))
    if not 0 < drifting < shifted:
        raise DeclarationError("need 0 < drifting_unat < shifted_unat")

    art = IndexArtifact(root)
    t = _FORMATS[fmt](str(table))
    cur = t.cursor()
    meta = art._meta()
    if meta is None:
        meta = {
            "table": str(table), "format": fmt, "column": str(column),
            "bins": bins,
            "baseline": cur if isinstance(cur, str) else int(cur),
        }
        if by is not None:
            meta["by"] = str(by)
        art._swap_meta(meta)
        return {**meta, "action": "baseline", "cursor": meta["baseline"]}
    if (
        meta["table"], meta.get("format", "delta"), meta["column"],
        meta.get("bins"), meta.get("by"),
    ) != (
        str(table), fmt, str(column), bins, str(by) if by is not None else None
    ):
        raise DeclarationError(
            f"monitor spec drift: artifact at {root} watches "
            f"{meta['table']}/{meta['column']} (bins={meta.get('bins')}, "
            f"by={meta.get('by')}), declaration says {table}/{column} "
            f"(bins={bins}, by={by}) — a changed binning or stratum "
            "column silently reinterprets PSI against the pinned baseline"
        )
    import pyspark.sql.functions as _F

    def _verdict(total: int) -> str:
        return "stable" if total < drifting else (
            "drifting" if total < shifted else "shifted"
        )

    if by is not None:
        per_bin = psi_drift_by(
            t.snapshot(spark, meta["baseline"]),
            t.snapshot(spark, cur),
            str(column),
            by=str(by),
            bins=bins,
        )
        rows = (
            per_bin.groupBy("stratum")
            .agg(
                _F.count(_F.lit(1)).alias("nb"),
                _F.coalesce(_F.sum("psi_unat"), _F.lit(0)).alias("tot"),
            )
            .collect()
        )
        strata = {
            str(r["stratum"]): {
                "bins": int(r["nb"]),
                "total_psi_unat": int(r["tot"]),
                "verdict": _verdict(int(r["tot"])),
            }
            for r in rows
        }
        if not strata:
            # every stratum excluded (NULL-keyed by column, or no
            # stratum has spread): a dead monitor must not report
            # healthy — mirror the single-column path's refusal
            raise DeclarationError(
                f"monitor {table}/{column} by={by}: every stratum was "
                "excluded (NULL stratum keys or no spread in the "
                "baseline) — nothing to certify"
            )
        worst = max(s["total_psi_unat"] for s in strata.values())
        report = {
            "action": "report",
            "table": str(table), "format": fmt, "column": str(column),
            "by": str(by),
            "baseline_cursor": meta["baseline"],
            "cursor": cur if isinstance(cur, str) else int(cur),
            "bins": bins,  # the declared per-stratum bin count
            "total_psi_unat": worst,  # headline = worst stratum
            "verdict": _verdict(worst),
            "strata": strata,
        }
        if bool(decl.get("rebaseline", False)):
            art._swap_meta({**meta, "baseline": report["cursor"]})
            report["rebaselined"] = True
        return report

    per_bin = psi_drift(
        t.snapshot(spark, meta["baseline"]),
        t.snapshot(spark, cur),
        str(column),
        bins=bins,
    )
    n_bins, total = per_bin.agg(
        _F.count(_F.lit(1)), _F.coalesce(_F.sum("psi_unat"), _F.lit(0))
    ).collect()[0]
    total = int(total)
    verdict = _verdict(total)
    report = {
        "action": "report",
        "table": str(table), "format": fmt, "column": str(column),
        "baseline_cursor": meta["baseline"],
        "cursor": cur if isinstance(cur, str) else int(cur),
        "bins": int(n_bins),
        "total_psi_unat": total,
        "verdict": verdict,
    }
    if bool(decl.get("rebaseline", False)):
        art._swap_meta({**meta, "baseline": report["cursor"]})
        report["rebaselined"] = True
    return report


def _workspace_run_monitors(self, spark, path: str | Path) -> dict[str, dict]:
    """Run every [monitors.NAME] table in a declaration file; reports
    land under `<workspace>/monitors/` (the evidence-artifact
    discipline views/translations/indexes follow)."""
    import tomllib

    doc = tomllib.loads(Path(path).read_text())
    jobs = doc.get("monitors") or {}
    if not isinstance(jobs, dict):
        raise DeclarationError("[monitors] must be a table of named jobs")
    out: dict[str, dict] = {}
    out_dir = self.root / "monitors"
    out_dir.mkdir(exist_ok=True)
    for name, decl in jobs.items():
        report = run_monitor_job(spark, decl)
        (out_dir / f"{name}.json").write_text(json.dumps(report, indent=1, default=str))
        out[name] = report
    return out


Workspace.run_monitors = _workspace_run_monitors
