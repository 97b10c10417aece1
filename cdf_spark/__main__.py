"""CLI: the engine's control-plane verbs on Spark.

Command surface mirrors the reference CLI
(`crates/cdf-cli-core/src/args.rs:48-68`: Init/Add/Discover/Compile/
Validate/Plan/Explain/Run/Preview/Sql/Inspect/Schema/Contract/State/
Backfill/Package/Doctor/Status), re-expressed over the declarative
workspace + LoadPipeline machinery:

    python -m cdf_spark init      [dir] [--name N]
    python -m cdf_spark add       <resource_id> <location> [--source kind]
    python -m cdf_spark discover  <path> [--generate] [--declarations cdf.toml]
    python -m cdf_spark compile   <decl.toml> --workspace ws/
    python -m cdf_spark validate  <decl.toml>
    python -m cdf_spark plan      <decl.toml> <resource> [--project a,b] [--filter EXPR] [--limit N]
    python -m cdf_spark explain   <decl.toml> <resource> [...same scan args]
    python -m cdf_spark run       <decl.toml> <resource> --workspace ws/
    python -m cdf_spark preview   <decl.toml> <resource> [--rows 20]
    python -m cdf_spark sql       "<SELECT over checkpoints/receipts/packages>" --workspace ws/
    python -m cdf_spark inspect   <package_dir>
    python -m cdf_spark schema    <decl.toml> <resource>
    python -m cdf_spark contract  <decl.toml> <resource>
    python -m cdf_spark state     show|reset <resource> --workspace ws/
    python -m cdf_spark backfill  <decl.toml> <resource> --from V --to V
    python -m cdf_spark package   list|verify [path] --workspace ws/
    python -m cdf_spark doctor    [--spark]
    python -m cdf_spark status    --workspace ws/

Spark-free commands (init/add/discover/compile/validate/plan/inspect/
contract/state/package-list/doctor/status) never start a session —
control-plane latency stays sub-second.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_INIT_TOML = """# cdf_spark declarations — one [resources.<id>] table per resource.
# Run:  python -m cdf_spark run cdf.toml <id> --workspace {ws}
#
# [resources.example]
# source = {{ kind = "files", path = "/data/example/*.parquet", format = "parquet" }}
# primary_key = ["id"]
# cursor = {{ field = "id" }}
# [resources.example.destination]
# kind = "parquet"
"""


def _scan_request(args, resource_id: str):
    from .expressions.ast import parse_predicate_text
    from .plans.scan import ScanRequest

    preds = [parse_predicate_text(f) for f in (args.filter or [])]
    proj = args.project.split(",") if getattr(args, "project", None) else None
    return ScanRequest(
        resource_id=resource_id,
        projection=proj,
        predicates=preds,
        limit=getattr(args, "limit", None),
    )


def _compiled(ws, path: str, resource: str):
    compiled = ws.compile_file(path)
    if resource not in compiled:
        raise SystemExit(f"unknown resource {resource!r}; have {sorted(compiled)}")
    return compiled[resource]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cdf_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("init", help="scaffold a workspace + declaration stub")
    p.add_argument("directory", nargs="?", default=".")
    p.add_argument("--name", default="cdf.toml")
    p.add_argument("--force", action="store_true")

    p = sub.add_parser("add", help="append a resource declaration")
    p.add_argument("resource_id")
    p.add_argument("location")
    p.add_argument("--source", default="files")
    p.add_argument("--format", default="parquet")
    p.add_argument("--declarations", default="cdf.toml")
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser("discover", help="enumerate resources at a location")
    p.add_argument("path")
    p.add_argument("--generate", action="store_true", help="append declarations")
    p.add_argument("--declarations", default="cdf.toml")

    p = sub.add_parser("compile", help="compile declarations to immutable artifacts")
    p.add_argument("declarations")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("validate", help="compile-check declarations, report per resource")
    p.add_argument("declarations")

    p = sub.add_parser("plan", help="negotiated scan plan (no execution, no Spark)")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--project")
    p.add_argument("--filter", action="append")
    p.add_argument("--limit", type=int)
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("explain", help="Spark physical plan for a negotiated scan")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--project")
    p.add_argument("--filter", action="append")
    p.add_argument("--limit", type=int)
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("run", help="run one resource's load pipeline")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("translate", help="run [translations.*] jobs (xtable sync/snapshot)")
    p.add_argument("declarations")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("index", help="run [indexes.*] jobs (incremental persisted indexes)")
    p.add_argument("declarations")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("view", help="run [views.*] jobs (incremental materialized views)")
    p.add_argument("declarations")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("monitor", help="run [monitors.*] jobs (PSI drift monitors)")
    p.add_argument("declarations")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("preview", help="bounded deterministic preview")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--rows", type=int, default=20)
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("sql", help="read-only SQL over system metadata")
    p.add_argument("query")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("inspect", help="package manifest + evidence summary")
    p.add_argument("package_dir")

    p = sub.add_parser("schema", help="declared (or scan-inferred) schema")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("contract", help="compiled contract rules/transforms")
    p.add_argument("declarations")
    p.add_argument("resource")

    p = sub.add_parser("state", help="checkpoint positions")
    p.add_argument("action", choices=["show", "reset"])
    p.add_argument("resource")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("backfill", help="re-run a cursor window (no checkpoint advance)")
    p.add_argument("declarations")
    p.add_argument("resource")
    p.add_argument("--from", dest="lo", required=True)
    p.add_argument("--to", dest="hi", required=True)
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("package", help="list / verify built packages")
    p.add_argument("action", choices=["list", "verify"])
    p.add_argument("path", nargs="?")
    p.add_argument("--workspace", default=".cdf_spark")

    p = sub.add_parser("doctor", help="environment checks")
    p.add_argument("--spark", action="store_true", help="also start a session")

    p = sub.add_parser("status", help="ledger summary: positions + receipts")
    p.add_argument("--workspace", default=".cdf_spark")

    args = ap.parse_args(argv)

    # ---- spark-free control-plane verbs -------------------------------
    if args.cmd == "init":
        d = Path(args.directory)
        d.mkdir(parents=True, exist_ok=True)
        decl = d / args.name
        if decl.exists() and not args.force:
            print(f"{decl} exists (use --force)", file=sys.stderr)
            return 2
        ws = d / ".cdf_spark"
        decl.write_text(_INIT_TOML.format(ws=ws))
        (ws / "compiled").mkdir(parents=True, exist_ok=True)
        print(f"initialized {decl} + {ws}/")
        return 0

    if args.cmd == "add":
        block = (
            f"\n[resources.{args.resource_id}]\n"
            f'source = {{ kind = "{args.source}", path = "{args.location}"'
            + (f', format = "{args.format}"' if args.source == "files" else "")
            + " }\n"
        )
        if args.dry_run:
            print(block, end="")
            return 0
        with open(args.declarations, "a") as f:
            f.write(block)
        print(f"added resources.{args.resource_id} -> {args.declarations}")
        return 0

    if args.cmd == "discover":
        found = _discover(args.path)
        for rid, src in found:
            print(f"{rid}\t{src['kind']}\t{src['path']}" + (f"\t{src['table']}" if "table" in src else ""))
        if args.generate and found:
            with open(args.declarations, "a") as f:
                for rid, src in found:
                    f.write(f"\n[resources.{rid}]\nsource = " + _toml_inline(src) + "\n")
            print(f"appended {len(found)} declarations -> {args.declarations}")
        return 0

    from .declarative import DeclarationError, Workspace

    if args.cmd == "validate":
        ws = Workspace(Path(args.declarations).parent / ".cdf_spark_validate")
        ok = True
        import tomllib

        doc = tomllib.loads(Path(args.declarations).read_text())
        for rid, decl in (doc.get("resources") or {}).items():
            try:
                c = ws.compile(rid, decl)
                c.pipeline(ws.root)  # construct the full path (source + dest)
                print(f"{rid}\tOK\t{c.artifact_hash}")
            except Exception as exc:  # noqa: BLE001 — per-resource report
                ok = False
                print(f"{rid}\tERROR\t{type(exc).__name__}: {exc}")
        return 0 if ok else 1

    ws = Workspace(getattr(args, "workspace", ".cdf_spark"))

    if args.cmd == "compile":
        compiled = ws.compile_file(args.declarations)
        for rid, c in compiled.items():
            print(f"{rid}\t{c.artifact_hash}")
        return 0

    if args.cmd == "plan":
        from .plans.scan import negotiate

        c = _compiled(ws, args.declarations, args.resource)
        res = c.pipeline(ws.root).resource
        plan = negotiate(_scan_request(args, args.resource), res.capabilities())
        print(json.dumps(plan.to_json_obj(), indent=1))
        return 0

    if args.cmd == "contract":
        c = _compiled(ws, args.declarations, args.resource)
        ct = c.contract()
        if ct is None:
            print(json.dumps({"rules": [], "transforms": [], "hash": None}))
            return 0
        print(
            json.dumps(
                {
                    "rules": [repr(r) for r in ct.rules],
                    "transforms": [repr(t) for t in ct.transforms],
                    "hash": ct.content_hash(),
                },
                indent=1,
            )
        )
        return 0

    if args.cmd == "inspect":
        pkg = Path(args.package_dir)
        manifest = json.loads((pkg / "manifest.json").read_text())
        out = {"manifest": manifest}
        stats_p = pkg / "stats" / "column_stats.json"
        if stats_p.exists():
            st = json.loads(stats_p.read_text())
            out["rows"] = st.get("__table", {}).get("rows")
            out["columns"] = sorted(k for k in st if k != "__table")
        plan_p = pkg / "plan" / "scan_plan.json"
        if plan_p.exists():
            out["plan"] = json.loads(plan_p.read_text())
        print(json.dumps(out, indent=1, default=str))
        return 0

    if args.cmd == "state":
        from .package.ledger import CheckpointLedger

        ledger = CheckpointLedger(ws.root / "ledger")
        if args.action == "show":
            entry = ledger.latest(args.resource)
            print(json.dumps(entry.__dict__ if entry else None, default=str, indent=1))
            return 0
        # reset: drop this resource's checkpoint entries (receipts kept
        # — they are evidence, not positions)
        ck = ledger.checkpoints
        if ck.exists():
            kept = [
                ln
                for ln in ck.read_text().splitlines()
                if ln.strip() and json.loads(ln).get("resource_id") != args.resource
            ]
            ck.write_text("\n".join(kept) + ("\n" if kept else ""))
        print(f"reset checkpoints for {args.resource}")
        return 0

    if args.cmd == "package" and args.action == "list":
        pk_root = ws.root / "packages"
        rows = []
        if pk_root.exists():
            for m in sorted(pk_root.glob("*/manifest.json")):
                mf = json.loads(m.read_text())
                rows.append(
                    {
                        "package_id": mf.get("package_id"),
                        "resource": mf.get("resource_id"),
                        "rows": mf.get("rows_admitted"),
                        "path": str(m.parent),
                    }
                )
        print(json.dumps(rows, indent=1))
        return 0

    if args.cmd == "status":
        from .package.ledger import CheckpointLedger

        ledger = CheckpointLedger(ws.root / "ledger")
        resources: dict[str, dict] = {}
        if ledger.checkpoints.exists():
            for ln in ledger.checkpoints.read_text().splitlines():
                if not ln.strip():
                    continue
                e = json.loads(ln)
                resources[e["resource_id"]] = {
                    "positions": e.get("positions"),
                    "receipt_id": e.get("receipt_id"),
                }
        n_receipts = 0
        if ledger.receipts.exists():
            n_receipts = sum(1 for ln in ledger.receipts.read_text().splitlines() if ln.strip())
        print(json.dumps({"resources": resources, "receipts": n_receipts}, indent=1, default=str))
        return 0

    if args.cmd == "doctor":
        report = {}
        import platform

        report["python"] = platform.python_version()
        for mod in ("pyspark", "pyarrow", "pandas", "numpy", "duckdb"):
            try:
                report[mod] = __import__(mod).__version__
            except Exception as exc:  # noqa: BLE001
                report[mod] = f"ERROR: {exc}"
        import os

        report["java_home"] = os.environ.get("JAVA_HOME")
        try:
            ws.root.mkdir(parents=True, exist_ok=True)
            probe = ws.root / ".doctor_probe"
            probe.write_text("ok")
            probe.unlink()
            report["workspace_writable"] = True
        except Exception:  # noqa: BLE001
            report["workspace_writable"] = False
        if args.spark:
            from .session import get_spark

            s = get_spark("cdf-doctor")
            report["spark"] = s.version
            report["spark_parallelism"] = s.sparkContext.defaultParallelism
            s.stop()
        print(json.dumps(report, indent=1))
        return 0 if report.get("workspace_writable") else 1

    # ---- spark-backed verbs ------------------------------------------
    from pyspark.sql import SparkSession

    # translation jobs are metadata-only — no Spark session needed
    if args.cmd == "translate":
        print(json.dumps(ws.run_translations(args.declarations), default=str))
        return 0

    from .session import get_spark

    # only stop a session WE created: getOrCreate() returns the host
    # application's session when one exists (e.g. main() called from
    # a test or notebook), and stopping that would kill the host
    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark("cdf-spark-cli")

    if args.cmd == "index":
        try:
            print(json.dumps(ws.run_indexes(spark, args.declarations), default=str))
        finally:
            if not pre_existing:
                spark.stop()
        return 0
    if args.cmd == "view":
        try:
            print(json.dumps(ws.run_views(spark, args.declarations), default=str))
        finally:
            if not pre_existing:
                spark.stop()
        return 0
    if args.cmd == "monitor":
        try:
            print(json.dumps(ws.run_monitors(spark, args.declarations), default=str))
        finally:
            if not pre_existing:
                spark.stop()
        return 0
    try:
        if args.cmd == "run":
            result = ws.run(spark, _compiled(ws, args.declarations, args.resource))
            print(
                json.dumps(
                    {
                        "resource": args.resource,
                        "package_id": result.package.package_id,
                        "rows_admitted": result.rows_admitted,
                        "rows_quarantined": result.rows_quarantined,
                        "receipt_verified": bool(result.receipt and result.receipt.verified),
                        "resume_position": result.resume_position,
                    },
                    default=str,
                )
            )
            return 0

        if args.cmd == "preview":
            from .preview import PreviewLimits, preview

            c = _compiled(ws, args.declarations, args.resource)
            pr = preview(
                spark,
                c.pipeline(ws.root).resource,
                limits=PreviewLimits(max_rows=args.rows),
            )
            pr.df.show(args.rows, truncate=False)
            print(json.dumps({"rows": pr.rows_returned, "limit_hit": pr.limit_hit, "evidence": pr.evidence["limits"]}))
            return 0

        if args.cmd == "sql":
            from .preview import system_sql

            df = system_sql(spark, ws.root / "ledger", ws.root / "packages", args.query)
            df.show(100, truncate=False)
            return 0

        if args.cmd == "explain":
            c = _compiled(ws, args.declarations, args.resource)
            res = c.pipeline(ws.root).resource
            df, plan = res.scan(spark, _scan_request(args, args.resource))
            print(json.dumps({"negotiated": plan.to_json_obj()}, indent=1))
            print(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
            return 0

        if args.cmd == "schema":
            c = _compiled(ws, args.declarations, args.resource)
            if c.declaration.get("schema"):
                from .types.schema import CanonicalSchema

                print(CanonicalSchema.from_declared(c.declaration["schema"]).canonical_json())
                return 0
            res = c.pipeline(ws.root).resource
            df, _ = res.scan(spark, _scan_request(argparse.Namespace(filter=None, project=None, limit=0), args.resource))
            print(df.schema.json())
            return 0

        if args.cmd == "backfill":
            from .expressions.ast import Col, Lit
            from .runtime import LoadPipeline

            c = _compiled(ws, args.declarations, args.resource)
            desc = c.descriptor()
            if not desc.cursor:
                print("backfill requires a declared cursor", file=sys.stderr)
                return 2
            pipe = c.pipeline(ws.root)
            lo, hi = _coerce(args.lo), _coerce(args.hi)
            window = [Col(desc.cursor.field) >= Lit(lo), Col(desc.cursor.field) <= Lit(hi)]
            # window re-run: no checkpoint read (the window IS the
            # position) and no checkpoint advance (a backfill must not
            # move the incremental frontier)
            repipe = LoadPipeline(
                resource=pipe.resource,
                contract=pipe.contract,
                package_root=pipe.package_root,
                ledger=None,
                destination=pipe.destination,
                disposition=pipe.disposition,
                predicates=window,
            )
            result = repipe.run(spark)
            print(
                json.dumps(
                    {
                        "resource": args.resource,
                        "window": [lo, hi],
                        "rows_admitted": result.rows_admitted,
                        "package_id": result.package.package_id,
                        "receipt_verified": bool(result.receipt and result.receipt.verified),
                    },
                    default=str,
                )
            )
            return 0

        if args.cmd == "package" and args.action == "verify":
            from .package.builder import PackageBuilder

            if not args.path:
                print("package verify requires a package path", file=sys.stderr)
                return 2
            ok = PackageBuilder.verify(spark, args.path)
            print(json.dumps({"path": args.path, "verified": bool(ok)}))
            return 0 if ok else 1
    finally:
        if not pre_existing:
            spark.stop()
    return 1


def _coerce(v: str):
    for conv in (int, float):
        try:
            return conv(v)
        except ValueError:
            continue
    return v


def _toml_inline(src: dict) -> str:
    parts = ", ".join(f'{k} = "{v}"' for k, v in src.items())
    return "{ " + parts + " }"


def _discover(path: str) -> list[tuple[str, dict]]:
    """Resource suggestions at a location: data files in a directory
    (one resource per table file/dir), or tables inside a DuckDB /
    SQLite database file."""
    p = Path(path)
    out: list[tuple[str, dict]] = []
    if p.is_dir():
        exts = {".parquet": "parquet", ".csv": "csv", ".json": "json", ".ndjson": "ndjson"}
        for child in sorted(p.iterdir()):
            fmt = exts.get(child.suffix)
            if fmt:
                rid = child.stem.replace("-", "_").replace(".", "_")
                out.append((rid, {"kind": "files", "path": str(child), "format": fmt}))
        return out
    if p.suffix in (".duckdb", ".db") and p.exists():
        import duckdb

        con = duckdb.connect(str(p), read_only=True)
        try:
            for (t,) in con.execute("SHOW TABLES").fetchall():
                out.append((t, {"kind": "duckdb", "path": str(p), "table": t}))
        finally:
            con.close()
        return out
    if p.suffix in (".sqlite", ".sqlite3") and p.exists():
        import sqlite3

        con = sqlite3.connect(str(p))
        try:
            for (t,) in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
            ).fetchall():
                out.append((t, {"kind": "sqlite", "path": str(p), "table": t}))
        finally:
            con.close()
        return out
    raise SystemExit(f"nothing to discover at {path}")


if __name__ == "__main__":
    raise SystemExit(main())
