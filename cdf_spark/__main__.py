"""CLI: the `cdf run / preview / sql` entry points on Spark.

    python -m cdf_spark compile  <decl.toml> --workspace ws/
    python -m cdf_spark run      <decl.toml> <resource> --workspace ws/
    python -m cdf_spark preview  <decl.toml> <resource> [--rows 20]
    python -m cdf_spark sql      "<SELECT over checkpoints/receipts/packages>" --workspace ws/
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cdf_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_compile = sub.add_parser("compile", help="compile declarations to immutable artifacts")
    p_compile.add_argument("declarations")
    p_compile.add_argument("--workspace", default=".cdf_spark")

    p_run = sub.add_parser("run", help="run one resource's load pipeline")
    p_run.add_argument("declarations")
    p_run.add_argument("resource")
    p_run.add_argument("--workspace", default=".cdf_spark")

    p_prev = sub.add_parser("preview", help="bounded deterministic preview")
    p_prev.add_argument("declarations")
    p_prev.add_argument("resource")
    p_prev.add_argument("--rows", type=int, default=20)
    p_prev.add_argument("--workspace", default=".cdf_spark")

    p_sql = sub.add_parser("sql", help="read-only SQL over system metadata")
    p_sql.add_argument("query")
    p_sql.add_argument("--workspace", default=".cdf_spark")

    args = ap.parse_args(argv)

    from .declarative import Workspace
    from .session import get_spark

    ws = Workspace(args.workspace)

    if args.cmd == "compile":
        compiled = ws.compile_file(args.declarations)
        for rid, c in compiled.items():
            print(f"{rid}\t{c.artifact_hash}")
        return 0

    spark = get_spark("cdf-spark-cli")
    try:
        if args.cmd == "run":
            compiled = ws.compile_file(args.declarations)
            if args.resource not in compiled:
                print(f"unknown resource {args.resource!r}; have {sorted(compiled)}", file=sys.stderr)
                return 2
            result = ws.run(spark, compiled[args.resource])
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

            compiled = ws.compile_file(args.declarations)
            c = compiled[args.resource]
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
    finally:
        spark.stop()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
