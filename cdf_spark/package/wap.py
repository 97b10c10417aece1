"""Multi-table Write-Audit-Publish coordination.

A pipeline rarely feeds ONE table: a load lands facts and dims (or a
table and its quality summary) that must become visible TOGETHER — a
reader joining across them mid-publish would see a torn state. Iceberg
gives per-table atomicity only, so cross-table publish is coordinated:
each table stages its load on a branch (verification gates visibility,
`IcebergDestination(stage_branch=)`), and the coordinator publishes
every branch behind ONE durable intent record.

Protocol (the standard write-ahead-intent shape):
1. `stage(...)` each table's load on its branch; nothing is visible.
2. `publish_all()` FIRST writes an intent file naming every (table,
   branch, staged-snapshot) — the commit point — then fast-forwards
   each table, marking progress per table, and finally retires the
   intent.
3. A crash between fast-forwards leaves a live intent; `recover()`
   completes the remaining publishes idempotently (a table already at
   its staged snapshot is skipped). Readers that respect the protocol
   see either no table published or, after recovery, all of them; the
   intent file is the arbiter, never wall-clock luck.

Reference frame: the reference's settlement machinery makes every
destination mutation ride a verified, recorded decision
(`crates/cdf-kernel/src/destination.rs`, correction.rs's addressed
corrections); this is that discipline lifted to a multi-table publish.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

from ..sources.iceberg import IcebergError, IcebergTable


class WapPublishError(Exception):
    pass


class WapPublishCoordinator:
    """Coordinates one publish cycle over N branch-staged tables.

    `root` holds the durable intent records (on a cluster: the same
    shared store as the checkpoint ledger). One coordinator instance
    per cycle; `recover(root)` is a classmethod because the crashed
    process's instance is gone."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._staged: list[dict] = []

    def stage(self, table_path: str | Path, branch: str) -> dict:
        """Record a branch-staged table for this cycle. The branch must
        exist and differ from the table head (something IS staged)."""
        t = IcebergTable(table_path)
        ref = (t.metadata.get("refs") or {}).get(branch)
        if ref is None or ref.get("type") != "branch":
            raise WapPublishError(f"{table_path}: branch {branch!r} does not exist")
        staged_sid = int(ref["snapshot-id"])
        if staged_sid == t.current_snapshot_id():
            raise WapPublishError(
                f"{table_path}: branch {branch!r} has nothing staged "
                "(already at the table head)"
            )
        entry = {
            "table": str(Path(table_path).resolve()),
            "branch": branch,
            "staged_snapshot": staged_sid,
        }
        self._staged.append(entry)
        return dict(entry)

    def publish_all(self, _crash_after: int | None = None) -> dict:
        """All-or-nothing visibility: write the intent (the commit
        point), then fast-forward every table. `_crash_after` is the
        chaos hook — raise after N publishes to exercise recovery."""
        if not self._staged:
            raise WapPublishError("nothing staged")
        intent = {
            "intent_id": uuid.uuid4().hex,
            "created_at_ms": int(time.time() * 1000),
            "tables": list(self._staged),
            "published": [],
        }
        path = self.root / f"intent-{intent['intent_id']}.json"
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(intent, indent=1))
        tmp.replace(path)  # durable BEFORE any table moves
        try:
            done = self._drive(path, intent, _crash_after)
        except Exception:
            raise  # intent stays live — recover() completes the cycle
        self._staged = []
        return done

    @staticmethod
    def _drive(path: Path, intent: dict, _crash_after: int | None = None) -> dict:
        for i, entry in enumerate(intent["tables"]):
            if entry["table"] in intent["published"]:
                continue
            if _crash_after is not None and i >= _crash_after:
                raise WapPublishError("chaos: crashed mid-publish")
            t = IcebergTable(entry["table"])
            if t.current_snapshot_id() != entry["staged_snapshot"]:
                try:
                    t.fast_forward(entry["branch"])
                except IcebergError as exc:
                    # idempotence: a re-driven publish may find the
                    # branch already at head from a prior attempt
                    if "already at the current" not in str(exc):
                        raise
            if t.current_snapshot_id() != entry["staged_snapshot"]:
                raise WapPublishError(
                    f"{entry['table']}: head is not the staged snapshot "
                    "after fast-forward — the branch moved since staging"
                )
            intent["published"].append(entry["table"])
            tmp = path.with_suffix(".tmp")
            tmp.write_text(json.dumps(intent, indent=1))
            tmp.replace(path)  # progress is durable per table
        path.unlink()  # retire: the cycle is complete
        return {"intent_id": intent["intent_id"], "published": intent["published"]}

    @classmethod
    def pending(cls, root: str | Path) -> list[dict]:
        return [
            json.loads(p.read_text())
            for p in sorted(Path(root).glob("intent-*.json"))
        ]

    @classmethod
    def recover(cls, root: str | Path) -> list[dict]:
        """Complete every live intent (crash recovery): idempotent —
        tables already published (recorded, or found at their staged
        snapshot) are skipped; the rest fast-forward now."""
        out = []
        for p in sorted(Path(root).glob("intent-*.json")):
            intent = json.loads(p.read_text())
            out.append(cls._drive(p, intent))
        return out
