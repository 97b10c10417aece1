"""Scan planning: negotiated pushdown with fidelity evidence.

Re-expresses the reference's scan negotiation
(`crates/cdf-kernel/src/resource.rs:567-574,808-817` ScanRequest/Plan;
`crates/cdf-engine/src/table_provider.rs:124-179` negotiation;
`crates/cdf-engine/src/planning.rs:253-297` residual split):

- Each predicate is classified by the source capability sheet as
  **Exact** (source fully enforces it), **Inexact** (source prunes but
  may return false positives — e.g. parquet zone maps), or
  **Unsupported** (engine-only residual).
- Inexact predicates are *also* kept as residuals and re-checked by
  the engine — pushdown is an optimization, never a correctness
  dependency.
- A requested limit is **dropped** when any pushed predicate is
  Inexact (the source would count false-positive rows toward the
  limit — reference guard at `table_provider.rs:124-136`).
- An incremental-cursor predicate already enforced by the resume
  position is marked *subsumed* (`planning.rs:283-285`) and not
  re-pushed.

Catalyst performs the actual pushdown when the plan is lowered to a
DataFrame; this layer exists to (a) record WHAT was negotiated as a
replayable, hashed artifact and (b) keep engine-side re-checking
honest. On a 100 TB scan the fidelity ledger is also the audit trail
for "why did this read N bytes".
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from enum import Enum

from ..expressions.ast import Binary, Col, Expr, Lit


class PushdownFidelity(str, Enum):
    EXACT = "exact"
    INEXACT = "inexact"
    UNSUPPORTED = "unsupported"


@dataclass
class ScanPredicate:
    expr: Expr
    fidelity: PushdownFidelity = PushdownFidelity.UNSUPPORTED
    subsumed_by_position: bool = False

    def to_json_obj(self) -> dict:
        return {
            "expr": self.expr.to_json_obj(),
            "fidelity": self.fidelity.value,
            "subsumed": self.subsumed_by_position,
        }


@dataclass
class OrderBy:
    field: str
    ascending: bool = True


@dataclass
class ScanRequest:
    """What the engine wants from a source (pre-negotiation)."""

    resource_id: str
    projection: list[str] | None = None  # None = all columns
    predicates: list[Expr] = field(default_factory=list)
    limit: int | None = None
    order_by: list[OrderBy] = field(default_factory=list)
    cursor_field: str | None = None  # incremental cursor column
    cursor_resume_value: object | None = None


@dataclass
class Capability:
    """Source capability sheet (what the reference calls the
    negotiated `ScanCapabilities`, `resource.rs:395-430`)."""

    projection: str = "exact"  # exact | none
    # op name -> fidelity for simple `col op literal` comparisons
    filter_ops: dict[str, PushdownFidelity] = field(default_factory=dict)
    limit: bool = False
    order_by: bool = False
    estimates: bool = False
    # True only for sources that natively resume from a position (CDC
    # logs, manifest diffs): the cursor predicate is then enforced by
    # the position itself and can be subsumed (planning.rs:283-285).
    position_enforced: bool = False

    @classmethod
    def parquet(cls) -> Capability:
        """Parquet: zone-map/row-group pruning → Inexact by nature; Spark
        re-evaluates post-scan so end-to-end the result is exact."""
        ops = {op: PushdownFidelity.INEXACT for op in ("eq", "ne", "lt", "le", "gt", "ge")}
        return cls(projection="exact", filter_ops=ops, limit=True, order_by=False, estimates=True)

    @classmethod
    def jdbc(cls) -> Capability:
        ops = {op: PushdownFidelity.EXACT for op in ("eq", "ne", "lt", "le", "gt", "ge")}
        return cls(projection="exact", filter_ops=ops, limit=True, order_by=True, estimates=True)

    @classmethod
    def text_format(cls) -> Capability:
        """CSV/JSON: no pushdown; engine-only residual filtering."""
        return cls(projection="none", filter_ops={}, limit=True)


@dataclass
class PartitionPlan:
    """Planned parallel-read units (`resource.rs:624-639`). For file
    sources this is the file manifest; Spark further splits by
    maxPartitionBytes at execution."""

    kind: str  # files | jdbc_ranges | catalog-partitions | single
    units: list[dict] = field(default_factory=list)
    estimated_bytes: int | None = None
    estimated_rows: int | None = None
    # planning evidence (pruning counts, table generation); not part of
    # the plan's content hash — units describe WHAT is read, meta WHY
    meta: dict = field(default_factory=dict)


@dataclass
class ScanPlan:
    """The negotiated, replayable scan artifact."""

    resource_id: str
    projection: list[str] | None
    pushed: list[ScanPredicate] = field(default_factory=list)
    residual: list[ScanPredicate] = field(default_factory=list)
    unsupported: list[ScanPredicate] = field(default_factory=list)
    limit: int | None = None
    limit_dropped_reason: str | None = None
    order_by: list[OrderBy] = field(default_factory=list)
    partitions: PartitionPlan | None = None
    schema_fingerprint: str | None = None

    def to_json_obj(self) -> dict:
        return {
            "resource_id": self.resource_id,
            "projection": self.projection,
            "pushed": [p.to_json_obj() for p in self.pushed],
            "residual": [p.to_json_obj() for p in self.residual],
            "unsupported": [p.to_json_obj() for p in self.unsupported],
            "limit": self.limit,
            "limit_dropped_reason": self.limit_dropped_reason,
            "order_by": [{"field": o.field, "asc": o.ascending} for o in self.order_by],
            "schema_fingerprint": self.schema_fingerprint,
        }

    def content_hash(self) -> str:
        js = json.dumps(self.to_json_obj(), sort_keys=True, separators=(",", ":"))
        return "sha256:" + hashlib.sha256(js.encode()).hexdigest()

    def all_engine_predicates(self) -> list[Expr]:
        """Every predicate the engine must (re-)enforce: residuals,
        unsupported, and inexact-pushed ones."""
        out = [p.expr for p in self.residual]
        out += [p.expr for p in self.unsupported]
        out += [p.expr for p in self.pushed if p.fidelity is PushdownFidelity.INEXACT]
        return out


class ScanClaimError(ValueError):
    pass


def validate_negotiated_scan(plan: ScanPlan, cap: Capability) -> None:
    """Re-check a negotiated plan against the declared capability sheet
    (`validate_negotiated_scan`, planning.rs:177): a source claiming
    pushdown it never declared — or an exact claim for an op declared
    inexact — is a protocol violation, caught before execution."""
    for pred in plan.pushed:
        if pred.subsumed_by_position:
            if not cap.position_enforced:
                raise ScanClaimError(
                    "plan marks a predicate position-subsumed but the source is not position-enforced"
                )
            continue
        op = _simple_comparison(pred.expr)
        declared = cap.filter_ops.get(op or "", PushdownFidelity.UNSUPPORTED)
        if declared is PushdownFidelity.UNSUPPORTED:
            raise ScanClaimError(f"pushed predicate op {op!r} was never declared by the source")
        if pred.fidelity is PushdownFidelity.EXACT and declared is not PushdownFidelity.EXACT:
            raise ScanClaimError(f"op {op!r} claimed Exact but source declares {declared.value}")
    if plan.limit is not None and not cap.limit:
        raise ScanClaimError("plan retains a limit the source cannot enforce")
    if plan.order_by and not cap.order_by:
        raise ScanClaimError("plan retains an ordering the source cannot enforce")


def _simple_comparison(expr: Expr) -> str | None:
    """Return the op name if expr is `col op literal`, else None."""
    if isinstance(expr, Binary) and isinstance(expr.left, Col) and isinstance(expr.right, Lit):
        if expr.op in ("eq", "ne", "lt", "le", "gt", "ge"):
            return expr.op
    return None


def negotiate(request: ScanRequest, cap: Capability) -> ScanPlan:
    """Classify predicates against the capability sheet and apply the
    limit guard + cursor subsumption."""
    plan = ScanPlan(
        resource_id=request.resource_id,
        projection=list(request.projection) if request.projection and cap.projection == "exact" else request.projection,
        limit=request.limit,
        order_by=list(request.order_by) if cap.order_by else [],
    )

    any_inexact = False
    for expr in request.predicates:
        op = _simple_comparison(expr)
        pred = ScanPredicate(expr)
        if (
            cap.position_enforced
            and request.cursor_field is not None
            and op in ("gt", "ge")
            and isinstance(expr, Binary)
            and isinstance(expr.left, Col)
            and expr.left.name == request.cursor_field
            and isinstance(expr.right, Lit)
            and request.cursor_resume_value is not None
            and expr.right.value == request.cursor_resume_value
        ):
            # Cursor already enforced by the resume position.
            pred.fidelity = PushdownFidelity.EXACT
            pred.subsumed_by_position = True
            plan.pushed.append(pred)
            continue

        fidelity = cap.filter_ops.get(op or "", PushdownFidelity.UNSUPPORTED)
        pred.fidelity = fidelity
        if fidelity is PushdownFidelity.EXACT:
            plan.pushed.append(pred)
        elif fidelity is PushdownFidelity.INEXACT:
            any_inexact = True
            plan.pushed.append(pred)
            # inexact pushdown is also an engine residual (re-checked)
            plan.residual.append(ScanPredicate(expr, PushdownFidelity.UNSUPPORTED))
        else:
            plan.unsupported.append(pred)

    if request.limit is not None:
        if any_inexact:
            plan.limit = None
            plan.limit_dropped_reason = "inexact pushed predicate (false positives would count toward limit)"
        elif not cap.limit:
            plan.limit = None
            plan.limit_dropped_reason = "source does not support limit"
    return plan
