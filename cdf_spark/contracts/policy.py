"""Contract policy: declarative row rules + transforms.

Re-expresses the reference's contract policy surface
(`crates/cdf-contract/src/policy.rs`): row rules `:242-274`
(Nullability, Domain, Range, Regex, Freshness, Dedup), transforms
`:496-526` (Rename, Cast, Redact, Derive, Filter, ExpandNested),
row dispositions (pass / freeze / quarantine) and the total verdict
lattice (`crates/cdf-contract/src/lattice.rs:1-21`).

Policies are plain dataclasses; compilation to Spark Columns happens
in :mod:`cdf_spark.contracts.evaluator`. Every policy carries a
deterministic JSON rendering so contract programs hash into plan
artifacts.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

from ..expressions.ast import Expr

# Verdict lattice: total order (assert_verdict_lattice_total,
# crates/cdf-engine/src/planning.rs:3-6).
VERDICT_PASS = "pass"
VERDICT_FREEZE = "freeze"
VERDICT_QUARANTINE = "quarantine"
VERDICT_RANK = {VERDICT_PASS: 0, VERDICT_FREEZE: 1, VERDICT_QUARANTINE: 2}
DISPOSITIONS = (VERDICT_PASS, VERDICT_FREEZE, VERDICT_QUARANTINE)


@dataclass
class Rule:
    """Base row rule; `on_violation` is the row disposition."""

    def name(self) -> str:
        raise NotImplementedError

    def to_json_obj(self) -> dict:
        d = {"rule": type(self).__name__}
        d.update({k: _jsonable(v) for k, v in self.__dict__.items()})
        return d


def _jsonable(v: Any) -> Any:
    if isinstance(v, Expr):
        return v.to_json_obj()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


@dataclass
class NullabilityRule(Rule):
    column: str
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"nullability({self.column})"


@dataclass
class DomainRule(Rule):
    column: str
    allowed: list[Any] = field(default_factory=list)
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"domain({self.column})"


@dataclass
class RangeRule(Rule):
    column: str
    min: Any = None
    max: Any = None
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"range({self.column})"


@dataclass
class RegexRule(Rule):
    column: str
    pattern: str = ".*"
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"regex({self.column})"


@dataclass
class FreshnessRule(Rule):
    """Row event-time must be within max_age_ms of the run's as-of
    instant. The as-of is supplied at evaluation time and recorded in
    the plan (determinism: no wall-clock inside the plan)."""

    column: str
    max_age_ms: int = 86_400_000
    on_violation: str = VERDICT_FREEZE

    def name(self) -> str:
        return f"freshness({self.column})"


@dataclass
class DedupRule(Rule):
    """Key-duplicate policy. keep=first/last is resolved by the dedup
    operator (order-aware); keep=fail marks ALL duplicate-key rows."""

    keys: list[str] = field(default_factory=list)
    keep: str = "last"  # first | last | fail
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"dedup({','.join(self.keys)})"


@dataclass
class ExprRule(Rule):
    """Cross-field CHECK rule: a typed-AST predicate over the whole
    row (`expressions/ast` — the same admitted, deterministic grammar
    the scan planner pushes), e.g. Col("end_ts") >= Col("start_ts").
    The contract-side twin of a table CHECK constraint: the table
    constraint refuses a COMMIT wholesale, this rule disposes the
    offending ROWS (quarantine/annotate) and lets the clean ones
    load. Null or false both violate — a predicate that cannot be
    proven true admits nothing, same discipline as the single-column
    rules."""

    predicate: Expr = None  # type: ignore[assignment]
    label: str = "check"
    on_violation: str = VERDICT_QUARANTINE

    def name(self) -> str:
        return f"expr({self.label})"


# --- transforms --------------------------------------------------------------


@dataclass
class Transform:
    def to_json_obj(self) -> dict:
        d = {"transform": type(self).__name__}
        d.update({k: _jsonable(v) for k, v in self.__dict__.items()})
        return d


@dataclass
class RenameT(Transform):
    from_name: str
    to_name: str


@dataclass
class CastT(Transform):
    column: str
    to: str  # canonical type string
    lossy_allowed: bool = False  # False -> failed casts quarantine the row


@dataclass
class RedactT(Transform):
    column: str
    mode: str = "hash"  # preserve | hash | omit | mask
    replacement: str = "***"


@dataclass
class DeriveT(Transform):
    column: str
    expression: Expr = None  # type: ignore[assignment]


@dataclass
class FilterT(Transform):
    expression: Expr = None  # type: ignore[assignment]


@dataclass
class ExpandNestedT(Transform):
    """dlt-style child-table expansion (`policy.rs:428-435`)."""

    column: str
    parent_keys: list[str] = field(default_factory=list)
    load_order_column: str = "_cdf_load_order"


@dataclass
class Contract:
    """A full contract program: ordered transforms then rules."""

    rules: list[Rule] = field(default_factory=list)
    transforms: list[Transform] = field(default_factory=list)

    def content_hash(self) -> str:
        js = json.dumps(
            {
                "rules": [r.to_json_obj() for r in self.rules],
                "transforms": [t.to_json_obj() for t in self.transforms],
            },
            sort_keys=True,
            separators=(",", ":"),
        )
        return "sha256:" + hashlib.sha256(js.encode()).hexdigest()

    def __post_init__(self):
        for r in self.rules:
            disp = getattr(r, "on_violation", VERDICT_QUARANTINE)
            if disp not in DISPOSITIONS:
                raise ValueError(f"unknown disposition {disp!r} on {r.name()}")
