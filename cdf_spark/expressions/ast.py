"""Declarative expression AST with deterministic content identity.

Re-expresses the reference's kernel expression IR
(`crates/cdf-kernel/src/expression.rs:21-194` declarative tree;
`:366-736` typed nodes with sha256 identity; binary-operator inventory
`:757-789`; unary `:748-753`; cast modes `:740-744`). Nodes serialize
to canonical JSON; `content_hash()` is the sha256 of that rendering, so
two plans carrying the same expression hash identically — the basis of
deterministic replay.

The node set is deliberately the reference's surface: Column, Literal,
Unary, Binary, Call (allowlisted scalar functions), Cast
(implicit/explicit/try). Lowering to a PySpark ``Column`` lives in
:mod:`cdf_spark.expressions.lowering`.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass
from typing import Any, Union

# Binary operators (reference inventory, expression.rs:757-789).
BINARY_OPS = {
    "eq", "ne", "lt", "le", "gt", "ge",
    "add", "sub", "mul", "div", "mod",
    "and", "or",
    "is_distinct_from", "is_not_distinct_from",
    "regex_match", "regex_imatch", "regex_not_match", "regex_not_imatch",
    "like", "ilike", "not_like", "not_ilike",
    "bitand", "bitor", "bitxor", "shl", "shr",
    "concat",
    "list_contains", "list_contained_by",
}

UNARY_OPS = {"not", "neg", "is_null", "is_not_null"}

CAST_MODES = {"implicit", "explicit", "try"}


class Expr:
    """Base expression node."""

    def to_json_obj(self) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def canonical_json(self) -> str:
        return json.dumps(self.to_json_obj(), sort_keys=True, separators=(",", ":"))

    def content_hash(self) -> str:
        return "sha256:" + hashlib.sha256(self.canonical_json().encode()).hexdigest()

    def columns(self) -> set[str]:
        """Dependency set: referenced column names."""
        out: set[str] = set()
        _collect_columns(self, out)
        return out

    # Operator sugar so engine code reads naturally.
    def __eq__(self, other):  # type: ignore[override]
        return Binary("eq", self, _wrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return Binary("ne", self, _wrap(other))

    def __lt__(self, other):
        return Binary("lt", self, _wrap(other))

    def __le__(self, other):
        return Binary("le", self, _wrap(other))

    def __gt__(self, other):
        return Binary("gt", self, _wrap(other))

    def __ge__(self, other):
        return Binary("ge", self, _wrap(other))

    def __and__(self, other):
        return Binary("and", self, _wrap(other))

    def __or__(self, other):
        return Binary("or", self, _wrap(other))

    def __add__(self, other):
        return Binary("add", self, _wrap(other))

    def __sub__(self, other):
        return Binary("sub", self, _wrap(other))

    def __mul__(self, other):
        return Binary("mul", self, _wrap(other))

    def __truediv__(self, other):
        return Binary("div", self, _wrap(other))

    def __mod__(self, other):
        return Binary("mod", self, _wrap(other))

    def __invert__(self):
        return Unary("not", self)

    def __neg__(self):
        return Unary("neg", self)

    def is_null(self):
        return Unary("is_null", self)

    def is_not_null(self):
        return Unary("is_not_null", self)

    def __hash__(self):
        return hash(self.content_hash())


def _wrap(v: Any) -> Expr:
    return v if isinstance(v, Expr) else Lit(v)


@dataclass(frozen=True, eq=False)
class Col(Expr):
    name: str

    def to_json_obj(self):
        return {"node": "column", "name": self.name}


@dataclass(frozen=True, eq=False)
class Lit(Expr):
    value: Any  # None | bool | int | float | str  (or list thereof)

    def to_json_obj(self):
        v = self.value
        kind = type(v).__name__ if v is not None else "null"
        # Floats rendered via repr for bit-faithful identity.
        if isinstance(v, float):
            v = repr(v)
        return {"node": "literal", "kind": kind, "value": v}


@dataclass(frozen=True, eq=False)
class Unary(Expr):
    op: str
    operand: Expr

    def __post_init__(self):
        if self.op not in UNARY_OPS:
            raise ValueError(f"unknown unary op {self.op!r}")

    def to_json_obj(self):
        return {"node": "unary", "op": self.op, "operand": self.operand.to_json_obj()}


@dataclass(frozen=True, eq=False)
class Binary(Expr):
    op: str
    left: Expr
    right: Expr

    def __post_init__(self):
        if self.op not in BINARY_OPS:
            raise ValueError(f"unknown binary op {self.op!r}")

    def to_json_obj(self):
        return {
            "node": "binary",
            "op": self.op,
            "left": self.left.to_json_obj(),
            "right": self.right.to_json_obj(),
        }


@dataclass(frozen=True, eq=False)
class Call(Expr):
    """Scalar function call — validated against the determinism allowlist
    at compile time (see :mod:`cdf_spark.expressions.determinism`)."""

    func: str
    args: tuple[Expr, ...]

    def __init__(self, func: str, *args: Any):
        object.__setattr__(self, "func", func.lower())
        object.__setattr__(self, "args", tuple(_wrap(a) for a in args))

    def to_json_obj(self):
        return {"node": "call", "func": self.func, "args": [a.to_json_obj() for a in self.args]}


@dataclass(frozen=True, eq=False)
class Cast(Expr):
    operand: Expr
    to: str  # canonical type string
    mode: str = "explicit"  # implicit | explicit | try

    def __post_init__(self):
        if self.mode not in CAST_MODES:
            raise ValueError(f"unknown cast mode {self.mode!r}")

    def to_json_obj(self):
        return {
            "node": "cast",
            "mode": self.mode,
            "to": self.to,
            "operand": self.operand.to_json_obj(),
        }


def _collect_columns(e: Expr, out: set[str]) -> None:
    if isinstance(e, Col):
        out.add(e.name)
    elif isinstance(e, Unary):
        _collect_columns(e.operand, out)
    elif isinstance(e, Binary):
        _collect_columns(e.left, out)
        _collect_columns(e.right, out)
    elif isinstance(e, Call):
        for a in e.args:
            _collect_columns(a, out)
    elif isinstance(e, Cast):
        _collect_columns(e.operand, out)


# --- text predicate parser -------------------------------------------------
# The reference's text parser admits only `<col> <op> <literal>` with
# `=, !=, >, >=, <, <=` (`crates/cdf-kernel/src/expression.rs:21-194`).
# We admit the same shape, plus AND-chains of such terms, which the
# reference expresses via multiple ScanPredicates.

_TERM_RE = re.compile(
    r"""\s*([A-Za-z_][A-Za-z0-9_.]*)\s*(=|!=|>=|<=|>|<)\s*
        ('(?:[^']|'')*'|-?\d+\.\d+|-?\d+|true|false|null)\s*""",
    re.VERBOSE | re.IGNORECASE,
)

_OP_MAP = {"=": "eq", "!=": "ne", ">": "gt", ">=": "ge", "<": "lt", "<=": "le"}


class PredicateParseError(ValueError):
    pass


def _parse_literal(tok: str) -> Any:
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low == "null":
        return None
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def parse_predicate_text(text: str) -> Expr:
    """Parse ``col op literal [AND col op literal ...]`` to an AST."""
    terms = re.split(r"\bAND\b", text, flags=re.IGNORECASE)
    exprs: list[Expr] = []
    for term in terms:
        m = _TERM_RE.fullmatch(term)
        if not m:
            raise PredicateParseError(
                f"predicate term {term.strip()!r} not admitted: expected <col> <op> <literal>"
            )
        col, op, lit = m.groups()
        exprs.append(Binary(_OP_MAP[op], Col(col), Lit(_parse_literal(lit))))
    out = exprs[0]
    for e in exprs[1:]:
        out = Binary("and", out, e)
    return out
