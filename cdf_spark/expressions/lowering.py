"""Lower the declarative AST to PySpark ``Column`` expressions.

This is the analogue of the reference's physical-expression binding
(`crates/cdf-engine/src/expression_execution.rs:17-60`), except we stop
at Catalyst's door: we produce a ``Column`` tree and let Catalyst do
constant folding, predicate pushdown, and codegen. The pre-lowering
AST (with its content hash) is retained in plan artifacts, mirroring
the reference's practice of keeping the authored `admission_expression`
alongside the optimized one (`crates/cdf-engine/src/expression.rs:26-29`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..types.arrow_types import parse_arrow_type
from .ast import Binary, Call, Cast, Col, Expr, Lit, Unary
from .determinism import assert_deterministic_call

_BINARY_LOWER = {
    "eq": lambda l, r: l == r,
    "ne": lambda l, r: l != r,
    "lt": lambda l, r: l < r,
    "le": lambda l, r: l <= r,
    "gt": lambda l, r: l > r,
    "ge": lambda l, r: l >= r,
    "add": lambda l, r: l + r,
    "sub": lambda l, r: l - r,
    "mul": lambda l, r: l * r,
    "div": lambda l, r: l / r,
    "mod": lambda l, r: l % r,
    "and": lambda l, r: l & r,
    "or": lambda l, r: l | r,
    "is_distinct_from": lambda l, r: ~l.eqNullSafe(r),
    "is_not_distinct_from": lambda l, r: l.eqNullSafe(r),
    "regex_match": lambda l, r: F.regexp_like(l, r),
    "regex_imatch": lambda l, r: F.regexp_like(l, F.concat(F.lit("(?i)"), r)),
    "regex_not_match": lambda l, r: ~F.regexp_like(l, r),
    "regex_not_imatch": lambda l, r: ~F.regexp_like(l, F.concat(F.lit("(?i)"), r)),
    "like": lambda l, r: l.like(r),
    "ilike": lambda l, r: l.ilike(r),
    "not_like": lambda l, r: ~l.like(r),
    "not_ilike": lambda l, r: ~l.ilike(r),
    "bitand": lambda l, r: l.bitwiseAND(r),
    "bitor": lambda l, r: l.bitwiseOR(r),
    "bitxor": lambda l, r: l.bitwiseXOR(r),
    "shl": lambda l, r: F.shiftleft(l, r),
    "shr": lambda l, r: F.shiftright(l, r),
    "concat": lambda l, r: F.concat(l, r),
    "list_contains": lambda l, r: F.array_contains(l, r),
    # l contained-by r: every element of l appears in r.
    "list_contained_by": lambda l, r: F.forall(l, lambda x: F.array_contains(r, x)),
}

_UNARY_LOWER = {
    "not": lambda c: ~c,
    "neg": lambda c: -c,
    "is_null": lambda c: c.isNull(),
    "is_not_null": lambda c: c.isNotNull(),
}

# like/ilike need string patterns, not Columns, when literal.
_PATTERN_OPS = {"like", "ilike", "not_like", "not_ilike"}


def lower(expr: Expr) -> Column:
    """Recursively lower an AST node to a PySpark Column."""
    if isinstance(expr, Col):
        return F.col(expr.name)
    if isinstance(expr, Lit):
        return F.lit(expr.value)
    if isinstance(expr, Unary):
        return _UNARY_LOWER[expr.op](lower(expr.operand))
    if isinstance(expr, Binary):
        if expr.op in _PATTERN_OPS and isinstance(expr.right, Lit):
            left = lower(expr.left)
            pat = expr.right.value
            base = left.like(pat) if "ilike" not in expr.op else left.ilike(pat)
            return ~base if expr.op.startswith("not_") else base
        return _BINARY_LOWER[expr.op](lower(expr.left), lower(expr.right))
    if isinstance(expr, Call):
        assert_deterministic_call(expr.func)
        fn = _resolve_function(expr.func)
        try:
            return fn(*[lower(a) for a in expr.args])
        except Exception:
            # Some functions (sha2 numBits, lpad len, ...) require Python
            # literals for specific arguments; retry with Lit args raw.
            mixed = [a.value if isinstance(a, Lit) else lower(a) for a in expr.args]
            return fn(*mixed)
    if isinstance(expr, Cast):
        col = lower(expr.operand)
        target = parse_arrow_type(expr.to).spark_type
        if expr.mode == "try":
            return col.try_cast(target)
        return col.cast(target)
    raise TypeError(f"cannot lower {type(expr).__name__}")


_FUNC_ALIASES = {
    "power": "pow",
    "substr": "substring",
    "char_length": "length",
    "character_length": "length",
    "filter_array": "filter",
    "ln": "log",
}


def _resolve_function(name: str):
    name = _FUNC_ALIASES.get(name, name)
    fn = getattr(F, name, None)
    if fn is None:
        raise ValueError(f"no pyspark.sql.functions equivalent for {name!r}")
    return fn
