from .ast import Binary, Call, Cast, Col, Expr, Lit, Unary, parse_predicate_text
from .determinism import DeterminismError, assert_deterministic_call
from .lowering import lower
from .sqlgate import ProjectQuery, SqlAdmissionError, analyze_project_query

__all__ = [
    "Expr",
    "Col",
    "Lit",
    "Call",
    "Cast",
    "Binary",
    "Unary",
    "parse_predicate_text",
    "lower",
    "DeterminismError",
    "assert_deterministic_call",
    "ProjectQuery",
    "SqlAdmissionError",
    "analyze_project_query",
]
