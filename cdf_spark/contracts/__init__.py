from .evaluator import ContractResult, evaluate_contract
from .policy import (
    CastT,
    Contract,
    DedupRule,
    DeriveT,
    DomainRule,
    ExpandNestedT,
    FilterT,
    FreshnessRule,
    NullabilityRule,
    RangeRule,
    RedactT,
    RegexRule,
    RenameT,
)

__all__ = [
    "Contract",
    "NullabilityRule",
    "DomainRule",
    "RangeRule",
    "RegexRule",
    "FreshnessRule",
    "DedupRule",
    "RenameT",
    "CastT",
    "RedactT",
    "DeriveT",
    "FilterT",
    "ExpandNestedT",
    "ContractResult",
    "evaluate_contract",
]
