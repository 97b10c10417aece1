"""Row-count reconciliation across the pipeline's splits.

Re-expresses `crates/cdf-contract/src/reconciliation.rs:1-1297`: every
load must balance — rows_in == admitted + quarantined (+ late splits)
— and the balance is recorded as evidence, not assumed. A violated
balance is a hard engine error (it means a split predicate double-
counted or dropped rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ReconciliationError(Exception):
    pass


@dataclass
class Reconciliation:
    rows_in: int
    splits: dict[str, int] = field(default_factory=dict)

    def record(self, name: str, rows: int) -> "Reconciliation":
        self.splits[name] = rows
        return self

    @property
    def rows_out(self) -> int:
        return sum(self.splits.values())

    @property
    def balanced(self) -> bool:
        return self.rows_in == self.rows_out

    def assert_balanced(self) -> "Reconciliation":
        if not self.balanced:
            raise ReconciliationError(
                f"row balance violated: in={self.rows_in} out={self.rows_out} splits={self.splits}"
            )
        return self

    def to_json_obj(self) -> dict:
        return {"rows_in": self.rows_in, "splits": dict(self.splits), "balanced": self.balanced}


def reconcile_contract_result(rows_in: int, result) -> Reconciliation:
    """Balance a ContractResult: admitted + quarantined == in."""
    rec = Reconciliation(rows_in)
    rec.record("admitted", result.admitted.count())
    rec.record("quarantined", result.quarantined.count())
    return rec.assert_balanced()
