from .builder import PackageBuilder, PackageResult
from .ledger import CheckpointLedger, Receipt
from .stats import column_stats, dataset_value_hash

__all__ = [
    "PackageBuilder",
    "PackageResult",
    "CheckpointLedger",
    "Receipt",
    "column_stats",
    "dataset_value_hash",
]
