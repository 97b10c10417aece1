from .builder import PackageBuilder, PackageResult
from .duckdb_dest import DuckDbDestination
from .ledger import CheckpointLedger, ParquetDestination, Receipt
from .stats import column_stats, dataset_value_hash

__all__ = [
    "PackageBuilder",
    "PackageResult",
    "CheckpointLedger",
    "ParquetDestination",
    "DuckDbDestination",
    "Receipt",
    "column_stats",
    "dataset_value_hash",
]
