from .builder import PackageBuilder, PackageResult
from .duckdb_dest import DuckDbDestination
from .delta_dest import DeltaDestination
from .iceberg_dest import IcebergDestination
from .ledger import CheckpointLedger, ParquetDestination, Receipt
from .pg_copy import FileCopyTransport, PostgresCopyDestination, PsycopgTransport
from .stats import column_stats, dataset_value_hash

__all__ = [
    "PackageBuilder",
    "PackageResult",
    "CheckpointLedger",
    "ParquetDestination",
    "DuckDbDestination",
    "IcebergDestination",
    "DeltaDestination",
    "PostgresCopyDestination",
    "PsycopgTransport",
    "FileCopyTransport",
    "Receipt",
    "column_stats",
    "dataset_value_hash",
]
