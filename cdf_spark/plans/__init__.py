from .scan import (
    Capability,
    OrderBy,
    PartitionPlan,
    PushdownFidelity,
    ScanPlan,
    ScanPredicate,
    ScanRequest,
    negotiate,
)

__all__ = [
    "Capability",
    "OrderBy",
    "PartitionPlan",
    "PushdownFidelity",
    "ScanPlan",
    "ScanPredicate",
    "ScanRequest",
    "negotiate",
]
