from .asof import asof_join
from .dedup import dedup_keyed
from .effects import CdcOp, apply_effects_to_target, reduce_keyed_effects
from .late_data import LateDataSplit, classify_late_data
from .sampling import stratified_hash_sample

__all__ = [
    "dedup_keyed",
    "CdcOp",
    "reduce_keyed_effects",
    "apply_effects_to_target",
    "LateDataSplit",
    "classify_late_data",
    "stratified_hash_sample",
    "asof_join",
]
