from .epochs import DrainTermination, EpochPolicy, StreamExtent
from .pipeline import StreamingLoadPipeline
from .watermark import WatermarkLedger, WatermarkPolicy, combine_partition_watermarks

__all__ = [
    "StreamExtent",
    "EpochPolicy",
    "DrainTermination",
    "WatermarkPolicy",
    "WatermarkLedger",
    "combine_partition_watermarks",
    "StreamingLoadPipeline",
]
