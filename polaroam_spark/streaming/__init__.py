from polaroam_spark.streaming.sessionize import (
    streaming_dedup,
    streaming_dedup_incremental,
    streaming_heavy_hitters,
    streaming_event_counts,
    streaming_stop_detection,
)

__all__ = [
    "streaming_event_counts",
    "streaming_stop_detection",
    "streaming_dedup",
    "streaming_dedup_incremental",
    "streaming_heavy_hitters",
]
