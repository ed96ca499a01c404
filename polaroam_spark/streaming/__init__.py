from polaroam_spark.streaming.joins import stream_stream_interval_join
from polaroam_spark.streaming.sampling import streaming_gumbel_topk
from polaroam_spark.streaming.timeseries import streaming_ewma
from polaroam_spark.streaming.sessionize import (
    streaming_dedup,
    streaming_dedup_incremental,
    streaming_heavy_hitters,
    streaming_event_counts,
    streaming_session_counts,
    streaming_stop_detection,
)

__all__ = [
    "streaming_event_counts",
    "streaming_session_counts",
    "streaming_stop_detection",
    "streaming_dedup",
    "streaming_dedup_incremental",
    "streaming_heavy_hitters",
    "stream_stream_interval_join",
    "streaming_ewma",
    "streaming_gumbel_topk",
]
