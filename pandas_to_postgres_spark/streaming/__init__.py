from pandas_to_postgres_spark.streaming.events import (
    stream_static_enrichment,
    streaming_dedup_events,
    windowed_event_counts,
)
from pandas_to_postgres_spark.streaming.sink import stream_to_batch_sink

__all__ = [
    "windowed_event_counts",
    "streaming_dedup_events",
    "stream_static_enrichment",
    "stream_to_batch_sink",
]
