from similarities_spark.streaming.incremental import (
    incremental_index_stream,
    windowed_event_counts,
)

__all__ = ["incremental_index_stream", "windowed_event_counts"]
