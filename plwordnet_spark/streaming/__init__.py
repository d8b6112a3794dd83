from plwordnet_spark.streaming.windows import (  # noqa: F401
    read_event_stream,
    sessionize_events,
    windowed_event_counts,
)
