from sql4pandas_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
)

__all__ = ["read_events_stream", "run_available_now"]
