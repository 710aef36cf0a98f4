from pg2any_spark.streaming.pipeline import (  # noqa: F401
    read_event_stream,
    start_cdc_apply,
    streaming_daily_counts,
)
