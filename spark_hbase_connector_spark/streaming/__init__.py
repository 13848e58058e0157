from spark_hbase_connector_spark.streaming.events import (  # noqa: F401
    events_stream,
    run_stream_to_memory,
    session_window_agg,
    tumbling_window_agg,
)
