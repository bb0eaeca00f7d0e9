from bun_csv_spark.streaming.windows import (  # noqa: F401
    tumbling_counts,
    run_stream_to_table,
)
