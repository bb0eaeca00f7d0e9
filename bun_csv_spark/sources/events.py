"""Event-stream table loader.

The testdata events table is parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). The supported
escape hatch is ``spark.sql.legacy.parquet.nanosAsLong`` — read the column
as epoch nanoseconds and do event-time math on exact longs (see
functions.timefmt). Nanos arithmetic is actually the better plan at scale:
window bucketing is a modulo, no timestamp codec in the hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with ``ts`` as epoch-nanos long."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
