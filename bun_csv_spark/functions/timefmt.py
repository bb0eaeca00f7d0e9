"""Timezone-free epoch formatting helpers.

The events table stores TIMESTAMP(NANOS) which Spark's parquet reader only
exposes as epoch-nanos longs (``spark.sql.legacy.parquet.nanosAsLong``).
These helpers turn epoch longs into wall-clock strings with pure integer
arithmetic — no session-timezone dependency anywhere, so results compare
bit-for-bit against naive-timestamp engines (DuckDB) regardless of the
session's timezone setting.

All expressions are built-ins (codegen'd); the `div`/`%` math happens on
longs, avoiding double-precision loss on 1e18-magnitude nanos.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ns_to_seconds(col: Column | str) -> Column:
    """Epoch nanos -> epoch seconds (floor), exact long arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return (c - (c % F.lit(1_000_000_000))) / F.lit(1_000_000_000)


def epoch_seconds_to_string(col: Column | str) -> Column:
    """Epoch seconds (long) -> 'yyyy-MM-dd HH:mm:ss' wall-clock UTC string."""
    s = (F.col(col) if isinstance(col, str) else col).cast("long")
    days = F.floor(s / 86400).cast("int")
    sod = s % 86400  # seconds of day; epoch is non-negative here
    date_str = F.date_add(F.lit("1970-01-01").cast("date"), days).cast("string")
    hh = F.lpad(F.floor(sod / 3600).cast("string"), 2, "0")
    mm = F.lpad(F.floor((sod % 3600) / 60).cast("string"), 2, "0")
    ss = F.lpad((sod % 60).cast("string"), 2, "0")
    return F.concat(date_str, F.lit(" "), hh, F.lit(":"), mm, F.lit(":"), ss)


def ns_to_string(col: Column | str) -> Column:
    """Epoch nanos -> 'yyyy-MM-dd HH:mm:ss' (sub-second truncated)."""
    return epoch_seconds_to_string(ns_to_seconds(col))


def ns_to_ntz(col: Column | str) -> Column:
    """Epoch nanos -> TIMESTAMP_NTZ at second resolution (for window())."""
    return F.to_timestamp_ntz(ns_to_string(col))


def ns_to_ntz_micros(col: Column | str) -> Column:
    """Epoch nanos -> TIMESTAMP_NTZ at microsecond resolution (full Spark
    timestamp precision; nanos truncate)."""
    c = F.col(col) if isinstance(col, str) else col
    micros = F.floor((c % F.lit(1_000_000_000)) / 1000).cast("long")
    frac = F.lpad(micros.cast("string"), 6, "0")
    return F.to_timestamp_ntz(F.concat(ns_to_string(c), F.lit("."), frac))


def ns_truncate(col: Column | str, unit_seconds: int) -> Column:
    """Floor epoch nanos to a multiple of ``unit_seconds``; returns epoch
    seconds (long). E.g. unit_seconds=3600 -> hour bucket."""
    c = F.col(col) if isinstance(col, str) else col
    unit_ns = F.lit(unit_seconds * 1_000_000_000)
    return ((c - (c % unit_ns)) / F.lit(1_000_000_000)).cast("long")
