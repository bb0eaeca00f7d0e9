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


def ns_div(col: Column | str, divisor: int) -> Column:
    """EXACT integral division of epoch-scale longs, as a long.

    ``(c - c % d) / d`` is NOT safe here: `/` promotes through double,
    and 1e18-magnitude longs lose up to ~256 ns of precision in the
    double round-trip — the truncated quotient comes out off by one for
    a few permille of rows (observed 54/1981 on micro-granularity gaps).
    Decimal division is exact at any magnitude."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.lit(divisor).cast("decimal(19,0)")
    return ((c - c % F.lit(divisor)).cast("decimal(38,0)") / d).cast("long")


def ns_to_seconds(col: Column | str) -> Column:
    """Epoch nanos -> epoch seconds (floor), exact AND cheap.

    ``c div 1e9`` == ``(c >> 9) div 1953125`` because 1e9 = 512·1953125
    and the shifted remainder stays below the divisor. The shifted
    numerator (~3.6e15) fits a double exactly, and for quotients < 2^32
    (epoch seconds through year 2106) the minimum nonzero fractional part
    of the true quotient (1/1953125 ≈ 5.1e-7) exceeds the worst IEEE
    division rounding error (ulp/2 ≈ 2.4e-7), so floor() of the double
    quotient is provably the exact integer result — no decimal op in the
    per-row hot path (ns_div's decimal is ~30% slower on window-heavy
    event queries)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.shiftright(c, 9) / F.lit(1953125)).cast("long")


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
    return ns_to_seconds(c - (c % unit_ns))
