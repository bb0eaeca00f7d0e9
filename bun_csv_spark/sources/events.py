"""Event-stream table loader.

The events table's ``ts`` column has shipped in two physical parquet
encodings across testdata generations:

* TIMESTAMP(NANOS) — Spark's vectorized reader rejects it outright
  (PARQUET_TYPE_ILLEGAL); the supported escape hatch is
  ``spark.sql.legacy.parquet.nanosAsLong``, which reads the column as an
  epoch-nanos long.
* TIMESTAMP(MICROS) — Spark reads it as TIMESTAMP_NTZ (naive wall clock).

Every downstream consumer (operators/timeseries.py, streaming/windows.py,
functions/timefmt.py, the event-window queries) does its event-time math on
exact epoch-nanos longs: window bucketing is a modulo, range frames are long
ranges, no timestamp codec in the hot path — the better plan at scale.
``ensure_ts_nanos`` is the single normalization point that makes BOTH
physical encodings present that contract: longs pass through untouched,
timestamp columns are converted with exact integer arithmetic (micros
parquet carries no sub-micro digits, so this is lossless).

SESSION-TZ INDEPENDENCE (the driver runs a PLAIN session — no UTC pin):
an NTZ wall clock is interpreted as UTC by construction. Casting NTZ→LTZ
would apply the *session* timezone, shifting every epoch by the tz offset
(and DST-gap round trips are lossy), so the NTZ branch instead computes
the epoch from wall-clock fields with pure integer arithmetic — date
diff, hour/minute, and ``extract(SECOND)`` (DECIMAL(8,6), exact micros) —
all tz-free operations on NTZ values. Bit-for-bit identical under any
session timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ntz_to_epoch_micros(c):
    """TIMESTAMP_NTZ wall clock -> epoch micros AS IF UTC, session-tz free.

    Every piece is a wall-clock extraction on NTZ (no tz in play):
    date-diff days, hour, minute, and extract(SECOND) -- a DECIMAL(8,6)
    carrying the full fractional second, so x1e6 is exact. All codegen'd
    built-ins; no timestamp codec survives past the scan projection."""
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    minutes = (days * 24 + F.hour(c).cast("long")) * 60 + F.minute(c).cast("long")
    sec_micros = (F.extract(F.lit("SECOND"), c) * 1_000_000).cast("long")
    return minutes * 60_000_000 + sec_micros


def ensure_ts_nanos(
    df: DataFrame, ts_col: str = "ts", long_factor: int | None = None
) -> DataFrame:
    """Normalize ``ts_col`` to epoch-nanos long, whatever its physical type.

    Long (nanosAsLong path) passes through with zero plan change when
    already nanos; other epoch units are detected by magnitude and scaled
    (see ``long_ts_factor``). TIMESTAMP_NTZ converts via tz-free
    wall-clock arithmetic (see ``ntz_to_epoch_micros``); TIMESTAMP (LTZ)
    via ``unix_micros`` (an instant -- already session-tz independent).
    The x1000 stays in long range through year ~2262.

    Streaming inputs: the timestamp branches are pure projections and work
    unchanged. The LONG branch needs a data probe, which streaming plans
    forbid — callers building a stream from a file source must pre-probe
    the unit on a BATCH read of the same path and pass ``long_factor``
    (``streaming/windows.run_stream_to_table`` does). A streaming long
    column with no ``long_factor`` passes through untouched (the
    nanosAsLong contract: replayed nanos parquet arrives as nanos longs).
    """
    if ts_col not in df.columns:
        return df
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.LongType):
        if long_factor is None:
            if df.isStreaming:
                return df
            long_factor = long_ts_factor(df, ts_col)
        if long_factor == 1:
            return df
        return df.withColumn(
            ts_col, (F.col(ts_col) * F.lit(long_factor)).cast("long")
        )
    c = F.col(ts_col)
    if isinstance(dt, T.TimestampNTZType):
        micros = ntz_to_epoch_micros(c)
    else:
        micros = F.unix_micros(c)
    return df.withColumn(ts_col, (micros * F.lit(1000)).cast("long"))


# modern-era epoch magnitudes are ~1.7e9 s / 1.7e12 ms / 1.7e15 us /
# 1.7e18 ns — four decades apart, so the column's max magnitude classifies
# the unit unambiguously for any timestamp between 1973 and 2240
_NANOS_FLOOR = 10**17


def long_ts_factor(df: DataFrame, ts_col: str = "ts") -> int:
    """Classify a LONG ts column's epoch unit by magnitude and return the
    multiplier that rescales it to nanos (1 = already nanos / empty).

    The probe is one small agg job — ``max(abs(ts))`` — deterministic at
    any input size (round-6 advice: a limit-1 row is arbitrary and a
    single 0/outlier row could misclassify the unit; the max of the
    column cannot). Batch DataFrames only; round-5 postmortem: testdata
    ts encodings drift between rounds, and a silent nanos assumption on a
    millis column would corrupt every window."""
    v = df.select(F.max(F.abs(F.col(ts_col)))).collect()[0][0]
    if v is None or v == 0 or v >= _NANOS_FLOOR:
        return 1
    factor = 1000
    while v * factor < _NANOS_FLOOR:
        factor *= 1000
    return factor


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with ``ts`` as epoch-nanos long."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ensure_ts_nanos(df)
