"""Pin the events source against parquet ts-encoding drift.

Round-5 postmortem: the testdata's ``ts`` column silently changed from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds and took 16 queries
down. ``read_events`` / ``ensure_ts_nanos`` must present the SAME contract
— epoch-nanos long — for every physical encoding the column has ever
shipped in. This test writes one fixture per encoding and asserts dtype
and exact values match.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bun_csv_spark.sources.events import ensure_ts_nanos, read_events

# one exact wall-clock instant per row; nanos chosen so the micros view
# truncates cleanly (sub-micro digits zero — what micros parquet stores)
EPOCH_NANOS = [
    1_704_067_200_000_000_000,  # 2024-01-01 00:00:00
    1_704_070_800_123_456_000,  # 2024-01-01 01:00:00.123456
    1_704_074_400_999_999_000,  # 2024-01-01 02:00:00.999999
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{path}/events.parquet")


@pytest.fixture()
def micros_dir(tmp_path):
    d = tmp_path / "micros"
    d.mkdir()
    _write_events(str(d), pa.array([n // 1000 for n in EPOCH_NANOS], pa.timestamp("us")))
    return str(d)


@pytest.fixture()
def nanos_dir(tmp_path):
    d = tmp_path / "nanos"
    d.mkdir()
    _write_events(str(d), pa.array(EPOCH_NANOS, pa.timestamp("ns")))
    return str(d)


def test_read_events_micros_parquet_yields_epoch_nanos_long(spark, micros_dir):
    df = read_events(spark, micros_dir)
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {i + 1: n for i, n in enumerate(EPOCH_NANOS)}


def test_read_events_nanos_parquet_yields_epoch_nanos_long(spark, nanos_dir):
    df = read_events(spark, nanos_dir)
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {i + 1: n for i, n in enumerate(EPOCH_NANOS)}


def test_both_encodings_produce_identical_frames(spark, micros_dir, nanos_dir):
    a = read_events(spark, micros_dir).orderBy("event_id").collect()
    b = read_events(spark, nanos_dir).orderBy("event_id").collect()
    assert a == b


def test_ensure_ts_nanos_passthrough_on_long(spark):
    # modern-era epoch-nanos magnitude -> identity, no extra projection
    df = spark.createDataFrame(
        [(1, EPOCH_NANOS[0])], "event_id long, ts long"
    )
    out = ensure_ts_nanos(df)
    assert out is df


def test_ensure_ts_nanos_missing_column_noop(spark):
    df = spark.createDataFrame([(1,)], "event_id long")
    assert ensure_ts_nanos(df) is df


def test_read_events_is_session_timezone_independent(spark, micros_dir):
    """The driver runs a PLAIN session (no UTC pin) — NTZ normalization
    must not shift with the session timezone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {r.event_id: r.ts for r in read_events(spark, micros_dir).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == {i + 1: n for i, n in enumerate(EPOCH_NANOS)}


def test_long_ts_unit_detection(spark, tmp_path):
    """Future-drift insurance: epoch-millis / -seconds / -micros longs
    scale up to nanos; nanos longs pass through untouched."""
    for unit, div in (("s", 10**9), ("ms", 10**6), ("us", 10**3), ("ns", 1)):
        d = tmp_path / f"long_{unit}"
        d.mkdir()
        vals = [n // div for n in EPOCH_NANOS]
        _write_events(str(d), pa.array(vals, pa.int64()))
        df = read_events(spark, str(d))
        got = {r.event_id: r.ts for r in df.collect()}
        # sub-unit digits truncate at write time; scaling restores the unit
        exp = {i + 1: (n // div) * div for i, n in enumerate(EPOCH_NANOS)}
        assert got == exp, unit


def test_streaming_long_ts_nanos_passes_through(spark, tmp_path):
    """Round-6 advice (high): ensure_ts_nanos on a STREAMING frame with a
    long ts column must not probe (collect is illegal on streams). Nanos
    longs — the nanosAsLong replay path — must pass through; other units
    are handled by run_stream_to_table's batch-side probe (below)."""
    from pyspark.sql import functions as F

    from bun_csv_spark.streaming.windows import run_stream_to_table

    d = tmp_path / "stream_ns"
    d.mkdir()
    _write_events(str(d), pa.array(EPOCH_NANOS, pa.int64()))

    def transform(stream):
        assert stream.isStreaming
        return stream.groupBy("event_type").agg(F.max("ts").alias("max_ts"))

    out = run_stream_to_table(
        spark, str(d / "events.parquet"), transform, "complete", normalize_ts=True
    )
    got = {r.event_type: r.max_ts for r in out.collect()}
    assert got == {
        "click": EPOCH_NANOS[0],
        "view": EPOCH_NANOS[1],
        "purchase": EPOCH_NANOS[2],
    }


def test_streaming_long_ts_millis_rescaled_via_batch_probe(spark, tmp_path):
    """A millis-encoded long ts column replayed through readStream still
    arrives downstream as epoch nanos: the unit factor comes from a batch
    read of the source path, the stream only carries the projection."""
    from pyspark.sql import functions as F

    from bun_csv_spark.streaming.windows import run_stream_to_table

    d = tmp_path / "stream_ms"
    d.mkdir()
    _write_events(str(d), pa.array([n // 10**6 for n in EPOCH_NANOS], pa.int64()))

    def transform(stream):
        return stream.groupBy("event_type").agg(F.max("ts").alias("max_ts"))

    out = run_stream_to_table(
        spark, str(d / "events.parquet"), transform, "complete", normalize_ts=True
    )
    got = {r.event_type: r.max_ts for r in out.collect()}
    assert got == {
        "click": (EPOCH_NANOS[0] // 10**6) * 10**6,
        "view": (EPOCH_NANOS[1] // 10**6) * 10**6,
        "purchase": (EPOCH_NANOS[2] // 10**6) * 10**6,
    }


def test_long_ts_factor_deterministic_on_zero_rows(spark):
    """Round-6 advice (low): the probe is max(abs(ts)) — a 0 in the data
    or row-order nondeterminism can't misclassify the unit."""
    from bun_csv_spark.sources.events import long_ts_factor

    millis = EPOCH_NANOS[0] // 10**6
    df = spark.createDataFrame(
        [(0,), (millis,), (None,)], "ts long"
    )
    assert long_ts_factor(df) == 10**6
    empty = spark.createDataFrame([], "ts long")
    assert long_ts_factor(empty) == 1
