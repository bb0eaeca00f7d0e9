"""Round-16: focused tests for the oracle-result cache
(tools/check_correctness.py) — load-bearing since r15 for the whole
verification chain, so its failure paths must be pinned:

  * hit/miss basics — a second identical call replays the stored
    parquet (the Spark side under test always runs live; only DuckDB
    is memoized)
  * corrupt entry -> live fallback (the cache can never flip a verdict)
  * unserializable result -> never cached (live every time)
  * round-trip-lossy result -> the write-time guard deletes the entry
  * engine versions are part of the key (a DuckDB/pandas upgrade
    invalidates every entry)
  * --no-oracle-cache (use_cache=False) -> live, nothing written
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pytest

import tools.check_correctness as cc

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "oracle_cache"
    monkeypatch.setattr(cc, "CACHE_DIR", str(d))
    return d


def _key_path(cache_dir, digest: str, sql: str) -> str:
    key = hashlib.sha256((digest + "\x00" + sql).encode()).hexdigest()
    return os.path.join(str(cache_dir), f"{key}.parquet")


DIGEST = "test-fixture-digest"
SQL = "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y' ORDER BY a"


def test_cache_miss_then_hit(con, cache_dir):
    df1, cached1 = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert not cached1
    path = _key_path(cache_dir, DIGEST, SQL)
    assert os.path.exists(path), "first run must write the memo"
    df2, cached2 = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert cached2
    assert cc.canonical(df2) == cc.canonical(df1)
    assert list(df2.columns) == list(df1.columns)


def test_corrupt_entry_falls_back_to_live(con, cache_dir):
    path = _key_path(cache_dir, DIGEST, SQL)
    os.makedirs(str(cache_dir), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"this is not a parquet file")
    df, cached = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert not cached, "corrupt entry must fall back to live DuckDB"
    assert cc.canonical(df) == cc.canonical(
        con.execute(SQL).df()
    )
    # the live run rewrites a good entry over the corpse
    df2, cached2 = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert cached2 and cc.canonical(df2) == cc.canonical(df)


def test_unserializable_result_is_never_cached(con, cache_dir, monkeypatch):
    # a result parquet cannot represent (the write raises) must stay
    # live-only: no entry on disk, correct result returned every time
    def boom(self, *a, **kw):
        raise ValueError("unserializable for parquet")

    monkeypatch.setattr(pd.DataFrame, "to_parquet", boom)
    df1, cached1 = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert not cached1
    assert not os.path.exists(_key_path(cache_dir, DIGEST, SQL))
    df2, cached2 = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert not cached2, "unserializable result must run live every time"
    assert cc.canonical(df2) == cc.canonical(df1)
    assert cc.canonical(df1) == cc.canonical(con.execute(SQL).df())


def test_roundtrip_guard_deletes_lossy_entry(con, cache_dir, monkeypatch):
    # simulate a dtype-lossy parquet round trip: the read-back frame
    # comes home with a different dtype; the write-time guard must
    # delete the entry rather than let a lossy memo decide PASS/FAIL
    real_read = pd.read_parquet

    def lossy_read(path, *a, **kw):
        out = real_read(path, *a, **kw)
        return out.astype({"a": "float64"})

    monkeypatch.setattr(cc.pd, "read_parquet", lossy_read)
    df, cached = cc.run_oracle(con, SQL, DIGEST, use_cache=True)
    assert not cached
    assert not os.path.exists(_key_path(cache_dir, DIGEST, SQL)), (
        "guard must remove an entry whose round trip is not exact"
    )


def test_engine_versions_are_part_of_the_key(monkeypatch):
    d1 = cc._fixture_digest(SF)
    monkeypatch.setattr(cc.duckdb, "__version__", "0.0.0-test")
    d2 = cc._fixture_digest(SF)
    assert d1 != d2, "a DuckDB upgrade must invalidate every cache entry"


def test_no_cache_flag_runs_live_and_writes_nothing(con, cache_dir):
    df, cached = cc.run_oracle(con, SQL, DIGEST, use_cache=False)
    assert not cached
    assert not os.path.exists(str(cache_dir)), (
        "--no-oracle-cache must not touch the cache directory"
    )
