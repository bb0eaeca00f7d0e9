"""As-of join and bounded range join (operators.temporal — extension
surface; the reference has single-equi-key joins only, SURVEY §2.3)."""

import pytest
from pyspark.sql import functions as F

from bun_csv_spark.operators.temporal import asof_join, range_join_buckets


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 100, "t1"), ("A", 205, "t2"), ("B", 150, "t3"), ("C", 50, "tc")],
        "sym string, ts long, trade_id string",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 90, 1.0), ("A", 100, 1.5), ("A", 200, 2.0), ("B", 160, 9.9)],
        "sym string, ts long, px double",
    )


def test_asof_backward_with_ties(trades, quotes):
    q = quotes.select("sym", "ts", F.col("ts").alias("qts"), "px")
    out = {
        r.trade_id: (r.qts, r.px)
        for r in asof_join(
            trades, q, key="sym", ts="ts", right_cols=["qts", "px"]
        ).collect()
    }
    assert out["t1"] == (100, 1.5)  # equal ts matches (prior-or-equal)
    assert out["t2"] == (200, 2.0)  # latest prior, not just any prior
    assert out["t3"] == (None, None)  # B's only quote is later -> no match
    assert out["tc"] == (None, None)  # no quotes at all for C


def test_asof_tolerance(trades, quotes):
    q = quotes.select("sym", "ts", F.col("ts").alias("qts"), "px")
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, q, key="sym", ts="ts", right_cols=["qts", "px"],
            tolerance=4, right_ts_col="qts",
        ).collect()
    }
    assert out["t1"] == 1.5  # gap 0 <= 4
    assert out["t2"] is None  # gap 5 > 4 -> dropped


def test_range_join_bucketed(spark):
    points = spark.createDataFrame(
        [("u", 5), ("u", 14), ("u", 25), ("v", 14)], "k string, pts long"
    )
    intervals = spark.createDataFrame(
        [("u", 10, 20, "i1"), ("u", 0, 30, "i2")], "k string, s long, e long, iv string"
    )
    out = range_join_buckets(
        points, intervals, key="k", point_ts="pts", start="s", end="e", bucket_width=7
    )
    got = sorted((r.iv, r.pts) for r in out.collect())
    # i1 covers u@14 only; i2 covers u@5, u@14, u@25; v@14 matches nothing
    assert got == [("i1", 14), ("i2", 5), ("i2", 14), ("i2", 25)]
    # each (interval, point) pair appears exactly once despite bucket explode
    assert len(got) == len(set(got))


def test_asof_join_validation(trades, quotes):
    q = quotes.select("sym", "ts", F.col("ts").alias("qts"), "px")
    with pytest.raises(ValueError, match="requires right_ts_col"):
        asof_join(trades, q, key="sym", ts="ts",
                  right_cols=["px", "qts"], tolerance=4)
    with pytest.raises(ValueError, match="must be one of right_cols"):
        asof_join(trades, q, key="sym", ts="ts",
                  right_cols=["px"], tolerance=4, right_ts_col="qts")
    with pytest.raises(ValueError, match="not in right DataFrame"):
        asof_join(trades, q, key="sym", ts="ts", right_cols=["nope"])
    with pytest.raises(ValueError, match="collide with left columns"):
        asof_join(trades, quotes.select("sym", "ts", F.col("px").alias("trade_id")),
                  key="sym", ts="ts", right_cols=["trade_id"])
    # payload-first ordering now works when right_ts_col is explicit
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, q, key="sym", ts="ts", right_cols=["px", "qts"],
            tolerance=4, right_ts_col="qts",
        ).collect()
    }
    assert out["t1"] == 1.5 and out["t2"] is None


def test_interval_overlap_join_exact_and_deduped(spark):
    from bun_csv_spark.operators.temporal import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 1, 0, 100), (2, 1, 500, 600), (3, 2, 0, 100)],
        "lid long, k long, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            (10, 1, 50, 150),    # overlaps lid=1 (spans 2 buckets at width 40)
            (11, 1, 90, 95),     # inside lid=1
            (12, 1, 200, 300),   # no overlap
            (13, 2, 100, 120),   # touches lid=3 at a single point
        ],
        "rid long, k long, rs long, re long",
    )
    out = interval_overlap_join(
        left, right, "k", "ls", "le", "rs", "re", bucket_width=40
    )
    pairs = sorted((r.lid, r.rid, r.overlap) for r in out.collect())
    # each overlapping pair appears EXACTLY once despite multi-bucket spans
    assert pairs == [(1, 10, 50), (1, 11, 5), (3, 13, 0)]


def test_asof_salted_matches_unsalted_on_hot_key(spark):
    """asof_join_salted (skew composition) must return exactly the plain
    asof_join result on a dataset where one key owns ~90% of rows, and its
    physical plan must window on (key, __salt) — no single reducer owns
    the hot key."""
    from bun_csv_spark.operators.temporal import asof_join_salted

    hot = [("HOT", 10 * i + 5, f"e{i}") for i in range(450)]
    cold = [(f"K{i}", 10 * i + 5, f"c{i}") for i in range(50)]
    left = spark.createDataFrame(hot + cold, "k string, ts long, eid string")
    right = spark.createDataFrame(
        [("HOT", 10 * i, float(i)) for i in range(0, 450, 3)]
        + [(f"K{i}", 10 * i, 1000.0 + i) for i in range(50)],
        "k string, ts long, px double",
    )
    r = right.select("k", "ts", F.col("ts").alias("rts"), "px")

    plain = asof_join(left, r, "k", "ts", ["rts", "px"])
    salted = asof_join_salted(left, r, "k", "ts", ["rts", "px"], n_salt=4)
    exp = {t.eid: (t.rts, t.px) for t in plain.collect()}
    got = {t.eid: (t.rts, t.px) for t in salted.collect()}
    assert got == exp and len(got) == 500

    plan = salted._jdf.queryExecution().executedPlan().toString()
    win = [ln for ln in plan.splitlines() if "Window" in ln and "__m_" in ln]
    assert win and all("__salt" in ln for ln in win), win


def test_asof_salted_tolerance(spark):
    from bun_csv_spark.operators.temporal import asof_join_salted

    left = spark.createDataFrame(
        [("A", 100, "t1"), ("A", 500, "t2")], "k string, ts long, eid string"
    )
    right = spark.createDataFrame(
        [("A", 90, 1.0)], "k string, ts long, px double"
    ).select("k", "ts", F.col("ts").alias("rts"), "px")
    out = {
        t.eid: t.px
        for t in asof_join_salted(
            left, right, "k", "ts", ["rts", "px"],
            n_salt=3, tolerance=50, right_ts_col="rts",
        ).collect()
    }
    assert out == {"t1": 1.0, "t2": None}
