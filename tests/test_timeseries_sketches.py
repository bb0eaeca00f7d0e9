"""Time-series operators, KMV sketch, corpus curriculum/versioning ops."""

import pytest
from pyspark.sql import functions as F

from bun_csv_spark.functions.sketches import kmv_distinct
from bun_csv_spark.operators.corpus import (
    balanced_sample,
    curriculum_shards,
    quantile_normalize,
)
from bun_csv_spark.operators.timeseries import (
    decay_weighted_sum,
    funnel_stages,
    rolling_range_stats,
    trailing_zscore,
)
from bun_csv_spark.operators.versioning import snapshot_diff

NS = 1_000_000_000


@pytest.fixture(scope="module")
def events_df(spark):
    # user 1: steady minute-spaced events; user 2: one big gap
    rows = []
    for i in range(40):
        rows.append((i, i * 60 * NS, 1, "view" if i % 3 == 0 else "click", 1.0 + i))
    rows.append((100, 0, 2, "view", 5.0))
    rows.append((101, 7200 * NS, 2, "purchase", 7.0))
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )


def test_rolling_range_is_event_time_not_rows(events_df):
    out = {
        r.event_id: (r.roll_avg, r.roll_n)
        for r in rolling_range_stats(
            events_df, window_sec=300, value_col="value"
        ).collect()
    }
    # event 10 (t=600s): window [300s, 600s] covers events 5..10 -> 6 rows
    assert out[10][1] == 6
    assert out[10] == (round(sum(1.0 + i for i in range(5, 11)) / 6, 4), 6)
    # user 2's second event is 2h after the first: window holds only itself
    assert out[101] == (7.0, 1)


def test_decay_weighted_halves_per_half_life(spark):
    df = spark.createDataFrame(
        [(1, 0, 1, "x", 8.0), (2, 86400 * NS, 1, "x", 0.0)],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    row = decay_weighted_sum(df, half_life_sec=86400).collect()[0]
    # ref = t of second event; first event is exactly one half-life old
    assert row.decayed_sum == 4.0
    assert row.n_events == 2


def test_trailing_zscore_excludes_current_row(spark):
    rows = [(i, i * NS, 1, "x", 10.0) for i in range(20)]
    rows.append((20, 20 * NS, 1, "x", 50.0))  # spike
    rows.append((21, 21 * NS, 1, "x", 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    out = {r.event_id: r for r in trailing_zscore(df, n_trailing=20).collect()}
    # event 20's window is 20 flat values -> sd=0 -> z null, not anomalous-by-div
    assert out[20].zscore is None
    # event 21's window contains the spike; its own value is not in it
    assert out[21].zscore is not None and out[21].is_anomaly is False
    # events 0..19 lack a full window and are dropped
    assert 5 not in out


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 10, 1, "view", 0.0), (2, 20, 1, "click", 0.0), (3, 30, 1, "purchase", 0.0),
        # user 2: purchase BEFORE view/click -> stops at stage 1 (view only)
        (4, 5, 2, "purchase", 0.0), (5, 10, 2, "view", 0.0),
        # user 3: click only, no view -> stage 0
        (6, 10, 3, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    out = {r.user_id: r.funnel_stage for r in funnel_stages(df).collect()}
    assert out == {1: 3, 2: 1, 3: 0}


def test_kmv_exact_below_k_estimate_above(spark):
    df = spark.createDataFrame(
        [("small", i) for i in range(10)] + [("big", i) for i in range(2000)],
        "grp string, v long",
    )
    out = {r.grp: r.est_distinct for r in kmv_distinct(df, ["grp"], "v", k=64).collect()}
    assert out["small"] == 10.0  # below k: exact
    assert 1400 <= out["big"] <= 2600  # sketch estimate in a sane band


def test_curriculum_shards_balanced_and_ordered(spark):
    df = spark.createDataFrame([(i, i) for i in range(1000)], "doc_id long, n long")
    out = curriculum_shards(df, difficulty_col="n", n_shards=10).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.difficulty)
    assert set(by_shard) == set(range(1, 11))
    # shards partition the difficulty axis in order
    assert max(by_shard[1]) < min(by_shard[2])
    assert max(by_shard[9]) < min(by_shard[10])
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] >= 90 and sizes[-1] <= 110


def test_quantile_normalize_rank_within_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 999)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.doc_id: r.qnorm for r in quantile_normalize(df).collect()}
    assert out[1] == 0.0 and out[2] == 0.5 and out[3] == 1.0
    assert out[4] == 0.0  # singleton group


def test_balanced_sample_caps_each_stratum(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "rare") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = balanced_sample(df, per_group=50).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    assert counts == {"big": 50, "rare": 50}
    # deterministic: same 50 every run
    a = {r.doc_id for r in balanced_sample(df, per_group=50).collect()}
    b = {r.doc_id for r in balanced_sample(df, per_group=50).collect()}
    assert a == b


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string"
    )
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_temporal_split_holds_out_latest(spark):
    from bun_csv_spark.operators.timeseries import temporal_holdout_split

    rows = [(i, i * NS, 1, "x", 0.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    out = {r.event_id: r.split for r in temporal_holdout_split(df).collect()}
    # last ceil(0.2*10)=2 events by time are test, everything before train
    assert [out[i] for i in range(10)] == ["train"] * 8 + ["test"] * 2


def test_robust_scale_median_centered(spark):
    from bun_csv_spark.operators.corpus import robust_scale

    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate([0, 10, 20, 30, 40])]
        + [(9, "const", 7), (10, "const", 7)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.doc_id: r.scaled for r in robust_scale(df).collect()}
    assert out[2] == 0.0  # median row
    assert out[4] == 1.0  # (40-20)/(30-10)
    assert out[9] is None  # zero IQR -> explicit NULL


def test_inverted_index_bounded_and_deterministic(spark):
    from bun_csv_spark.functions.text import build_inverted_index

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha gamma"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    out = build_inverted_index(df, top_terms=2).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r.term, set()).add(r.doc_id)
    # alpha df=3, beta df=2, gamma df=1 cut by top_terms=2
    assert set(by_term) == {"alpha", "beta"}
    assert by_term["alpha"] == {1, 2, 3}
    assert by_term["beta"] == {1, 3}  # per-doc distinct: doc 1 counted once
