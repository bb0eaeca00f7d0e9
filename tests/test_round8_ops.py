"""Round-8 operator tests: incremental pipeline composition and
cross-modality leakage-safe splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- incremental day pipeline ----------------------------------------------


def test_incremental_day_pipeline_invariants(spark):
    """The composed gate at sf0.001: one summary row per event_type with
    every family's invariants holding — CM never underestimates (est >=
    exact n, and here the sketched key IS the group key so est_count_cm
    bounds n from above), quantiles ordered, moments consistent."""
    import __spark_entry__ as entry

    rows = entry.q_incremental_day_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["min_c"] <= r["max_c"]
        assert r["p50"] <= r["p90"]
        assert r["est_count_cm"] >= r["n"]  # count-min one-sided error
        assert r["est_distinct_users"] > 0
        assert r["min_c"] <= r["mean_c_e4"] / 10_000 <= r["max_c"]


def test_incremental_day_pipeline_merge_associativity(spark):
    """The pipeline's merge step must not care HOW the days are grouped:
    merge(merge(d0, d1), d2) == merge(d0, merge(d1, d2)) for the agg
    state — the associativity a rolling daily job depends on (day N's
    state is itself a merge of all prior days)."""
    from bun_csv_spark.operators.maintenance import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    df = spark.range(3000).select(
        "id",
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 37 % 1000).cast("long").alias("v"),
    )
    days = [df.filter(F.col("id") % 3 == d) for d in range(3)]
    s = [agg_state(d, ["k"], "v") for d in days]
    left = merge_agg_states(merge_agg_states(s[0], s[1], ["k"]), s[2], ["k"])
    right = merge_agg_states(s[0], merge_agg_states(s[1], s[2], ["k"]), ["k"])
    a = sorted(map(tuple, finalize_agg_state(left).collect()))
    b = sorted(map(tuple, finalize_agg_state(right).collect()))
    assert a == b
