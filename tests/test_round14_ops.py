"""Round-14 operator tests: the four new TPC-H shapes (reference:
TPC-H spec Q7/Q9/Q15/Q16, adapted to the trimmed testdata schema — see
the gate docstrings in __spark_entry__.py).

Each gate's oracle equality is covered by the registry sweep; these
tests prove the LAWS behind the plan choices instead:
- q7: the scan-level two-key cut + post-join OR equals the canonical
  six-way join with the symmetric name predicate, no same-nation pair
  leaks through, and both dim cuts are pushed In() filters;
- q9: profit per (nation, year) matches a driver-side row-by-row
  recomputation of the adapted cost model;
- q15: argmax is tight (every winner equals the max, every loser is
  strictly below) and the duplicated per_supp subtree collapses via
  runtime exchange reuse (the q11 law applied to argmax);
- q16: the NOT IN -> left-anti decorrelation is exact for non-null
  keys, the nullable divergence (one NULL in the subquery empties a
  NOT IN) is demonstrated on synthetic data, and count(DISTINCT)
  absorbs duplicate (partkey, suppkey) pairs.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.001"


def _t(spark, name, sf=SF):
    return spark.read.parquet(os.path.join(sf, f"{name}.parquet"))


def test_q7_equals_canonical_join_and_excludes_same_nation(spark):
    """The gate's scan-level isin() cuts + post-join OR must equal the
    canonical six-way join that applies the symmetric name predicate
    directly, and no (supp_nation == cust_nation) row may survive."""
    # sf0.01: the 0.001 slice yields only 2 groups — use the wider one
    sf = "/root/testdata/sf0.01"
    rows = entry_mod.queries()["tpch_q7"](spark, sf).collect()
    assert rows, "q7 must be non-degenerate at sf0.01"
    assert all(r["supp_nation"] != r["cust_nation"] for r in rows)

    sn = _t(spark, "nation", sf).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, "nation", sf).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    want = (
        _t(spark, "lineitem", sf)
        .join(_t(spark, "supplier", sf), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .join(_t(spark, "orders", sf), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, "customer", sf), F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cnk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_5")
                & (F.col("cust_nation") == "NATION_12")
            )
            | (
                (F.col("supp_nation") == "NATION_12")
                & (F.col("cust_nation") == "NATION_5")
            )
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .collect()
    )
    key = lambda r: (r["supp_nation"], r["cust_nation"], r["l_year"])  # noqa: E731
    assert {key(r): r["revenue"] for r in rows} == {
        key(r): r["revenue"] for r in want
    }


def test_q7_both_cuts_are_scan_level(spark):
    """The r13 product rule made physical: the supplier AND customer
    nation cuts must be pushed In() predicates on their scans — a
    join-derived cut would price at the bytes-product of its children
    and plan a fact-wide exchange at sf100."""
    df = entry_mod.queries()["tpch_q7"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "In(s_nationkey, [12,5])" in plan
    assert "In(c_nationkey, [12,5])" in plan
    assert "CartesianProduct" not in plan


def test_q9_profit_matches_rowwise_recomputation(spark):
    """The adapted cost model (0.5 * p_retailprice per unit) recomputed
    driver-side row by row must reproduce every (nation, year) bucket."""
    rows = entry_mod.queries()["tpch_q9"](spark, SF).collect()
    price = {
        r["p_partkey"]: r["p_retailprice"]
        for r in _t(spark, "part").collect()
        if "red" in r["p_name"]
    }
    nat_of_supp = {
        r["s_suppkey"]: r["s_nationkey"] for r in _t(spark, "supplier").collect()
    }
    year_of_order = {
        r["o_orderkey"]: r["o_orderdate"].year for r in _t(spark, "orders").collect()
    }
    n_name = {
        r["n_nationkey"]: r["n_name"] for r in _t(spark, "nation").collect()
    }
    want: dict[tuple[str, int], float] = {}
    for li in _t(spark, "lineitem").collect():
        if li["l_partkey"] not in price:
            continue
        k = (
            n_name[nat_of_supp[li["l_suppkey"]]],
            year_of_order[li["l_orderkey"]],
        )
        amt = li["l_extendedprice"] * (1 - li["l_discount"]) - 0.5 * price[
            li["l_partkey"]
        ] * li["l_quantity"]
        want[k] = want.get(k, 0.0) + amt
    assert {(r["nation"], r["o_year"]) for r in rows} == set(want)
    for r in rows:
        assert abs(r["sum_profit"] - round(want[(r["nation"], r["o_year"])], 2)) < 0.02


def test_q15_argmax_tight_and_exchange_reused(spark):
    """(a) Argmax law: every returned supplier's revenue equals the max
    over ALL per-supplier revenues; every non-returned supplier with
    any qualifying lineitem is strictly below it. (b) Scale law: the
    per_supp subtree appears twice in the DAG (detail + max) but the
    executed plan collapses it via ReusedExchange — the fact is
    scanned once."""
    df = entry_mod.queries()["tpch_q15"](spark, SF)
    rows = df.collect()
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per = (
        _t(spark, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(rev) * 100, 0).cast("long").alias("vc"))
        .collect()
    )
    mx = max(r["vc"] for r in per)
    want = sorted(r["l_suppkey"] for r in per if r["vc"] == mx)
    assert sorted(r["s_suppkey"] for r in rows) == want
    assert all(r["total_revenue_cents"] == mx for r in rows)
    # plan read AFTER collect: AQE finalizes stage reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    live = plan.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in live
    assert live.count("lineitem.parquet") == 1


def test_q16_not_in_equals_anti_for_nonnull_and_diverges_on_null(spark):
    """The gate decorrelates NOT IN to a left-anti equi-join, which is
    equivalent ONLY because both key sides are non-nullable. Proven
    both ways on synthetic data: (a) with non-null keys, SQL NOT IN and
    the anti-join select identical rows; (b) one NULL in the NOT IN
    subquery empties the SQL result while the anti-join keeps
    non-matching rows — the divergence the decorrelation must respect."""
    probe = spark.createDataFrame(
        [(1,), (2,), (3,)], "k long"
    )
    clean = spark.createDataFrame([(2,), (9,)], "v long")
    probe.createOrReplaceTempView("probe14")
    clean.createOrReplaceTempView("clean14")
    got_sql = sorted(
        r["k"]
        for r in spark.sql(
            "SELECT k FROM probe14 WHERE k NOT IN (SELECT v FROM clean14)"
        ).collect()
    )
    got_anti = sorted(
        r["k"]
        for r in probe.join(clean, F.col("k") == F.col("v"), "left_anti").collect()
    )
    assert got_sql == got_anti == [1, 3]
    withnull = spark.createDataFrame([(2,), (None,)], "v long")
    withnull.createOrReplaceTempView("dirty14")
    got_sql_null = spark.sql(
        "SELECT k FROM probe14 WHERE k NOT IN (SELECT v FROM dirty14)"
    ).collect()
    got_anti_null = probe.join(
        withnull, F.col("k") == F.col("v"), "left_anti"
    ).collect()
    assert got_sql_null == []  # NULL makes every NOT IN row UNKNOWN
    assert sorted(r["k"] for r in got_anti_null) == [1, 3]


def test_q16_count_distinct_absorbs_duplicate_pairs(spark):
    """The gate skips the pre-distinct of (partkey, suppkey) pairs:
    count(DISTINCT l_suppkey) per group must equal the two-step
    distinct-then-count form — one full pair shuffle saved."""
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in entry_mod.queries()["tpch_q16"](spark, SF).collect()
    }
    pc = (
        _t(spark, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (~F.col("p_type").like("MEDIUM%"))
            & F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excl = (
        _t(spark, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    want = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in (
            _t(spark, "lineitem")
            .select("l_partkey", "l_suppkey")
            .distinct()  # the explicit pre-distinct the gate avoids
            .join(pc, F.col("l_partkey") == F.col("p_partkey"))
            .join(excl, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count(F.lit(1)).alias("supplier_cnt"))
            .collect()
        )
    }
    assert got == want


def test_q8_share_is_exact_integer_ratio_of_canonical_volumes(spark):
    """The market share must equal floor(nation_cents * 10000 /
    total_cents) over volumes recomputed through the CANONICAL
    eight-way join (names + region applied as post-join predicates,
    no constant-fold, no scan-level cut) — proving the q5-style
    artifact rewrite and the integer-space share at once. sf0.01:
    the 0.001 slice also passes but with near-degenerate volumes."""
    sf = "/root/testdata/sf0.01"
    rows = entry_mod.queries()["tpch_q8"](spark, sf).collect()
    assert rows, "q8 must be non-degenerate at sf0.01"
    sn = _t(spark, "nation", sf).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, "nation", sf).select(
        F.col("n_nationkey").alias("cnk"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    vol_e4 = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    want = (
        _t(spark, "lineitem", sf)
        .join(_t(spark, "part", sf), F.col("l_partkey") == F.col("p_partkey"))
        .join(_t(spark, "supplier", sf), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("snk"))
        .join(_t(spark, "orders", sf), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, "customer", sf), F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cnk"))
        .join(
            _t(spark, "region", sf),
            F.col("c_regionkey") == F.col("r_regionkey"),
        )
        .filter(
            (F.col("r_name") == "AMERICA")
            & (F.col("p_type") == "ECONOMY")
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_6", vol_e4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("n_e4"),
            F.sum(vol_e4).alias("t_e4"),
        )
        .collect()
    )
    # cents = e4-units // 100: non-negative domain, so Python floor ==
    # the gate's truncating div (see the integer-division law test)
    want_by_year = {
        r["o_year"]: (r["n_e4"] // 100, r["t_e4"] // 100) for r in want
    }
    assert {r["o_year"] for r in rows} == set(want_by_year)
    for r in rows:
        nvc, tvc = want_by_year[r["o_year"]]
        assert (r["nation_volume_cents"], r["total_volume_cents"]) == (nvc, tvc)
        assert 0 <= r["nation_volume_cents"] <= r["total_volume_cents"]
        assert r["mkt_share_bp"] == (nvc * 10000) // tvc  # exact long floor-div


def test_q8_customer_cut_is_scan_level(spark):
    """The r13 product rule applied to q8: the AMERICA-region customer
    cut must be a pushed In() predicate on the customer scan (the q5
    constant-fold), and the part cut a pushed equality — a join-derived
    cut would price at the bytes-product of its children and plan a
    fact-wide exchange at sf100."""
    df = entry_mod.queries()["tpch_q8"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # derive the expected AMERICA keys from the data (never hardcode the
    # testdata's specific keys), and match the pushed In() with its
    # values in ANY print order (Spark's ordering is not contractual)
    import re

    amer = sorted(
        r["n_nationkey"]
        for r in _t(spark, "nation")
        .join(
            _t(spark, "region").filter(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    )
    m = re.search(r"In\(c_nationkey, \[([0-9,]+)\]\)", plan)
    assert m, "customer cut must be a pushed In() on the scan"
    assert sorted(int(k) for k in m.group(1).split(",")) == amer
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "CartesianProduct" not in plan


def test_q8_integer_division_law(spark):
    """The q8 share relies on Spark's `div` and DuckDB's `//` agreeing
    on longs. Proven: both TRUNCATE toward zero on every sign combo,
    so the engines can never diverge on the share — but both DIVERGE
    from Python's floor `//` on mixed signs (-7 div 2 = -3 vs
    -7 // 2 = -4), which is why driver-side recomputations of the
    share (the other q8 law test) are valid only on the gate's
    non-negative domain (volumes are sums of positive prices)."""
    import duckdb

    cases = [(7, 2), (7000, 3), (0, 5), (123456789, 997),
             (-7, 2), (7, -2), (-7, -2)]
    rows = spark.createDataFrame(cases, "a long, b long").selectExpr(
        "a", "b", "a div b AS q"
    ).collect()
    spark_q = {(r["a"], r["b"]): r["q"] for r in rows}
    con = duckdb.connect()
    python_diverged = False
    for a, b in cases:
        duck_q = con.execute(f"SELECT {a}::BIGINT // {b}::BIGINT").fetchone()[0]
        assert spark_q[(a, b)] == duck_q, (a, b)  # engines always agree
        if duck_q != a // b:
            python_diverged = True  # Python floors, the engines truncate
    assert python_diverged


def test_q12_lag_formulations_agree_and_predicate_is_cross_table(spark):
    """(a) Law: the interval form (l_shipdate > o_orderdate + 60 days)
    and the datediff form (datediff > 60) select the same midnight-
    valued rows — the gate and oracle may phrase the lag either way.
    (b) The predicate is genuinely cross-table: dropping it changes the
    counts (so it cannot be pushed to either scan alone)."""
    li = (
        _t(spark, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_shipdate")
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
    )
    joined = li.join(
        _t(spark, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    interval = joined.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    datediff = joined.filter(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    )
    n_interval, n_datediff, n_all = (
        interval.count(),
        datediff.count(),
        joined.count(),
    )
    assert n_interval == n_datediff
    assert 0 < n_interval < n_all  # selective, and only decidable post-join
    # and the gate's counts partition the lag-filtered rows exactly
    rows = entry_mod.queries()["tpch_q12"](spark, SF).collect()
    assert sorted(r["ret_mode"] for r in rows) == ["A", "R"]
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n_interval


def test_bloom_words_layout_equals_map_layout(spark):
    """The r14 scale fix: element_at on a 1-row map bitmap is a LINEAR
    key scan (O(words) per probe — 7x slower than no prune at 30 Mbit),
    so large bitmaps switch to a broadcast words-TABLE layout probed by
    hash equi-joins. Laws: (a) both layouts keep the IDENTICAL row set
    (same false positives — same hash, same bits, different physical
    lookup) for both hash families; (b) no false negatives ever; (c)
    the words layout probes via BroadcastHashJoin, never a
    nested-loop; (d) auto-selection flips at BLOOM_MAP_MAX_BITS."""
    from bun_csv_spark.operators.maintenance import (
        BLOOM_MAP_MAX_BITS,
        bloom_semi_join,
    )

    probe = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    build = spark.range(0, 5000, 7).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    members = {f"k{i}" for i in range(0, 5000, 7)}
    for hf in ("md5", "xxhash64"):
        a = sorted(
            r["key"]
            for r in bloom_semi_join(
                probe, build, "key", m_bits=1 << 14, hash_fn=hf, layout="map"
            ).collect()
        )
        b = sorted(
            r["key"]
            for r in bloom_semi_join(
                probe, build, "key", m_bits=1 << 14, hash_fn=hf, layout="words"
            ).collect()
        )
        assert a == b
        assert members <= set(a)
    big = bloom_semi_join(
        probe, build, "key", m_bits=2 * BLOOM_MAP_MAX_BITS, hash_fn="xxhash64"
    )
    assert members <= {r["key"] for r in big.collect()}
    assert big.columns == ["key"]
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dlit_llit_guards(spark):
    """r13 advice: non-finite dlit inputs must survive as literals (the
    old F.lit(float) path accepted them) and empty arrays must fail
    loudly instead of typing as array<void>."""
    import math

    import pytest

    from bun_csv_spark.functions.vectors import dlit, llit
    row = spark.range(1).select(
        dlit([1.5, float("nan"), float("inf"), float("-inf")]).alias("a")
    ).collect()[0]
    assert row["a"][0] == 1.5
    assert math.isnan(row["a"][1])
    assert row["a"][2] == float("inf")
    assert row["a"][3] == float("-inf")
    with pytest.raises(ValueError, match="empty"):
        dlit([])
    with pytest.raises(ValueError, match="empty"):
        dlit([[1.0], []])
    with pytest.raises(ValueError, match="empty"):
        llit([])
