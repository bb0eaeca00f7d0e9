"""Round-13 operator tests: the four remaining TPC-H shapes
(reference: TPC-H spec Q19/Q20/Q11/Q22, adapted to the trimmed testdata
schema — see the gate docstrings in __spark_entry__.py).

Each gate's oracle equality is covered by the registry sweep; these
tests prove the LAWS behind the plan choices instead:
- q19: the single-scan disjunctive filter equals the three-branch UNION
  (the branches are brand-disjoint), and the physical plan has no Union
  and no cartesian;
- q20: the one-pass conditional aggregate equals the textbook
  decorrelation (two independent aggregates joined, then thresholded);
- q11: every surviving part clears the 3x-mean threshold, every
  eliminated part does not, and the duplicated aggregation subtree is
  collapsed by ReuseExchange (fact scanned once);
- q22: the anti-join is exact — each reported bucket counts exactly the
  above-average customers with no post-cutoff orders.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.conftest import spark  # noqa: F401

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(os.path.join(SF, f"{name}.parquet"))


def _branch(spark, brand, types, size_hi, q_lo, q_hi):
    li = _t(spark, "lineitem")
    part = _t(spark, "part").filter(
        (F.col("p_brand") == brand)
        & F.col("p_type").isin(*types)
        & F.col("p_size").between(1, size_hi)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_quantity").between(q_lo, q_hi))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(rev).alias("r"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )


def test_q19_disjunction_equals_branch_union(spark):
    """The one-scan OR-of-ANDs must equal the sum of the three branch
    queries run independently (they are disjoint: each fixes a distinct
    p_brand). Proves the compound filter is a physical choice, not a
    semantic rewrite — and that no rows are double-counted or lost at
    the branch boundaries."""
    got = entry_mod.queries()["tpch_q19"](spark, SF).collect()[0]
    b1 = _branch(spark, "Brand#12", ["SMALL", "MEDIUM"], 5, 1, 11)
    b2 = _branch(spark, "Brand#23", ["MEDIUM", "LARGE"], 10, 10, 20)
    b3 = _branch(spark, "Brand#5", ["ECONOMY", "STANDARD", "PROMO"], 15, 20, 30)
    n = sum(b["n"] for b in (b1, b2, b3))
    r = sum(b["r"] or 0.0 for b in (b1, b2, b3))
    assert got["n_items"] == n
    assert abs((got["revenue"] or 0.0) - round(r, 2)) < 0.02


def test_q19_plan_single_scan_no_union(spark):
    """The grading point of the disjunctive shape: ONE scan per table,
    ONE compound predicate — never a three-branch union, never a
    cartesian evaluation of the OR."""
    df = entry_mod.queries()["tpch_q19"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("part.parquet") == 1


def test_q20_conditional_agg_equals_decorrelated_form(spark):
    """The gate folds the correlated 0.5*sum threshold into one
    conditional aggregate. The textbook decorrelation — aggregate the
    1996 quantity and the all-time quantity in two independent
    groupBys, join on (partkey, suppkey), then filter — must select the
    identical supplier set."""
    got = sorted(
        r["s_name"]
        for r in entry_mod.queries()["tpch_q20"](spark, SF).collect()
    )
    li = (
        _t(spark, "lineitem")
        .join(
            _t(spark, "part")
            .filter(F.col("p_name").like("small%"))
            .select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    total = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty_total")
    )
    y96 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.sum("l_quantity").alias("qty96"))
    )
    keys = (
        total.join(
            y96,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_suppkey") == F.col("sk")),
        )
        .filter(F.col("qty96") > 0.5 * F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    nation3 = _t(spark, "nation").filter(F.col("n_name") == "NATION_3")
    want = sorted(
        r["s_name"]
        for r in _t(spark, "supplier")
        .join(nation3, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(keys, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name")
        .collect()
    )
    assert got == want


def test_q11_threshold_is_tight_and_exchange_reused(spark):
    """(a) Threshold law: every returned part's value_cents exceeds 3x
    the mean over ALL per-part values (not just the returned ones), and
    every eliminated part's does not. (b) Scale law: the per_part
    aggregation subtree appears twice in the DAG (detail + threshold)
    but the physical plan collapses it via ReuseExchange — the fact is
    scanned once."""
    # sf0.01: the 0.001 slice has no NATION_7-supplied lineitems at all
    sf = "/root/testdata/sf0.01"
    df = entry_mod.queries()["tpch_q11"](spark, sf)
    rows = df.collect()

    def _t10(spark, name):
        return spark.read.parquet(os.path.join(sf, f"{name}.parquet"))

    n7 = (
        _t10(spark, "supplier")
        .join(
            _t10(spark, "nation").filter(F.col("n_name") == "NATION_7"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        _t10(spark, "lineitem")
        .join(n7, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum(rev) * 100, 0).cast("long").alias("vc"))
        .collect()
    )
    thr = 3 * (sum(r["vc"] for r in per_part) / len(per_part))
    want = {r["l_partkey"]: r["vc"] for r in per_part if r["vc"] > thr}
    assert {r["partkey"]: r["value_cents"] for r in rows} == want
    # plan read AFTER collect: AQE finalizes stage reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    live = plan.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in live
    assert live.count("lineitem.parquet") == 1


def test_q22_anti_join_membership_exact(spark):
    """Each reported bucket must count exactly the customers that (a)
    wear one of the seven codes, (b) beat the positive-balance average
    of the coded population, and (c) have NO order on/after the cutoff
    — recomputed here row-by-row driver-side."""
    rows = {
        r["cntrycode"]: (r["numcust"], r["totacctbal"])
        for r in entry_mod.queries()["tpch_q22"](spark, SF).collect()
    }
    cust = _t(spark, "customer").collect()
    orders = _t(spark, "orders").collect()
    import datetime

    cutoff = datetime.datetime(2000, 1, 1)
    recent = {o["o_custkey"] for o in orders if o["o_orderdate"] >= cutoff}
    codes = {"13", "31", "23", "29", "30", "18", "17"}
    sel = [c for c in cust if c["c_name"][16:18] in codes]
    pos = [c["c_acctbal"] for c in sel if c["c_acctbal"] > 0]
    avg = sum(pos) / len(pos)
    want: dict[str, list[float]] = {}
    for c in sel:
        if c["c_acctbal"] > avg and c["c_custkey"] not in recent:
            want.setdefault(c["c_name"][16:18], []).append(c["c_acctbal"])
    assert set(rows) == set(want)
    for code, (n, tot) in rows.items():
        assert n == len(want[code])
        assert abs(tot - round(sum(want[code]), 2)) < 0.02
