"""Round-16 lint rules: the two static-pricing traps as library checks.

Rounds 12-15 hit the same two size-only-estimator bugs FIVE times, each
fixed by a hand-placed per-gate hint (SCALE.md r13/r14/r15):

  trap (a) fact-broadcast        — q9 (r14), q21 (r15): a narrow fact
      projection prices at file-size x column-ratio UNDER the broadcast
      threshold, so the static plan broadcasts a build whose row count
      is the TABLE's (15M rows / ~240 MB actual at sf10 for q9).
  trap (b) dim-cut-not-broadcast — q2 (r12), q5 (r13), q11 (r15): a
      join-derived dim cut prices at the bytes-PRODUCT of its children,
      OVER the threshold however narrow the cut, so the plan exchanges
      the entire fact on the join key — a shuffle AQE's late broadcast
      flip cannot un-spend.

These tests reproduce each historical sighting from its UNGUARDED form
(the exact join shape the gate had before its fix) and assert the
landed gate forms stay silent. sf0.001 is a faithful miniature: the
trap is a relation between table bytes and the broadcast threshold, so
shrinking the threshold to testdata scale exercises the same estimator
arithmetic the sf10/sf100 plans hit (q9's sighting: orders raw 400 MB
>= 64 MB threshold, 2-column estimate 40 MB < threshold; here: orders
raw 36 KB >= 24 KB threshold, 2-column estimate ~5 KB < threshold).
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from bun_csv_spark.plans.lint import (
    _broadcast_threshold,
    _children,
    _location_bytes,
    _parse_size,
    _tree_nodes,
    lint_plan,
    plan_text,
)

SF = "/root/testdata/sf0.001"
TRAP_CODES = {"fact-broadcast", "dim-cut-not-broadcast"}


def _trap_codes(df):
    return [f.code for f in lint_plan(df) if f.code in TRAP_CODES]


@contextlib.contextmanager
def _threshold(spark, value):
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


# --- trap (a): the q9 / q21 sightings ---------------------------------


def test_q9_unguarded_fact_broadcast_fires(spark):
    """r14 sighting: orders' 2-column (orderkey, year) projection prices
    under the threshold and the static plan broadcasts the fact."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    ord_y = _t(spark, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    with _threshold(spark, "24k"):
        un = li.join(ord_y, F.col("l_orderkey") == F.col("o_orderkey"))
        assert _trap_codes(un) == ["fact-broadcast"]
        # the landed guard: merge hint on the scaling side
        gd = li.join(
            ord_y.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert _trap_codes(gd) == []


def test_q21_unguarded_fact_broadcast_fires(spark):
    """r15 sighting: the per-order qualifier aggregate joins orders'
    1-column status-filtered projection — unguarded, the fact side is
    statically broadcast (its estimate is file x 1/9 columns)."""
    li = _t(spark, "lineitem")
    qual = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("min_sk"),
            F.max("l_suppkey").alias("max_sk"),
        )
        .filter(F.col("min_sk") != F.col("max_sk"))
    )
    orders_f = (
        _t(spark, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    with _threshold(spark, "24k"):
        un = qual.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        assert _trap_codes(un) == ["fact-broadcast"]
        gd = qual.join(
            orders_f.hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert _trap_codes(gd) == []


def test_fact_broadcast_exempts_bounded_aggregate(spark):
    """A broadcast build with an aggregate below the exchange is
    cardinality-bounded (the q15 argmax shape) — no finding even when
    the subtree scans a big table."""
    li = _t(spark, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("l_extendedprice").alias("rev")
    )
    with _threshold(spark, "1k"):
        # 1 KB threshold: nothing prices under it EXCEPT via explicit
        # hint — force the broadcast to isolate the aggregate exemption
        j = li.join(F.broadcast(per_supp), "l_suppkey")
        assert _trap_codes(j) == []


# --- trap (b): the q2 / q5 / q11 sightings ----------------------------


def test_q11_unguarded_dim_cut_fires(spark):
    """r15 sighting: the supplier x nation keys-only semi build prices
    at the bytes-product over the threshold -> the whole fact is
    exchanged on l_suppkey."""
    li = _t(spark, "lineitem").select("l_partkey", "l_suppkey")
    n7 = (
        _t(spark, "supplier")
        .join(
            _t(spark, "nation").filter(F.col("n_name") == "NATION_7"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    with _threshold(spark, "-1"):
        un = li.join(n7, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        assert _trap_codes(un) == ["dim-cut-not-broadcast"]
    # the landed guard: explicit broadcast on the cut (r15 fix)
    n7b = (
        _t(spark, "supplier")
        .join(
            F.broadcast(
                _t(spark, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    gd = _t(spark, "lineitem").join(
        F.broadcast(n7b), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    assert _trap_codes(gd) == []


def test_q5_unguarded_dim_cut_fires(spark):
    """r13 sighting: the supplier x (nation x region ASIA) keys-only
    build still planned SMJ at sf100 — the 600M-row suppkey exchange."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_suppkey")
    asia = (
        _t(spark, "nation")
        .join(
            _t(spark, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    sup_cut = (
        _t(spark, "supplier")
        .join(asia, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey")
    )
    with _threshold(spark, "-1"):
        un = li.join(sup_cut, F.col("l_suppkey") == F.col("s_suppkey"))
        assert _trap_codes(un) == ["dim-cut-not-broadcast"]


def test_q2_unguarded_dim_cut_fires(spark):
    """r12 sighting: part and supplier cuts carried join-derived into
    the fact join — both shuffle the fact instead of broadcasting."""
    li = _t(spark, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pcut = _t(spark, "part").filter(F.col("p_size") == 15).select("p_partkey")
    sup_n = (
        _t(spark, "supplier")
        .join(
            _t(spark, "nation").select("n_nationkey", "n_regionkey"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_regionkey") == 1)
        .select("s_suppkey")
    )
    with _threshold(spark, "-1"):
        un = li.join(pcut, F.col("l_partkey") == F.col("p_partkey")).join(
            sup_n, F.col("l_suppkey") == F.col("s_suppkey")
        )
        codes = _trap_codes(un)
        assert codes and set(codes) == {"dim-cut-not-broadcast"}


def test_dim_side_itself_big_does_not_fire(spark):
    """A dims-only build whose scans are THEMSELVES over the threshold
    must not be advised into a broadcast — that SMJ is the correct plan
    (the adjudicated q5 customer-side shape at sf100, miniaturized by a
    1 KB threshold: customer's 6.9 KB raw is 'big', so the rule stays
    silent)."""
    o = _t(spark, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, "customer").select("c_custkey", "c_name")
    with _threshold(spark, "1k"):
        j = o.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        assert _trap_codes(j) == []


def test_preserved_outer_side_is_not_advised_into_broadcast(spark):
    """The preserved side of an outer join cannot be the broadcast
    build (Spark: BuildRight for left-family joins only), so a dim on
    the preserved left of a LeftOuter (q13 / join_left's customer) must
    NOT fire — while the same dim in an inner join must."""
    cust = _t(spark, "customer").select("c_custkey", "c_name")
    o = _t(spark, "orders").select("o_orderkey", "o_custkey")
    with _threshold(spark, "-1"):
        left = cust.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        assert _trap_codes(left) == []
        inner = cust.join(o, F.col("c_custkey") == F.col("o_custkey"))
        assert _trap_codes(inner) == ["dim-cut-not-broadcast"]


def test_fact_fact_smj_does_not_fire(spark):
    """The inherent fact-fact orderkey SMJ (q18's shape) is the correct
    plan at scale — rule (b) must stay silent when neither side is a
    dim-only cut."""
    li = _t(spark, "lineitem").select("l_orderkey")
    o = _t(spark, "orders").select("o_orderkey")
    with _threshold(spark, "-1"):
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert _trap_codes(j) == []


def test_trap_rules_see_subquery_trees(spark):
    """A fact broadcast hidden inside a scalar subquery's plan tree
    (the ``===== Subqueries =====`` section) must fire too — and only
    ONCE, even though a reused subquery prints its tree twice."""
    sf = SF
    spark.read.parquet(f"{sf}/lineitem.parquet").createOrReplaceTempView(
        "lint16_li"
    )
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView(
        "lint16_o"
    )
    with _threshold(spark, "24k"):
        q = spark.sql(
            """
            SELECT l_orderkey FROM lint16_li
            WHERE l_extendedprice > (
              SELECT avg(o1.o_totalprice) FROM lint16_o o1
              JOIN (SELECT o_orderkey, year(o_orderdate) AS yr
                    FROM lint16_o) o2
                ON o1.o_orderkey = o2.o_orderkey AND o2.yr > 1992)
            """
        )
        assert _trap_codes(q) == ["fact-broadcast"]


# --- landed gate forms stay silent (the five fixed gates) -------------


@pytest.mark.parametrize(
    "gate", ["tpch_q2", "tpch_q5", "tpch_q9", "tpch_q11", "tpch_q21"]
)
def test_landed_gate_forms_are_silent(spark, gate):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()[gate](spark, SF)
    assert _trap_codes(df) == []


# --- parser / helper units ---------------------------------------------


def test_parse_size_units():
    assert _parse_size("67108864") == 64 * 1024 * 1024
    assert _parse_size("64MB") == 64 * 1024 * 1024
    assert _parse_size("24k") == 24 * 1024
    assert _parse_size("-1") == -1
    assert _parse_size("10485760b") == 10 * 1024 * 1024


def test_broadcast_threshold_falls_back_on_disabled(spark):
    with _threshold(spark, "-1"):
        df = _t(spark, "nation")
        assert _broadcast_threshold(df) == 64 * 1024 * 1024
    with _threshold(spark, "24k"):
        assert _broadcast_threshold(_t(spark, "nation")) == 24 * 1024


def test_tree_parser_subtrees_and_location_bytes(spark):
    """The formatted-plan parser: join children partition cleanly and a
    scan's Location resolves to the real on-disk bytes."""
    import os

    li = _t(spark, "lineitem").select("l_orderkey")
    o = _t(spark, "orders").select("o_orderkey")
    with _threshold(spark, "-1"):
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        p = plan_text(j)
        nodes = _tree_nodes(p)
        smj = [i for i, (_n, nm, _c) in enumerate(nodes)
               if nm.startswith("SortMergeJoin")]
        assert smj, p
        kids = _children(nodes, smj[0])
        assert len(kids) == 2
    block = (
        "(1) Scan parquet\n"
        f"Location: InMemoryFileIndex [file:{SF}/orders.parquet]\n"
    )
    assert _location_bytes(block) == os.path.getsize(f"{SF}/orders.parquet")
    assert _location_bytes("(2) Filter\nCondition : x\n") is None
