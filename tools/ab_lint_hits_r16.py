"""A/B the four sf10 lint-trap hits the r16 rules found in our OWN
gates (the linter doing its job on the registry: lint at a scale where
broadcast decisions diverge — sf0.001 prices everything under the
threshold, sf10 does not).

Hits (sf10 plan reads in SCALE.md r16):
  tpch_q21       dim-cut: sup_cut (supplier x nation keys) priced over
                 by the bytes-product -> SMJ -> the fact-derived
                 qualifier set exchanged on late_sk (the q11 shape).
                 Variant: F.broadcast(sup_cut).
  tpch_q2        dim-cut x2: the rs keys cut and the rs attach both
                 join-derived -> SMJ -> the part-cut fact exchanged on
                 l_suppkey. Variant: F.broadcast on both rs sides.
  tpch_q22       fact-broadcast: the date-cut orders keys projection
                 (24.5% slice, 3.7M keys at sf10) statically broadcast
                 (estimate 40 MB < 64 MB; the q9 window — at sf100 the
                 estimate prices over and flips to SMJ on its own).
                 Variant: .hint('merge') on the anti build.
  semi_anti_join fact-broadcast x2: the urgent-orders keys projection
                 (~20%, 3M keys at sf10) broadcast twice. Variant:
                 .hint('merge') on both builds.

Protocol: same process, alternating variants, warmup + best-of-N
(the r14 q9 A/B protocol), noop-forced. Prints per-gate best walls +
row-count equality between variants.

Usage: python tools/ab_lint_hits_r16.py [sf_dir=.scale/sf10] [rounds=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


# --- hinted variants (the landed shapes + the lint-suggested guards) ---


def q21_bcast_supcut(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_returnflag") == "R").cast("int").alias("is_late"),
    )
    late_sk_expr = F.when(F.col("is_late") == 1, F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("min_sk"),
        F.max("l_suppkey").alias("max_sk"),
        F.min(late_sk_expr).alias("min_late_sk"),
        F.max(late_sk_expr).alias("max_late_sk"),
        F.sum("is_late").alias("waits"),
    )
    qual = per_order.filter(
        (F.col("min_sk") != F.col("max_sk"))
        & (F.col("min_late_sk") == F.col("max_late_sk"))
    ).select("l_orderkey", F.col("max_late_sk").alias("late_sk"), "waits")
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    sup_cut = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        qual.join(orders_f.hint("merge"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup_cut), F.col("late_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("waits").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q2_bcast_rs(spark, sf_dir):
    from pyspark.sql import Window

    rs = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part_cut = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    cut = (
        li.join(part_cut.select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rs.select(F.col("s_suppkey").alias("rk"))),
              F.col("l_suppkey") == F.col("rk"))
        .withColumn("__unit", unit)
    )
    pmin = F.min("__unit").over(Window.partitionBy("l_partkey"))
    winners = (
        cut.withColumn("__pmin", pmin)
        .filter(F.col("__unit") == F.col("__pmin"))
        .select("l_partkey", "l_suppkey", "__unit")
    )
    return (
        winners.join(part_cut, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rs), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round(F.col("__unit"), 4).alias("unit_price"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q22_merge_recent(spark, sf_dir):
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    sel = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal",
                F.substring("c_name", 17, 2).alias("cntrycode"))
        .filter(F.col("cntrycode").isin(*codes))
    )
    avg_bal = sel.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate")
                >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        sel.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(recent.hint("merge"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def semi_anti_merge(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = cust.join(
        urgent.hint("merge"), cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("has_urgent").alias("tag"))
    anti = cust.join(
        urgent.hint("merge"), cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("no_urgent").alias("tag"))
    return semi.unionAll(anti)


def main() -> None:
    import __spark_entry__ as entry_mod
    from bun_csv_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_lint_hits", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    gates = entry_mod.queries()
    cases = {
        "tpch_q21": (gates["tpch_q21"], q21_bcast_supcut),
        "tpch_q2": (gates["tpch_q2"], q2_bcast_rs),
        "tpch_q22": (gates["tpch_q22"], q22_merge_recent),
        "semi_anti_join": (gates["semi_anti_join"], semi_anti_merge),
    }

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name, (landed, hinted) in cases.items():
        n_a = landed(spark, sf_dir).count()
        n_b = hinted(spark, sf_dir).count()
        assert n_a == n_b, f"{name}: rows {n_a} != {n_b}"
        force(landed(spark, sf_dir))   # warmup both plans
        force(hinted(spark, sf_dir))
        best = {"landed": float("inf"), "hinted": float("inf")}
        for _ in range(rounds):
            for tag, fn in (("landed", landed), ("hinted", hinted)):
                t0 = time.time()
                force(fn(spark, sf_dir))
                best[tag] = min(best[tag], time.time() - t0)
        print(
            f"{name}: landed {best['landed']:.2f}s  "
            f"hinted {best['hinted']:.2f}s  "
            f"({best['landed'] / best['hinted']:.2f}x)  rows={n_a}",
            flush=True,
        )


if __name__ == "__main__":
    main()
