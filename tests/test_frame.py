"""TurboFrame operator semantics (reference dataframe.ts:58-343; SURVEY §2.2-2.6)."""

import pytest
from pyspark.sql import functions as F

from bun_csv_spark.operators.frame import TurboFrame, with_row_index


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (2, "b2", 25)],
        "k int, name string, v int",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [(1, "X", 100), (2, "Y", 200), (9, "Z", 900)],
        "k int, name string, w int",
    )


def test_join_inner_fanout(left, right):
    out = TurboFrame(left).join(TurboFrame(right), on="k", how="inner").df
    # duplicate left keys fan out; k=3 unmatched drops
    assert out.count() == 3


def test_join_collision_right_wins(left, right):
    out = TurboFrame(left).join(TurboFrame(right), on="k", how="inner").df
    names = {r.k: r.name for r in out.collect()}
    assert names == {1: "X", 2: "Y"}  # right's `name` overwrites left's


def test_join_left_unmatched_keeps_left_values(left, right):
    out = TurboFrame(left).join(TurboFrame(right), on="k", how="left").df
    rows = {(r.k, r.name): r for r in out.collect()}
    assert rows[(3, "c")].w is None  # unmatched: right-only col null
    # unmatched row keeps ITS OWN name (merge {...left} only)
    assert (3, "c") in rows
    # matched rows take right's name
    assert (1, "X") in rows


def test_join_full(left, right):
    out = TurboFrame(left).join(TurboFrame(right), on="k", how="full").df
    ks = sorted(r.k for r in out.collect())
    assert ks == [1, 2, 2, 3, 9]


def test_join_cross(left, right):
    out = TurboFrame(left).join(TurboFrame(right), how="cross").df
    assert out.count() == 4 * 3
    # right wins collisions in cross mode too
    assert set(r.name for r in out.collect()) == {"X", "Y", "Z"}


def test_join_different_key_names(spark):
    a = spark.createDataFrame([(1, "a")], "ak int, x string")
    b = spark.createDataFrame([(1, "b")], "bk int, y string")
    out = TurboFrame(a).join(TurboFrame(b), on={"left": "ak", "right": "bk"}).df
    row = out.collect()[0]
    assert (row.ak, row.bk, row.x, row.y) == (1, 1, "a", "b")


def test_sort_type_aware_on_strings(spark):
    # numeric strings sort numerically, like the Zig comparator
    df = spark.createDataFrame(
        [("10",), ("9",), ("100",), ("x",)], "v string"
    )
    out = [r.v for r in TurboFrame(df).sort("v").df.collect()]
    # unparseable sorts first (parse-failure -> less-than), then numeric
    assert out == ["x", "9", "10", "100"]


def test_sort_desc(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v int")
    assert [r.v for r in TurboFrame(df).sort("v", descending=True).df.collect()] == [3, 2, 1]


def test_first_last_at_with_row_index(spark):
    df = with_row_index(
        spark.createDataFrame([(i, f"r{i}") for i in range(10)], "i int, s string")
    )
    tf = TurboFrame(df.orderBy("__row_idx"))
    assert tf.first(2)[0].s == "r0"
    assert tf.last(1)[0].s == "r9"
    assert tf.at(4).s == "r4"
    assert tf.at(99) is None


def test_group_aggregate_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0, 0), ("a", 2.0, 1), ("a", None, 2), ("a", 3.0, 3),
            ("b", 10.0, 4),
        ],
        "g string, v double, ord int",
    )
    out = (
        TurboFrame(df)
        .group_by("g")
        .aggregate(
            {
                "n": ("v", "count"),
                "s": ("v", "sum"),
                "m": ("v", "mean"),
                "med": ("v", "median"),
                "sd": ("v", "stddev"),
                "fst": ("v", "first"),
                "lst": ("v", "last"),
                "cat": ("v", "concat"),
            },
            order_col="ord",
        )
        .df
    )
    rows = {r.g: r for r in out.collect()}
    a = rows["a"]
    assert a.n == 4  # count includes the null row (dataframe.ts:301-302)
    assert a.s == 6.0
    assert a.m == 2.0
    assert a.med == 2.0
    assert abs(a.sd - 0.816496580927726) < 1e-12  # POPULATION stddev
    assert a.fst == 1.0 and a.lst == 3.0
    assert a.cat == "1.0, 2.0, 3.0"
    b = rows["b"]
    assert b.sd == 0.0  # single value -> 0, not null


def test_aggregate_empty_group_edges(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double").filter("v > 99")
    out = TurboFrame(df).aggregate_all(
        {"n": ("v", "count"), "s": ("v", "sum"), "m": ("v", "mean"),
         "mn": ("v", "min"), "mx": ("v", "max")}
    ).df.collect()[0]
    # empty: sum/mean -> 0 (reference); count -> 0; min/max -> NULL — the
    # documented divergence from the reference's ±Infinity JS quirk
    # (dataframe.ts:307-311, SURVEY §7.3.5)
    assert (out.n, out.s, out.m) == (0, 0.0, 0.0)
    assert out.mn is None and out.mx is None


def test_filter_string_expression(spark):
    df = spark.createDataFrame([(25, "NYC"), (15, "LA")], "age int, city string")
    out = TurboFrame(df).filter("age > 21 && city == NYC").df
    assert out.count() == 1


def test_map_withcolumns(spark):
    df = spark.createDataFrame([(2,)], "x int")
    out = TurboFrame(df).map({"y": F.col("x") * 10}).df.collect()[0]
    assert out.y == 20
