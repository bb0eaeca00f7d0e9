"""Grouped-aggregate semantics matching the reference DataFrame layer.

The reference implements single-pass hash aggregation with these exact
semantics (reference: src/ts/dataframe.ts:268-343; see SURVEY.md §2.4):

| fn      | reference behavior                              | here            |
|---------|--------------------------------------------------|-----------------|
| count   | all rows in group, nulls included                | count(lit(1))   |
| sum     | numeric values only; empty -> 0                  | coalesce(sum,0) |
| min/max | Math.min/max; empty set -> +/-Infinity (JS quirk)| min/max -> NULL |
| mean    | numeric mean; empty -> 0                         | coalesce(avg,0) |
| median  | exact midpoint, avg of two middles               | median()        |
| stddev  | POPULATION std dev (÷ n)                         | stddev_pop      |
| first   | first value in file order                        | min_by(ord)     |
| last    | last value in file order                         | max_by(ord)     |
| concat  | values.join(", ") in file order                  | ordered join    |

Intentional divergence: empty-set min/max return NULL, not ±Infinity
(dataframe.ts:307-311) — the JS quirk is an accident of Math.min() and is
not representable in most output formats; documented in tests.

Ordering note (SURVEY §7.3.4): Spark groups are unordered, so "first/last/
concat in encounter order" need an explicit order column. Callers pass
``order_col`` — typically the reader's row-index column or a natural key.
All orderings use min_by/max_by and array_sort over (ord, value) structs;
these are partial-aggregatable builtins, so map-side combine still applies
(no collect_list shuffle of whole groups for first/last).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _count(col: Column, order_col: Column | None) -> Column:
    return F.count(F.lit(1))


def _sum(col: Column, order_col: Column | None) -> Column:
    return F.coalesce(F.sum(col.try_cast("double")), F.lit(0.0))


def _min(col: Column, order_col: Column | None) -> Column:
    return F.min(col.try_cast("double"))


def _max(col: Column, order_col: Column | None) -> Column:
    return F.max(col.try_cast("double"))


def _mean(col: Column, order_col: Column | None) -> Column:
    return F.coalesce(F.avg(col.try_cast("double")), F.lit(0.0))


def _median(col: Column, order_col: Column | None) -> Column:
    return F.coalesce(F.median(col.try_cast("double")), F.lit(0.0))


def _stddev(col: Column, order_col: Column | None) -> Column:
    return F.coalesce(F.stddev_pop(col.try_cast("double")), F.lit(0.0))


def _require_order(order_col: Column | None, fn: str) -> Column:
    if order_col is None:
        raise ValueError(
            f"aggregate {fn!r} needs an order column for deterministic "
            "encounter-order semantics (Spark groups are unordered)"
        )
    return order_col


def _first(col: Column, order_col: Column | None) -> Column:
    return F.min_by(col, _require_order(order_col, "first"))


def _last(col: Column, order_col: Column | None) -> Column:
    return F.max_by(col, _require_order(order_col, "last"))


def _concat(col: Column, order_col: Column | None) -> Column:
    ord_col = _require_order(order_col, "concat")
    pairs = F.array_sort(F.collect_list(F.struct(ord_col.alias("o"), col.cast("string").alias("v"))))
    return F.array_join(F.transform(pairs, lambda p: p["v"]), ", ")


AGG_FNS = {
    "count": _count,
    "sum": _sum,
    "min": _min,
    "max": _max,
    "mean": _mean,
    "avg": _mean,
    "median": _median,
    "stddev": _stddev,
    "first": _first,
    "last": _last,
    "concat": _concat,
}


def agg_column(fn: str, col: str | Column, order_col: str | Column | None = None) -> Column:
    """Build the aggregate Column for a reference agg-fn name."""
    if fn not in AGG_FNS:
        raise ValueError(f"unknown aggregate fn {fn!r}; known: {sorted(AGG_FNS)}")
    c = F.col(col) if isinstance(col, str) else col
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    return AGG_FNS[fn](c, o)
