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


def exact_median_distributed(df, col: str, buckets: int = 4096) -> float:
    """EXACT ungrouped median by distributed histogram selection — the
    100 TB replacement for a single-group ``F.median`` (r19, guide §5).

    ``F.median`` (= exact ``percentile(col, 0.5)``) is a
    TypedImperativeAggregate whose buffer holds a value->count map of
    EVERY distinct value: ungrouped, the final merge buffers the whole
    column's distinct set on one reducer — an OOM at 100 TB of
    high-cardinality doubles. This routine reproduces the reference
    semantics (exact midpoint, average of the two middles; empty -> 0.0,
    matching the ``coalesce(median, 0)`` rule above) with bounded state
    everywhere:

    1. one stats pass: count / NaN / +-inf tallies, finite min/max —
       all partial-aggregatable, O(1) state per task;
    2. histogram passes: bucket the candidate range into ``buckets``
       equal-width cells, collect the <=``buckets``-row (count, min,
       max) table, and descend into the cell(s) holding the target
       order statistics. Per-cell min/max make the common case exact in
       ONE pass (a cell whose min == max IS its value; two adjacent
       ranks in different cells read cell-i.max / cell-j.min directly).
       Each pass shrinks the range by ~``buckets``x, so the loop is
       bounded by log_buckets(range/ulp) <= ~6 passes for IEEE doubles;
       a no-shrink range (values a few ULPs apart) falls back to a
       distinct-value groupBy of the remaining sliver.

    The driver holds histograms only (``buckets`` rows per pass); no
    task buffers more than its partial histogram. Ranks follow Spark's
    ordering (NaN greatest, after +inf); the even-count midpoint uses
    ``lo + (hi - lo) * 0.5`` — bit-identical to Percentile's
    interpolation formula at p=0.5. Law-tested against ``F.median``
    across parities/duplicates/negatives/empty in
    tests/test_round19_ops.py."""
    import math

    v = F.col(col).try_cast("double")
    vals = df.select(v.alias("__v")).filter(F.col("__v").isNotNull())
    st = vals.agg(
        F.count("__v").alias("n"),
        F.sum(F.isnan("__v").cast("long")).alias("n_nan"),
        F.sum((F.col("__v") == float("-inf")).cast("long")).alias("n_ninf"),
        F.sum((F.col("__v") == float("inf")).cast("long")).alias("n_pinf"),
        F.min(F.when(~F.isnan("__v") & (F.abs("__v") != float("inf")), F.col("__v"))).alias("lo"),
        F.max(F.when(~F.isnan("__v") & (F.abs("__v") != float("inf")), F.col("__v"))).alias("hi"),
    ).first()
    n = st["n"]
    if n == 0:
        return 0.0  # reference: empty -> 0 (coalesce rule)
    k1, k2 = (n - 1) // 2, n // 2  # 0-based target ranks (k2 = k1 or k1+1)
    # adjacent ranks walk (nearly) the same cells: share histogram jobs
    hist_cache: dict = {}

    def order_stat(k: int) -> float:
        """The k-th smallest (0-based) under Spark ordering:
        -inf block | finite values | +inf block | NaN block."""
        n_nan, n_ninf, n_pinf = st["n_nan"], st["n_ninf"], st["n_pinf"]
        if k >= n - n_nan:
            return float("nan")
        if k >= n - n_nan - n_pinf:
            return float("inf")
        if k < n_ninf:
            return float("-inf")
        k -= n_ninf  # rank within the finite block
        a, b = st["lo"], st["hi"]
        fin = vals.filter(~F.isnan("__v") & (F.abs("__v") != float("inf")))
        # each pass shrinks [a, b] ~buckets-fold; IEEE doubles span < 2^64
        # ULPs, so log_4096 bounds the loop — 8 is headroom, then sliver
        for _ in range(8):
            if a == b:
                return a
            # width via per-term division: (b - a) itself can overflow
            # to inf when a and b straddle +-1.7e308
            width = b / buckets - a / buckets
            if width <= 0 or not math.isfinite(width):
                break  # sub-ULP (or degenerate) range: fall to sliver
            # monotone cell index, overflow-safe: v/width - a/width stays
            # O(buckets) in magnitude where (v - a)/width could overflow
            if (a, b) in hist_cache:
                hist = hist_cache[(a, b)]
            else:
                cell = F.least(
                    F.floor(F.col("__v") / width - a / width).cast("int"),
                    F.lit(buckets - 1),
                )
                hist = sorted(
                    fin.filter((F.col("__v") >= a) & (F.col("__v") <= b))
                    .groupBy(cell.alias("c"))
                    .agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.min("__v").alias("mn"),
                        F.max("__v").alias("mx"),
                    )
                    .collect(),
                    key=lambda r: r["c"],
                )
                hist_cache[(a, b)] = hist
            acc, target = 0, None
            for r in hist:
                if k < acc + r["cnt"]:
                    target = r
                    break
                acc += r["cnt"]
            if target is None:  # pragma: no cover — counts cover rank k
                raise AssertionError("histogram lost the target rank")
            if target["mn"] == target["mx"]:
                return target["mn"]
            if (target["mn"], target["mx"]) == (a, b):
                break  # values a few ULPs apart: cannot shrink further
            a, b, k = target["mn"], target["mx"], k - acc
        # sliver fallback: distinct values of the remaining range (a few
        # ULPs wide by now, so the distinct set is tiny)
        rows = sorted(
            fin.filter((F.col("__v") >= a) & (F.col("__v") <= b))
            .groupBy("__v")
            .count()
            .collect(),
            key=lambda r: r["__v"],
        )
        acc = 0
        for r in rows:
            if k < acc + r["count"]:
                return r["__v"]
            acc += r["count"]
        raise AssertionError("rank outside collected sliver")

    lo = order_stat(k1)
    if k1 == k2:
        return lo
    hi = order_stat(k2)
    if lo == hi:
        return lo
    # Percentile's interpolation at p exactly between two ranks
    return lo + (hi - lo) * 0.5
