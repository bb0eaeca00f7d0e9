"""Column statistics — the reference `stats` CLI command on Spark.

Per-column: count, nullCount, exact uniqueCount, min/max/mean for numeric
columns, lexicographic min/max for strings, plus the reference's type
inference (reference: src/cli/commands/stats.ts:17-113):

- all non-null values numeric        -> "number"
- <=10 uniques and >100 rows         -> "categorical"
- else                               -> "string"

One job computes every column's stats in a single pass (one wide agg), so
the scan cost is paid once regardless of column count. uniqueCount is exact
(countDistinct) per the oracle requirement; at 100 TB swap in
approx_count_distinct via ``approximate=True``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bun_csv_spark.functions.coercion import NUMBER_RE


def column_stats(
    df: DataFrame, columns: list[str] | None = None, approximate: bool = False
) -> DataFrame:
    """One row per column: (column, count, null_count, unique_count,
    min_num, max_num, mean_num, min_str, max_str, inferred_type)."""
    cols = columns or df.columns
    total = F.count(F.lit(1))
    aggs: list = [total.alias("__total")]
    for c in cols:
        col = F.col(c)
        s = col.cast("string")
        is_num_type = isinstance(df.schema[c].dataType, _NUM_TYPES)
        numeric = col.cast("double") if is_num_type else F.when(s.rlike(NUMBER_RE), s.cast("double"))
        distinct = (
            F.approx_count_distinct(col) if approximate else F.countDistinct(col)
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct.alias(f"__uniq_{c}"),
            F.min(numeric).alias(f"__minn_{c}"),
            F.max(numeric).alias(f"__maxn_{c}"),
            F.avg(numeric).alias(f"__mean_{c}"),
            F.min(s).alias(f"__mins_{c}"),
            F.max(s).alias(f"__maxs_{c}"),
            F.sum(
                F.when(col.isNotNull() & ~F.coalesce(s.rlike(NUMBER_RE), F.lit(False)), 1).otherwise(0)
            ).alias(f"__nonnum_{c}"),
        ]
    row = df.agg(*aggs).first()

    total_n = row["__total"]
    out_rows = []
    for c in cols:
        nulls = row[f"__nulls_{c}"]
        uniq = row[f"__uniq_{c}"]
        non_num = row[f"__nonnum_{c}"]
        non_null = total_n - nulls
        if non_null > 0 and non_num == 0:
            inferred = "number"
        elif uniq <= 10 and total_n > 100:
            inferred = "categorical"
        else:
            inferred = "string"
        out_rows.append(
            (
                c,
                total_n,
                nulls,
                uniq,
                row[f"__minn_{c}"],
                row[f"__maxn_{c}"],
                row[f"__mean_{c}"],
                row[f"__mins_{c}"],
                row[f"__maxs_{c}"],
                inferred,
            )
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("null_count", T.LongType()),
            T.StructField("unique_count", T.LongType()),
            T.StructField("min_num", T.DoubleType()),
            T.StructField("max_num", T.DoubleType()),
            T.StructField("mean_num", T.DoubleType()),
            T.StructField("min_str", T.StringType()),
            T.StructField("max_str", T.StringType()),
            T.StructField("inferred_type", T.StringType()),
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


_NUM_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def validate_rules(
    df: DataFrame,
    rules: "dict[str, object]",
) -> DataFrame:
    """Data-quality gate: evaluate named boolean rules over a table and
    report per-rule pass/violation counts — the publish-blocking
    expectations check (completeness, ranges, referential sanity) a
    production pipeline runs before a table goes live.

    ``rules`` maps rule name -> Column predicate (NULL counts as a
    violation, matching expectation-framework semantics — an unknown is
    not a pass). ALL rules evaluate in ONE wide aggregate over a single
    scan: the per-rule counters are conditional sums, so the cost is one
    pass regardless of rule count, map-side combined, no shuffle beyond
    the 1-row reduce. Returns (rule, n_rows, n_violations,
    violation_rate rounded 6dp) — one row per rule via a stack of the
    wide aggregate, still bounded by the rule count.

    Rule names are interpolated into a ``stack`` selectExpr, so they are
    restricted to safe identifiers ([A-Za-z0-9_.-]) and the dict must be
    non-empty — both rejected up front with a clear error rather than a
    malformed-SQL failure downstream."""
    if not rules:
        raise ValueError("validate_rules: rules dict must be non-empty")
    for name in rules:
        if not re.fullmatch(r"[A-Za-z0-9_.\-]+", name):
            raise ValueError(
                f"validate_rules: rule name {name!r} is not a safe identifier "
                "(allowed: letters, digits, underscore, dot, dash)"
            )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', `__v_{name}`" for name in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {pairs}) as (rule, n_violations)", "__n as n_rows"
    ).select(
        "rule",
        F.col("n_rows").cast("long"),
        F.col("n_violations").cast("long"),
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
    )
