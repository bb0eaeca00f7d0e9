"""Deterministic, engine-portable cardinality sketches.

Spark's ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` (HLL) use different hash functions and register
layouts, so their estimates can never be compared value-for-value. The KMV
(k-minimum-values) sketch here is built from md5 — both engines compute
the identical hash, so the estimate itself is bit-reproducible and
oracle-checkable, while keeping the sketch property that matters at
100 TB: per-group state is k values, not the distinct set.

KMV estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002): hash values to uniform [0, 1); with U_(k) the k-th
smallest distinct hash, E[distinct] ~= (k-1) / U_(k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash domain: 15 hex chars -> exact integers in [0, 2^60)
KMV_DOMAIN = float(1 << 60)


def md5_uniform_long(col: Column | str, salt: str) -> Column:
    """Exact integer hash in [0, 2^60) — md5-derived, engine-portable.

    Kept as a LONG (not double) so DISTINCT and ordering are exact; divide
    by ``KMV_DOMAIN`` only at estimate time."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group distinct-count estimate via the KMV sketch.

    Plan: distinct (group, hash) pairs — the map-side combine collapses
    duplicates before the shuffle — then one ranked window bounded at k
    rows per group. Groups with fewer than k distinct values report the
    EXACT count (the sketch holds the whole distinct set below k). At
    100 TB the per-group state after ranking is k longs regardless of
    group size; no distinct set is ever materialized per group.

    Returns (key_cols..., est_distinct double rounded to 4dp).
    """
    u = md5_uniform_long(value_col, salt)
    d = df.select(*key_cols, u.alias("__u")).distinct()
    w = Window.partitionBy(*key_cols).orderBy("__u")
    ranked = d.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    per = ranked.groupBy(*key_cols).agg(
        F.max("__u").alias("__uk"), F.count(F.lit(1)).alias("__n")
    )
    est = (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_DOMAIN) / F.col("__uk"))
    )
    return per.select(*key_cols, F.round(est, 4).alias("est_distinct"))
