"""Small plan-shaping utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling (training-data mixture control: downsample
    overrepresented sources/languages, keep rare ones whole).

    ``sampleBy`` is a filter pushed into the scan — no shuffle, no
    collect; deterministic for a fixed seed and input partitioning."""
    return df.sampleBy(strata_col, fractions, seed)


def ensure_parallelism(df: DataFrame, small_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition ONLY when the scan is too small to split (one small
    parquet file = one row group = one task locally), so CPU-bound stages
    that follow still use the whole cluster.

    Decided from file metadata alone (``inputFiles`` + ``getsize`` — no
    job, no RDD conversion). Inputs above ``small_bytes`` already split at
    ``maxPartitionBytes``, so at real scale this is a no-op and costs no
    shuffle."""
    try:
        files = df.inputFiles()
        total = sum(
            os.path.getsize(f.removeprefix("file:")) for f in files if f.startswith("file:")
        )
    except Exception:  # noqa: BLE001 — non-file sources: leave the plan alone
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if files and total < small_bytes and parallelism > 4:
        return df.repartition(parallelism)
    return df
