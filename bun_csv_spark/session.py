"""SparkSession factory and testdata loading.

Local-mode defaults follow the driver environment (local[$SPARK_GRAFT_CPUS],
single JVM). For cluster scale the same settings hold except memory knobs:
AQE stays on so skewed joins and undersized shuffles re-plan at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "bun_csv_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this host.

    shuffle partitions default to the core count — the 200 default
    over-parallelizes local mode and under-parallelizes a real cluster;
    AQE coalescing corrects the remainder at runtime.
    """
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # honor sortBy() metadata on bucketed reads (one file per
        # bucket): elides both SMJ sorts on bucket-co-located joins
        # (r18 bucketed_join_agg). Off by default since Spark 3.0 only
        # because single-file detection costs a listing at plan time.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # local mode defaults to maxFailures=1: any transient task flake
        # (a JDK NativeThreadSet race in a spill read killed an sf100 run
        # under GCLocker churn — SCALE.md r12) aborts the whole job.
        # Cluster Spark defaults to 4 for exactly this reason; a
        # deterministic bug still fails after 4 attempts.
        .config("spark.task.maxFailures", "4")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata parquet table under ``sf_dir``.

    Returns name -> DataFrame and registers each as a temp view so both the
    DataFrame API and ``spark.sql`` paths can address them.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
