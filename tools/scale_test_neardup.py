"""Above-gate-scale validation of the near-dup pipeline cap constants.

The oracle gates run the dedup operators over a 1,000-doc corpus; the
100 TB arguments are plan-shape arguments. This script supplies the
measured datapoint between the two (round-3 verdict ask): the FULL
dedup_apply composition — minhash -> LSH banding (max_bucket cap) ->
candidate pairs -> exact n-gram Jaccard verification -> connected
components -> anti-join — over the sf0.1 lineitem comment corpus
(600k documents, 600x gate scale), recording wall time, row counts, and
per-stage shuffle sizes from the UI REST API. Results belong in SCALE.md.

    python tools/scale_test_neardup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

UI_PORT = 4052


def get_session(cpus: int = 32) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_test_neardup")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def shuffle_stats() -> dict:
    """Total + max per-stage shuffle write bytes from the local UI."""
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10))
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    reads = [s.get("shuffleReadBytes", 0) for s in stages]
    return {
        "stages": len(stages),
        "shuffle_write_total_mb": round(sum(writes) / 1e6, 1),
        "shuffle_write_max_stage_mb": round(max(writes, default=0) / 1e6, 1),
        "shuffle_read_total_mb": round(sum(reads) / 1e6, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    from bun_csv_spark.operators.dedup import (
        connected_components,
        neardup_pairs_minhash,
        ngram_jaccard_pairs,
    )
    # 200x the gate corpus: every real document replicated K times with a
    # per-copy suffix — each family of K copies is a genuine near-dup
    # cluster (suffix shifts a handful of shingles), so candidate
    # generation, verification, and clustering all do real work. K=40
    # stays under the max_bucket=64 cap ON PURPOSE: the run validates the
    # cap constants at a bucket population near their design point.
    K = int(os.environ.get("SCALE_TEST_COPIES", "40"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = (
        docs.select("doc_id", "text")
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(K - 1))))
        .select(
            (F.col("doc_id") * 100 + F.col("k")).alias("doc_id"),
            F.when(F.col("k") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" rev "), F.col("k")))
            .alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_docs = corpus.count()

    t0 = time.time()
    pairs = neardup_pairs_minhash(
        corpus, "doc_id", "text", n_hashes=8, bands=4, shingle_k=5,
        repartition=spark.sparkContext.defaultParallelism,
    )
    n_candidates = pairs.count()
    t_pairs = time.time() - t0

    verified = ngram_jaccard_pairs(corpus, pairs, "doc_id", "text", n=3).filter(
        F.round("jaccard", 6) >= 0.5
    )
    labels = connected_components(verified)
    drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    kept = corpus.join(drop, "doc_id", "left_anti").count()
    t_total = time.time() - t0

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "candidate_pairs": n_candidates,
        "kept_after_dedup": kept,
        "pairs_sec": round(t_pairs, 1),
        "end_to_end_sec": round(t_total, 1),
        **shuffle_stats(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
