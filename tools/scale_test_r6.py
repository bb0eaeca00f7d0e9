"""Measured scale datapoints for the round-6 operators (bloom semi-join,
bucketed kNN join) on synthetic data well past the testdata size.

    python tools/scale_test_r6.py

Prints a small table; the numbers land in SCALE.md. Companion to
tools/scale_test_neardup.py (round-1's dedup datapoint).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bun_csv_spark.session import get_spark  # noqa: E402


def timed(label, df):
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"{label}: {n} rows in {dt:.2f}s")
    return n, dt


def bloom_datapoint(spark):
    """20M-row probe vs 20k-key build, bitmap sized m=16n (512 Kbit).
    Honest comparison: the regime bloom exists for is a build side too
    big to broadcast — simulate it by disabling auto-broadcast so the
    exact semi-join must shuffle both sides; also report the
    broadcast-allowed exact join (which beats bloom and should be used
    whenever the keys DO fit a broadcast)."""
    from bun_csv_spark.operators.maintenance import bloom_semi_join

    probe = spark.range(0, 20_000_000).select(F.col("id").alias("k"))
    build = spark.range(0, 20_000_000, 1000).select(F.col("id").alias("k"))
    n_bloom, t_bloom = timed(
        "bloom_semi_join md5 20M probe / 20k build (m=512Kbit)",
        bloom_semi_join(probe, build, "k", m_bits=1 << 19),
    )
    timed(
        "bloom_semi_join xxhash64 (production hash, same shape)",
        bloom_semi_join(probe, build, "k", m_bits=1 << 19, hash_fn="xxhash64"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n_exact, t_shuffle = timed(
            "exact semi-join, broadcast DISABLED (big-build regime)",
            probe.join(build, "k", "left_semi"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    _, t_bcast = timed(
        "exact semi-join, broadcast allowed (small-build regime)",
        probe.join(build, "k", "left_semi"),
    )
    fp = n_bloom - n_exact
    print(f"  false positives: {fp} ({fp / 20_000_000:.2e} of probe)")
    return t_bloom, t_shuffle, t_bcast


def knn_datapoint(spark):
    """200k x 32-dim corpus, 64 queries: brute broadcast cross vs the
    LSH-bucketed multi-probe equi-join, plus candidate recall overlap."""
    from bun_csv_spark.operators.similarity import knn_join_brute, knn_join_bucketed

    dim = 32
    vec = F.array(
        *[F.sin(F.col("id") * (i + 1) * 0.7).alias(f"c{i}") for i in range(dim)]
    ).cast("array<float>")
    corpus = spark.range(0, 200_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    queries = corpus.filter(F.col("vec_id") % 3125 == 0)  # 64 queries
    corpus.cache().count()

    _, t_brute = timed(
        "knn_join_brute 200k x 64", knn_join_brute(corpus, queries, k=5)
    )
    _, t_bucket = timed(
        "knn_join_bucketed 200k x 64",
        knn_join_bucketed(corpus, queries, k=5, dim=dim, n_planes=8),
    )
    brute = {
        (r.query_id, r.neighbor_id)
        for r in knn_join_brute(corpus, queries, k=5).collect()
    }
    bucket = {
        (r.query_id, r.neighbor_id)
        for r in knn_join_bucketed(corpus, queries, k=5, dim=dim, n_planes=8).collect()
    }
    print(f"  recall vs brute: {len(brute & bucket) / len(brute):.2f}")
    corpus.unpersist()
    return t_brute, t_bucket


def main():
    spark = get_spark("scale_r6", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    bloom_datapoint(spark)
    knn_datapoint(spark)


if __name__ == "__main__":
    main()
