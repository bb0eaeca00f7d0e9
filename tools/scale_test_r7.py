"""Measured scale datapoints for the round-7 operators (span dedup,
char-bigram LM scoring, deterministic HLL, covariance/PCA, transitions)
on synthetic data well past the testdata size.

    python tools/scale_test_r7.py

Prints a small table; the numbers land in SCALE.md. Companion to
tools/scale_test_r6.py / scale_test_neardup.py.
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


def synth_docs(spark, n_docs):
    """Synthetic corpus: every 10th doc carries a shared 30-token
    boilerplate block inside otherwise-unique filler (deterministic,
    no RNG)."""
    boiler = " ".join(f"license-term-{i}" for i in range(30))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.concat(
                F.format_string("unique prefix %d alpha beta gamma ", F.col("id")),
                F.lit(boiler),
                F.format_string(" unique suffix %d delta epsilon", F.col("id")),
            ),
        )
        .otherwise(
            F.format_string(
                "totally distinct document %d with its own words "
                + " ".join(f"w%d-{j}" for j in range(40)),
                *([F.col("id")] * 41),
            )
        )
        .alias("text"),
    )


def hll_datapoint(spark):
    from bun_csv_spark.functions.sketches import hll_distinct

    df = spark.range(20_000_000).select(
        (F.col("id") % 64).alias("grp"), (F.col("id") % 1_000_003).alias("v")
    )
    timed("hll_distinct 20M rows / 64 groups / p=12", hll_distinct(df, ["grp"], "v", p=12))


def span_datapoint(spark):
    from bun_csv_spark.operators.dedup import duplicate_spans

    docs = synth_docs(spark, 200_000)
    timed("duplicate_spans 200k docs (~50 tok each, 10% share a block)",
          duplicate_spans(docs, n=8, min_docs=2))


def lm_datapoint(spark):
    from bun_csv_spark.functions.text import char_bigram_lm_score

    docs = synth_docs(spark, 200_000)
    timed("char_bigram_lm_score 200k docs (~60M bigrams)",
          char_bigram_lm_score(docs))


def cov_datapoint(spark):
    from bun_csv_spark.operators.clustering import embedding_covariance

    vecs = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.pmod(F.col("id") * i * 2654435761, F.lit(1000)) / 500.0 - 1.0),
        ).alias("embedding"),
    )
    timed("embedding_covariance 200k x 64-dim (819M partial products)",
          embedding_covariance(vecs, "embedding", 64))


def transition_datapoint(spark):
    from bun_csv_spark.operators.timeseries import transition_counts

    ev = spark.range(20_000_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).alias("user_id"),
        (F.col("id") * 997).alias("ts"),
        F.concat(F.lit("state_"), (F.col("id") % 20).cast("string")).alias(
            "event_type"
        ),
    )
    timed("transition_counts 20M events / 100k users / 20 states",
          transition_counts(ev))


def cm_datapoint(spark):
    from bun_csv_spark.functions.sketches import cm_estimate, cm_sketch

    # zipf-ish: value v appears ~20M/v times for small v — real skew
    df = spark.range(20_000_000).select(
        (F.pmod(F.col("id") * F.col("id"), F.lit(100_003))).alias("v")
    )
    sk = cm_sketch(df, "v", depth=4, width=4096)
    timed("cm_sketch 20M rows / ~100k distinct / 4x4096", sk)
    cands = spark.range(1000).select(F.col("id").alias("v"))
    timed("cm_estimate 1000 candidates vs broadcast sketch",
          cm_estimate(sk, cands, "v", depth=4, width=4096))


def cluster_split_datapoint(spark):
    from bun_csv_spark.operators.corpus import leakage_safe_split

    docs = spark.range(5_000_000).select(F.col("id").alias("doc_id"))
    # 500k edges: chains of 4 within each 40-id block — CC work is
    # proportional to EDGES, not the 5M-doc corpus
    pairs = spark.range(500_000).select(
        (F.col("id") * 10).alias("id_a"), (F.col("id") * 10 + 2).alias("id_b")
    ).unionAll(spark.range(500_000).select(
        (F.col("id") * 10 + 2).alias("id_a"), (F.col("id") * 10 + 5).alias("id_b")
    ))
    timed("leakage_safe_split 5M docs / 1M near-dup edges",
          leakage_safe_split(docs, pairs, "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1}))


def dhash_datapoint(spark):
    from bun_csv_spark.multimodal.binary import attach_bmp_payload, extract_dhash

    docs = spark.range(200_000).select(F.col("id").alias("doc_id"))
    timed("extract_dhash 200k real BMP decodes (attach+decode+hash)",
          extract_dhash(attach_bmp_payload(docs, texture=True)))


def audio_fp_datapoint(spark):
    from bun_csv_spark.multimodal.binary import (
        attach_pcm_wav_payload,
        extract_audio_fingerprint,
    )

    docs = spark.range(200_000).select(F.col("id").alias("doc_id"))
    timed("extract_audio_fingerprint 200k real WAV decodes",
          extract_audio_fingerprint(attach_pcm_wav_payload(docs, texture=True)))


def main():
    spark = get_spark("scale_r7", cpus=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    hll_datapoint(spark)
    span_datapoint(spark)
    lm_datapoint(spark)
    cov_datapoint(spark)
    transition_datapoint(spark)
    cm_datapoint(spark)
    cluster_split_datapoint(spark)
    dhash_datapoint(spark)
    audio_fp_datapoint(spark)


if __name__ == "__main__":
    main()
