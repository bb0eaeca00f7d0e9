"""A/B: incremental_dedup_update with vs without the Bloom store-side
pre-prune, at the 100x-docs scale point (500k docs, tools/scale_docs.py
corpus).

Setup: the corpus is replayed as three pseudo-days (doc_id % 3); days 0
and 1 are folded once to build the store (~2/3 of the corpus' unique
fingerprints), then the DAY-2 fold is timed bloom-off vs bloom-on
(best-of-3 after a warmup, fresh store copy per variant so the fold is
identical work). Besides wall time, the tool reports the number the
scale argument actually rests on: how many STORE rows survive the bloom
prune and reach the exact anti-join — at 100 TB that ratio is the
difference between shuffling a multi-year digest store and broadcasting
a few thousand candidate rows.

Usage: python tools/ab_bloom_increment.py [mult]   # default 100
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from bun_csv_spark.operators.dedup import (
        incremental_dedup_update,
        load_fingerprint_store,
    )
    from bun_csv_spark.operators.maintenance import bloom_semi_join
    from bun_csv_spark.session import get_spark
    from tools.scale_docs import _dir, generate

    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("ab_bloom", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(_dir(mult)):
        generate(spark, mult)
    docs = spark.read.parquet(os.path.join(_dir(mult), "documents.parquet"))
    docs = docs.select("doc_id", "text")

    base = f"/tmp/ab_bloom_store_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    seed = f"{base}/seed"
    for d in (0, 1):
        incremental_dedup_update(
            spark, docs.filter(F.col("doc_id") % 3 == d), seed, d
        ).count()
    day2 = docs.filter(F.col("doc_id") % 3 == 2)
    n_today = day2.count()
    store = load_fingerprint_store(spark, seed)
    n_store = store.count()
    from bun_csv_spark.functions.text import fingerprint

    # m = 16x today's unique fp count -> ~0.1% FP at k=3
    m_bits = 16 * day2.select(fingerprint("text").alias("fp")).distinct().count()

    results = {}
    for tag, bits in (("exact", None), ("bloom", m_bits)):
        best, rows = float("inf"), None
        for i in range(4):  # first run = warmup
            d = f"{base}/{tag}_{i}"
            shutil.copytree(seed, d)
            t0 = time.time()
            rows = incremental_dedup_update(
                spark, day2, d, 2, bloom_bits=bits
            ).count()
            if i:
                best = min(best, time.time() - t0)
        results[tag] = (best, rows)
        print(f"{tag:>6}: {best:.3f}s  day-2 survivors={rows}", flush=True)
    assert results["exact"][1] == results["bloom"][1], "bloom changed the result!"

    pruned = bloom_semi_join(
        store.select("fp"),
        day2.select(fingerprint("text").alias("fp")),
        "fp",
        m_bits=m_bits,
    ).count()
    print(
        f"store rows reaching the exact anti-join: {n_store} -> {pruned} "
        f"({100.0 * pruned / n_store:.2f}%)  [today={n_today}, m_bits={m_bits}]"
    )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
