"""Year-deep (365x day, 730M-row) ON-only fold: grows the synthetic
store (tools/ab_bloom_deepstore.py machinery) and measures ONLY the
bloom-pruned fold — the unpruned fold is disk-infeasible on this box
(2x ENOSPC at ~3x store-bytes of shuffle+sort transient; SCALE.md
round-15 year-deep addendum). Best-of-2, pairs asserted stable run to
run by inspection of the printed counts."""

import os, shutil, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bun_csv_spark.operators.dedup import _check_store_params, incremental_neardup_update
from bun_csv_spark.session import get_spark
from tools.ab_bloom_deepstore import PARAMS, real_recurring_rows, synth_day_rows
from tools.ab_bloom_highentropy import day_docs_highentropy


def main():

    spark = get_spark("deep365_on", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    store = "/tmp/deep365_on_store"
    shutil.rmtree(store, ignore_errors=True)
    import atexit
    atexit.register(lambda: shutil.rmtree(store, ignore_errors=True))
    _check_store_params(spark, store, PARAMS)
    per_day = 500_000
    rec = real_recurring_rows(spark, per_day)
    t0 = time.time()
    for d in range(365):
        synth_day_rows(spark, d, per_day, rec).write.mode("overwrite").parquet(f"{store}/day={d}")
    n_hist = spark.read.parquet(store).count()
    print(f"grown: {n_hist} rows in {time.time()-t0:.0f}s", flush=True)
    docs = day_docs_highentropy(spark, 365, per_day)
    # ON fold only: the OFF fold is disk-infeasible at this depth on this
    # box (2x ENOSPC: ~3x store-bytes of shuffle+sort spill); the prune
    # drops ~95% of the store at scan, so ON's transient is ~0.15x
    m_bits_guess = 16 * 2_000_000  # today's distinct buckets ~= docs x bands
    best = None
    for rep in range(2):
        t0 = time.time()
        n = incremental_neardup_update(spark, docs, store, 365, repartition=par, bloom_bits=m_bits_guess).count()
        w = time.time() - t0
        best = min(best or w, w)
        print(f"rep{rep} ON: {w:.1f}s pairs={n}", flush=True)
    print(f"ON-only @730M store: best {best:.1f}s", flush=True)
    shutil.rmtree(store, ignore_errors=True)
    os._exit(0)


if __name__ == "__main__":
    main()
