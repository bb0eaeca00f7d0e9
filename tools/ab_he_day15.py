"""One-shot focused A/B for the bloom ON-side validation (r13 verdict
ask #4), against the persisted high-entropy store built by
tools/ab_bloom_highentropy.py: fold day N with bloom OFF vs ON
(alternating, best-of-2 each, shared warm cache), plus the coverage
probe and the pruned-store-rows count.

Usage: python tools/ab_he_day15.py [store_dir] [day]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from bun_csv_spark.operators.dedup import incremental_neardup_update
    from bun_csv_spark.operators.maintenance import bloom_semi_join
    from bun_csv_spark.session import get_spark
    from tools.ab_bloom_highentropy import day_docs_highentropy

    store = sys.argv[1] if len(sys.argv) > 1 else "/tmp/he_store_snap"
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    spark = get_spark("ab_he_day", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = day_docs_highentropy(spark, d, 500_000)

    t0 = time.time()
    n0 = incremental_neardup_update(spark, docs, store, d, repartition=32).count()
    print(f"warmup fold (off): {time.time()-t0:.1f}s pairs={n0}", flush=True)

    st = spark.read.parquet(store)
    today_bk = st.filter(F.col("day") == d).select("band", "bucket").distinct()
    m_bits = 16 * today_bk.count()
    hist = st.filter(F.col("day") < d)
    n_hist = hist.count()
    n_cov = hist.join(today_bk, ["band", "bucket"], "left_semi").count()
    print(
        f"coverage: store_rows={n_hist} covered={n_cov} "
        f"({100*n_cov/n_hist:.1f}%) m_bits={m_bits}",
        flush=True,
    )

    bk = F.concat_ws("|", F.col("band").cast("string"), F.col("bucket"))
    pruned = bloom_semi_join(
        hist.select(bk.alias("__bk")),
        st.filter(F.col("day") == d).select(bk.alias("__bk")),
        "__bk",
        m_bits=m_bits,
        hash_fn="xxhash64",
    ).count()
    print(
        f"store rows reaching candidate join: {n_hist} -> {pruned} "
        f"({100.0*pruned/n_hist:.2f}%)",
        flush=True,
    )

    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for rep in range(2):
        for tag, bits in (("off", None), ("on", m_bits)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            n = incremental_neardup_update(
                spark, docs, store, d, repartition=32, bloom_bits=bits
            ).count()
            w = time.time() - t0
            best[tag] = min(best.get(tag, 1e9), w)
            counts[tag] = n
            print(f"rep{rep} {tag}: {w:.1f}s pairs={n}", flush=True)
    assert counts["off"] == counts["on"], "bloom changed the result!"
    print(
        f"A/B day {d}: off={best['off']:.1f}s on={best['on']:.1f}s "
        f"speedup={best['off']/best['on']:.2f}x",
        flush=True,
    )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
