"""30-day incremental near-dup replay at 500k docs/day — the
store-growth axis the fold curve extrapolated (r12 verdict ask #6).

The r12 curve measured doc-count decades with a 3-day store; the
multi-year regime (store >> day) was argued, not measured. This replay
folds 30 synthetic days of 500k docs into one persisted band store
(15M docs / ~60M band rows by day 30) and records, per fold:

- wall seconds (the slope vs store size is THE result — flat means the
  bucket join's history side is pruned by the shuffle hash, not
  scanned-and-dropped);
- today-vs-store bucket coverage: the fraction of store rows whose
  (band, bucket) also occurs today — the cheap probe SCALE.md's
  crossover rule says should gate `bloom_bits=` (enable only when
  predicted coverage << ~10%).

Day texts rotate templates: each 25-doc block picks its word stream
from a DAY-SEEDED hash for 95% of blocks (novel every day) and a
day-INDEPENDENT hash for 5% (recurring templates -> real cross-day
near-dups). This is exactly the "template-rotating stream where old hot
buckets go cold" regime the crossover rule names, so the replay also
validates (or falsifies) the probe rule itself.

Usage: python tools/replay_neardup_30d.py [days] [docs_per_day]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "slow", "group", "agg", "filter", "query",
    "big", "key", "window", "row", "table", "stream", "merge", "data",
    "hash", "join", "shard", "codec", "plan", "stage", "skew", "salt",
]


def day_docs(spark, day: int, n: int):
    """500k-doc synthetic day, Spark-native and deterministic (the
    tools/scale_docs.py recipe plus the day axis): within-day near-dup
    plant at id%25==1, 95% of 25-doc blocks day-seeded (novel), 5%
    recurring across days (cross-day dups)."""
    i = F.col("id")
    gid = F.lit(day * n).cast("long") + i
    base = F.when(i % 25 == 1, (i / 25).cast("long") * 25).otherwise(i)
    recurring = F.pmod(F.xxhash64((base / 25).cast("long"), F.lit(11)), F.lit(20)) == 0
    seed = F.when(recurring, F.lit(0)).otherwise(F.lit(day + 1))
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    n_words = (F.pmod(F.xxhash64(base, seed, F.lit(1)), F.lit(51)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(base, seed, F.lit(2), j), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    perturb = F.when(
        i % 25 == 1,
        F.transform(
            F.sequence(F.lit(1), F.lit(3)),
            lambda j: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(i, seed, F.lit(3), j), F.lit(len(VOCAB))) + 1).cast("int"),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    text = F.array_join(F.concat(words, perturb), " ")
    return spark.range(0, n, 1, 32).select(
        gid.alias("doc_id"), text.alias("text")
    )


def main() -> int:
    from bun_csv_spark.operators.dedup import incremental_neardup_update
    from bun_csv_spark.session import get_spark

    days = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("replay_nd30", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    store = f"/tmp/replay_nd30_store_{os.getpid()}"
    shutil.rmtree(store, ignore_errors=True)
    print(f"days={days} per_day={per_day}", flush=True)
    for d in range(days):
        docs = day_docs(spark, d, per_day)
        t0 = time.time()
        pairs = incremental_neardup_update(
            spark, docs, store, d, repartition=par
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        # crossover probe (SCALE.md rule): store-row coverage by today's
        # bucket set — measured AFTER the fold so it never pollutes the
        # wall; day d's own partition is excluded (history = days < d)
        cov = ""
        if d > 0 and d % 5 == 0:
            st = spark.read.parquet(store)
            hist = st.filter(F.col("day") < d)
            today = st.filter(F.col("day") == d).select("band", "bucket").distinct()
            n_hist = hist.count()
            n_cov = hist.join(today, ["band", "bucket"], "left_semi").count()
            cov = f" store_rows={n_hist} covered={n_cov} ({100*n_cov/max(n_hist,1):.1f}%)"
        print(
            f"day {d:2d}: wall={wall:7.2f}s pairs={n_pairs}{cov}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()
    shutil.rmtree(store, ignore_errors=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
