"""Bloom crossover ON-side validation: the high-entropy 30-day replay
(r13 verdict ask #4).

Both prior bloom measurements (the r12 A/B and the r13 30-day replay)
landed in the OFF regime: a 32-word template vocabulary saturates LSH
bucket space, today's buckets cover ~100% of the store, and the prune
is pure overhead. The crossover rule predicts an ENABLING regime at
coverage << ~10% — high-entropy content whose bucket space dwarfs the
corpus. This replay constructs exactly that stream and A/Bs the fold
with `bloom_bits=` ON vs OFF at checkpoint days, so the rule's ON side
is either confirmed (prune fires and wins, speedup measured) or
falsified (and the rule gets revised with the evidence).

Same structure as tools/replay_neardup_30d.py — N days x M docs/day,
one persisted band store, per-fold wall + the coverage probe — except
every token is the hex of a 64-bit hash (vocabulary ~2^64, so each
novel block's shingles are globally unique) instead of a 32-word
template draw. The 5% recurring blocks still recur across days, so the
planted cross-day near-dups — and a small true bucket overlap — are
preserved: expected coverage ~= the recurring fraction (~5%), well
inside the predicted ON regime.

Checkpoint A/B protocol (days 10/20/29 by default): after the day's
normal committing fold, the SAME day re-folds 2x per mode
(OFF, ON, OFF, ON — the re-fold is idempotent: the day partition is
overwritten and candidates join STRICTLY earlier days), best-of-2 per
mode, both modes enjoying the same warmed cache; pair counts asserted
identical (bloom has no false negatives).

Usage: python tools/ab_bloom_highentropy.py [days] [docs_per_day]
       [store_dir start_day]   # resume an existing store mid-replay
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CHECKPOINTS = (10, 15, 20, 29)


def day_docs_highentropy(spark, day: int, n: int):
    """tools/replay_neardup_30d.day_docs with an effectively unbounded
    vocabulary: token j of a block is hex(xxhash64(base, seed, 2, j)) —
    2^64 distinct tokens, so a novel (day-seeded) block shares no
    shingle with any other block, ever. Block structure is identical:
    within-day near-dup plant at id%25==1 (copy + 3 perturbation
    tokens), 95% of 25-doc blocks day-seeded (novel), 5% recurring
    across days (seed=0 -> cross-day dups AND the only true bucket
    overlap with history)."""
    i = F.col("id")
    gid = F.lit(day * n).cast("long") + i
    base = F.when(i % 25 == 1, (i / 25).cast("long") * 25).otherwise(i)
    recurring = F.pmod(F.xxhash64((base / 25).cast("long"), F.lit(11)), F.lit(20)) == 0
    seed = F.when(recurring, F.lit(0)).otherwise(F.lit(day + 1))
    n_words = (F.pmod(F.xxhash64(base, seed, F.lit(1)), F.lit(51)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.lower(F.hex(F.xxhash64(base, seed, F.lit(2), j))),
    )
    perturb = F.when(
        i % 25 == 1,
        F.transform(
            F.sequence(F.lit(1), F.lit(3)),
            lambda j: F.lower(F.hex(F.xxhash64(i, seed, F.lit(3), j))),
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
    spark = get_spark("ab_bloom_he", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    start_day = 0
    if len(sys.argv) > 4:
        store, start_day = sys.argv[3], int(sys.argv[4])
    else:
        store = f"/tmp/ab_bloom_he_store_{os.getpid()}"
        shutil.rmtree(store, ignore_errors=True)
    print(
        f"days={days} per_day={per_day} start={start_day} "
        f"checkpoints={CHECKPOINTS}",
        flush=True,
    )
    for d in range(start_day, days):
        docs = day_docs_highentropy(spark, d, per_day)
        t0 = time.time()
        pairs = incremental_neardup_update(
            spark, docs, store, d, repartition=par
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        cov = ""
        if d > 0 and (d % 5 == 0 or d in CHECKPOINTS):
            st = spark.read.parquet(store)
            hist = st.filter(F.col("day") < d)
            today = st.filter(F.col("day") == d).select("band", "bucket").distinct()
            n_hist = hist.count()
            n_cov = hist.join(today, ["band", "bucket"], "left_semi").count()
            cov = f" store_rows={n_hist} covered={n_cov} ({100*n_cov/max(n_hist,1):.1f}%)"
        print(f"day {d:2d}: wall={wall:7.2f}s pairs={n_pairs}{cov}", flush=True)
        if d in CHECKPOINTS:
            # m = 16x today's distinct buckets, the ab_bloom_neardup
            # sizing (~0.1% FP at k=3) — counted from the COMMITTED day
            # partition, not a re-banding pass (the distinct over a
            # fresh banding plan re-evaluates the minhash fold per
            # grouping key and measured ~480 s vs ~2 s from parquet)
            m_bits = 16 * (
                spark.read.parquet(store)
                .filter(F.col("day") == d)
                .select("band", "bucket")
                .distinct()
                .count()
            )
            best = {}
            counts = {}
            for rep in range(2):
                for tag, bits in (("off", None), ("on", m_bits)):
                    t0 = time.time()
                    n = incremental_neardup_update(
                        spark, docs, store, d, repartition=par, bloom_bits=bits
                    ).count()
                    w = time.time() - t0
                    best[tag] = min(best.get(tag, float("inf")), w)
                    counts[tag] = n
            assert counts["off"] == counts["on"], "bloom changed the result!"
            print(
                f"A/B day {d}: off={best['off']:.2f}s on={best['on']:.2f}s "
                f"speedup={best['off'] / best['on']:.2f}x m_bits={m_bits} "
                f"pairs={counts['off']}",
                flush=True,
            )
        spark.sparkContext._jvm.System.gc()
    shutil.rmtree(store, ignore_errors=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
