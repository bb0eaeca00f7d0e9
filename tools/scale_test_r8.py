"""Round-8 scale datapoint: the salted as-of join beating the unsalted
one wall-clock on a planted hot key — the skew proof the SCALE.md notes
promise (operators/temporal.py asof_join_salted, operators/maintenance.py
skew_profile).

    python tools/scale_test_r8.py

Synthetic shape: 20M left events over 1000 keys where ONE key ("hot")
carries 90% of the rows — the viral-entity distribution skew_profile is
built to detect. The unsalted as-of carry window partitions by key, so
the hot key's 18M rows sort on ONE task; the salted variant spreads them
over n_salt sub-keys at the cost of replicating the (tiny) right side.

Calibration note (measured while building this): at 50% skew on 10M
rows the salted path LOSES (~0.45x) — the straggler sort is too small
to beat the salt's extra rand/wider-sort overhead on 8 cores. Salting
is a remedy for VIRAL keys, not mild imbalance; profile first
(skew_profile's skew_factor), salt above ~10x.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bun_csv_spark.session import get_spark  # noqa: E402

N_LEFT = 20_000_000
N_KEYS = 1_000
N_QUOTES_PER_KEY = 20
N_SALT = 8


def timed(label, df):
    """Force the FULL plan with a noop sink — count() lets Catalyst prune
    the as-of carry window (it doesn't change cardinality), which would
    time an empty plan."""
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main() -> None:
    spark = get_spark("scale_r8", cpus=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from bun_csv_spark.operators.maintenance import skew_profile
    from bun_csv_spark.operators.temporal import asof_join, asof_join_salted

    # left: 9 of 10 ids are the hot key (90% of rows); the remainder
    # spreads over ALL N_KEYS cold keys (id // 10 walks every residue —
    # a bare id % N_KEYS would only ever hit the 9-ending residues);
    # ts strictly grows
    left = spark.range(0, N_LEFT, 1, 32).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("k"), ((F.col("id") / 10).cast("long") % N_KEYS).cast("string"))
        )
        .alias("key"),
        (F.col("id") * 1000).alias("ts"),
        (F.col("id") % 97).alias("v"),
    )
    # right: small quote table — every key (incl. hot) gets N_QUOTES_PER_KEY
    # quotes spread over the left ts range
    right = (
        spark.range(N_KEYS * N_QUOTES_PER_KEY)
        .select(
            F.when(F.col("id") % N_KEYS == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("k"), (F.col("id") % N_KEYS).cast("string"))
            )
            .alias("key"),
            (
                (F.col("id") / (N_KEYS * N_QUOTES_PER_KEY) * N_LEFT * 1000)
                .cast("long")
            ).alias("ts"),
            F.col("id").alias("quote"),
        )
    )
    left.cache().count()
    right.cache().count()

    prof = skew_profile(left, "key", top=3).collect()
    print("skew_profile top keys:")
    for r in prof:
        print(f"  {r['key']}: frac={r['frac']}, skew_factor={r['skew_factor']}")

    # sanity: identical results (matched-quote checksum), then warm both
    # plans once (JIT) and measure
    u_df = asof_join(left, right, "key", "ts", ["quote"])
    s_df = asof_join_salted(left, right, "key", "ts", ["quote"], n_salt=N_SALT)
    chk_u, chk_s = (
        d.agg(
            F.count(F.lit(1)).alias("n"), F.sum("quote").alias("s")
        ).collect()[0]
        for d in (u_df, s_df)
    )
    assert tuple(chk_u) == tuple(chk_s), (chk_u, chk_s)
    assert chk_u["n"] == N_LEFT

    timed("warmup unsalted", u_df)
    timed("warmup salted", s_df)
    t_u = min(timed("asof_join UNSALTED (hot key pins one task)", u_df)
              for _ in range(3))
    t_s = min(timed(f"asof_join SALTED n_salt={N_SALT}", s_df)
              for _ in range(3))
    print(f"speedup: {t_u / t_s:.2f}x  (unsalted {t_u:.2f}s / salted {t_s:.2f}s)")


def incremental_vs_recompute() -> None:
    """The incremental_day_pipeline claim, measured: with days 1-2
    states PERSISTED (tiny parquet), day 3's update costs one day's scan
    plus a state merge — versus re-scanning all three days. The gap is
    the whole value of the mergeable-family algebra; at 100 TB/day the
    ratio is bounded below by (history size / day size)."""
    import shutil

    spark = get_spark("scale_r8b", cpus=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from bun_csv_spark.functions.sketches import (
        histogram_merge,
        histogram_state,
        histogram_state_quantiles,
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from bun_csv_spark.operators.maintenance import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    n_day = 10_000_000
    keys = ["k"]

    def day(d):
        return spark.range(d * n_day, (d + 1) * n_day, 1, 32).select(
            (F.col("id") % 64).cast("string").alias("k"),
            (F.col("id") * 7919 % 100_000).cast("long").alias("v"),
            (F.col("id") % 1_000_000).cast("string").alias("u"),
        )

    def states_of(df):
        return (
            agg_state(df, keys, "v"),
            hll_registers(df, keys, "u"),
            histogram_state(df, "v", 0.0, 100_000.0, 120, keys),
        )

    base = "/tmp/scale_r8_states"
    shutil.rmtree(base, ignore_errors=True)
    hist12 = day(0).unionByName(day(1))
    for name, st in zip(("agg", "hll", "hist"), states_of(hist12)):
        st.write.mode("overwrite").parquet(f"{base}/{name}")

    def finalize(agg, hll, hist):
        timed("  agg", finalize_agg_state(agg))
        timed("  hll", hll_estimate(hll, keys))
        timed("  hist", histogram_state_quantiles(
            hist, [0.5, 0.99], 0.0, 100_000.0, 120, keys))

    print("incremental (persisted day1-2 states + day-3 scan + merge):")
    t0 = time.time()
    a3, h3, g3 = states_of(day(2))
    finalize(
        merge_agg_states(spark.read.parquet(f"{base}/agg"), a3, keys),
        hll_merge(spark.read.parquet(f"{base}/hll"), h3, key_cols=keys),
        histogram_merge(spark.read.parquet(f"{base}/hist"), g3, key_cols=keys),
    )
    t_inc = time.time() - t0
    print(f"incremental total: {t_inc:.2f}s")

    print("full recompute (re-scan all 3 days):")
    t0 = time.time()
    finalize(*states_of(hist12.unionByName(day(2))))
    t_full = time.time() - t0
    print(f"recompute total: {t_full:.2f}s")
    print(f"incremental advantage: {t_full / t_inc:.2f}x at history/day = 2; "
          "grows linearly with history")


if __name__ == "__main__":
    main()
    incremental_vs_recompute()
