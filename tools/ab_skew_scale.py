"""A/B: the asof_join_auto salt decision at an above-bench scale point.

The 10x threshold (skew.SALT_SKEW_THRESHOLD) was measured at r8 on 20M
events. This tool re-runs the experiment 4x bigger (80M events, 1001
keys, 20k-row quote side) in BOTH regimes and checks the auto helper
end to end:

  - viral regime: ONE key holds 90% of events (skew_factor ~900) —
    asof_join_auto must take the salted path AND the salted path must
    win the wall-clock A/B;
  - mild regime: uniform keys (skew_factor ~1) — auto must take the
    plain path AND the plain path must win.

The chosen path is verified structurally (the salted plan replicates
the quote side with explode), not inferred from timing.

Usage: python tools/ab_skew_scale.py [n_rows]   # default 80_000_000
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_KEYS = 1001
N_QUOTES_PER_KEY = 20


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, n=2) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    from bun_csv_spark.operators.skew import key_skew_factor
    from bun_csv_spark.operators.temporal import (
        asof_join,
        asof_join_auto,
        asof_join_salted,
    )
    from bun_csv_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    spark = get_spark("ab_skew", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n_rows).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 1_000_000).alias("ts"),
    )
    regimes = {
        # 90% of rows on key 0 -> factor ~ 0.9*n / (n/1001) ~ 900
        "viral": base.select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % N_KEYS)
            .alias("k"),
            "ts",
        ),
        "mild": base.select((F.col("id") % N_KEYS).alias("k"), "ts"),
    }
    quotes = spark.range(N_KEYS * N_QUOTES_PER_KEY).select(
        (F.col("id") % N_KEYS).alias("k"),
        (F.floor(F.col("id") / N_KEYS) * (1_000_000 // N_QUOTES_PER_KEY)).alias(
            "ts"
        ),
        (F.col("id") * 31 % 997).alias("q_val"),
    )
    ok = True
    for name, left in regimes.items():
        factor = key_skew_factor(left, ["k"], sample_fraction=0.01)
        auto_df = asof_join_auto(
            left, quotes, "k", "ts", ["q_val"], n_salt=8,
            sample_fraction=0.01,
        )
        took_salted = "explode" in auto_df._jdf.queryExecution().toString()
        t_plain = _best(lambda: _force(
            asof_join(left, quotes, "k", "ts", ["q_val"])))
        t_salted = _best(lambda: _force(
            asof_join_salted(left, quotes, "k", "ts", ["q_val"], n_salt=8)))
        winner = "salted" if t_salted < t_plain else "plain"
        chose = "salted" if took_salted else "plain"
        agree = winner == chose
        ok = ok and agree
        print(
            f"{name:>6}: factor={factor:8.1f}  plain={t_plain:6.2f}s  "
            f"salted={t_salted:6.2f}s  winner={winner}  auto chose={chose}  "
            f"{'OK' if agree else 'MISMATCH'}",
            flush=True,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
