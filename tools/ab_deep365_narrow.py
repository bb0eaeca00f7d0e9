"""Year-deep (365x-day, 730M-row) fold on the NARROW (xxhash64) band
store — completing two r15/r16 threads at once:

1. The narrow layout's value where it matters most: the year-deep fold
   is store-scan-dominated, so the 3.3x byte cut (measured at 100x-day,
   SCALE.md r16) should show its largest wall effect here. Both stores
   (md5 and xxhash64) are pre-grown and the BLOOM-ON folds interleave
   (md5, xx, md5, xx) so both encodings sample the same box state.
2. The r15 unpruned year point is only EXTRAPOLATED: the md5 OFF fold
   died ENOSPC twice (~3x of 26 GB store bytes of shuffle/sort
   transient on 80 GB free). The narrow store is ~8 GB, so its OFF
   transient (~24 GB) should FIT — if it runs, this is the first
   MEASURED unpruned year-deep wall, grounding the ~2.7x prune claim.
   The OFF attempt runs LAST (after every other number is banked) so
   an ENOSPC abort loses nothing.

Pairs are asserted identical (count + order-insensitive checksum)
across every fold that completes.

Usage: python tools/ab_deep365_narrow.py [depth=365] [docs_per_day=500000]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.ab_bloom_deepstore import PARAMS  # noqa: E402
from tools.ab_bucket_encoding import (  # noqa: E402
    _du_bytes,
    real_recurring_rows_enc,
    synth_day_rows_enc,
)


def main() -> int:
    from bun_csv_spark.operators.dedup import (
        _check_store_params,
        incremental_neardup_update,
    )
    from bun_csv_spark.session import get_spark
    from tools.ab_bloom_highentropy import day_docs_highentropy

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 365
    per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("ab_deep365_narrow", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    import atexit

    stores = {}
    for enc in ("md5", "xxhash64"):
        stores[enc] = f"/tmp/ab_d365n_{enc}_{os.getpid()}"
        shutil.rmtree(stores[enc], ignore_errors=True)
        atexit.register(
            lambda s=stores[enc]: shutil.rmtree(s, ignore_errors=True)
        )
    docs = day_docs_highentropy(spark, depth, per_day)

    m_bits = {}
    for enc in ("md5", "xxhash64"):
        store = stores[enc]
        params = dict(PARAMS)
        if enc != "md5":
            params["bucket_encoding"] = enc
        _check_store_params(spark, store, params)
        rec = real_recurring_rows_enc(spark, per_day, enc)
        t0 = time.time()
        for d in range(depth):
            synth_day_rows_enc(
                spark, d, per_day, rec, enc
            ).write.mode("overwrite").parquet(f"{store}/day={d}")
        rec.unpersist()
        n_hist = spark.read.parquet(store).count()
        print(
            f"[{enc}] store: {n_hist} rows, {_du_bytes(store) / 2**30:.2f} "
            f"GiB ({time.time() - t0:.1f}s gen)",
            flush=True,
        )
        # commit today's partition WITH the prune (the md5 unpruned
        # fold is known ENOSPC-infeasible at this depth, r15) — the
        # bitmap sizing needs today committed, so first sizing uses the
        # 100x-day heuristic, then we recompute exactly
        guess = 16 * 4 * per_day
        t0 = time.time()
        n0 = incremental_neardup_update(
            spark, docs, store, depth, repartition=par,
            bloom_bits=guess, bucket_encoding=enc,
        ).count()
        print(f"[{enc}] commit fold (on): {time.time() - t0:.1f}s "
              f"pairs={n0}", flush=True)
        m_bits[enc] = 16 * (
            spark.read.parquet(f"{store}/day={depth}")
            .select("band", "bucket").distinct().count()
        )

    def fold(enc, bits):
        t0 = time.time()
        pairs = incremental_neardup_update(
            spark, docs, stores[enc], depth, repartition=par,
            bloom_bits=bits, bucket_encoding=enc,
        )
        agg = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("id_a", "id_b").cast("decimal(38,0)")).alias(
                "chk"
            ),
        ).collect()[0]
        return time.time() - t0, (agg["n"], agg["chk"])

    best_on, sigs = {}, {}
    for rep in range(2):
        for enc in ("md5", "xxhash64"):
            w, sig = fold(enc, m_bits[enc])
            best_on[enc] = min(best_on.get(enc, float("inf")), w)
            sigs[f"{enc}-on"] = sig
            free = shutil.disk_usage("/tmp").free / 2**30
            print(f"rep{rep} [{enc}] on: {w:.1f}s pairs={sig[0]} "
                  f"chk={sig[1]} (free {free:.0f}G)", flush=True)
    assert sigs["md5-on"] == sigs["xxhash64-on"], sigs
    print(
        f"\nON @ {depth}x-day: md5 {best_on['md5']:.1f}s -> "
        f"xxhash64 {best_on['xxhash64']:.1f}s "
        f"({best_on['md5'] / best_on['xxhash64']:.2f}x)",
        flush=True,
    )
    # the OFF attempt, LAST, narrow store only (md5 known infeasible);
    # free the md5 store first so the transient has maximum headroom
    shutil.rmtree(stores["md5"], ignore_errors=True)
    print(f"free before OFF: {shutil.disk_usage('/tmp').free / 2**30:.0f}G",
          flush=True)
    try:
        best_off = float("inf")
        for rep in range(2):
            w, sig = fold("xxhash64", None)
            best_off = min(best_off, w)
            sigs["xx-off"] = sig
            print(f"rep{rep} [xxhash64] OFF: {w:.1f}s pairs={sig[0]} "
                  f"chk={sig[1]}", flush=True)
        assert sigs["xx-off"] == sigs["xxhash64-on"], sigs
        print(
            f"OFF @ {depth}x-day (narrow store, first MEASURED unpruned "
            f"year point): best {best_off:.1f}s; prune speedup "
            f"{best_off / best_on['xxhash64']:.2f}x on the narrow layout",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — ENOSPC abort loses nothing
        print(f"OFF fold failed ({type(e).__name__}): {str(e)[:300]}",
              flush=True)
    shutil.rmtree(stores["xxhash64"], ignore_errors=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
