"""Scale curve for incremental_neardup_update: the 3-pseudo-day fold at
the 10x and 100x docs points (tools/scale_docs.py corpora), wall per fold
plus the size of what actually moves — today's band rows and the emitted
pairs — so the 100 TB argument is measured, not asserted.

What should hold if the operator scales: per-fold wall grows ~linearly
with the day's docs (banding is map-only; the bucket join moves
docs x bands digest rows, never text), and day-over-day growth of the
STORE affects the fold only through the bucket join's history side.

Usage: python tools/scale_incremental_neardup.py [mult ...]  # default 10 100
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from bun_csv_spark.operators.dedup import incremental_neardup_update
    from bun_csv_spark.session import get_spark
    from tools.scale_docs import _dir, generate

    mults = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scale_incnd", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    results = {}
    for m in mults:
        if not os.path.isdir(_dir(m)):
            generate(spark, m)
        docs = spark.read.parquet(
            os.path.join(_dir(m), "documents.parquet")
        ).select("doc_id", "text")
        store = f"/tmp/scale_incnd_store_{os.getpid()}_{m}"
        shutil.rmtree(store, ignore_errors=True)
        folds = []
        for d in range(3):
            t0 = time.time()
            pairs = incremental_neardup_update(
                spark, docs.filter(F.col("doc_id") % 3 == d), store, d,
                repartition=par,
            )
            n_pairs = pairs.count()
            folds.append((round(time.time() - t0, 2), n_pairs))
        shutil.rmtree(store, ignore_errors=True)
        results[m] = folds
        total = round(sum(w for w, _ in folds), 2)
        print(f"x{m}: folds={folds} total={total}s", flush=True)
    if len(results) == 2:
        a, b = (results[m] for m in mults)
        ta, tb = sum(w for w, _ in a), sum(w for w, _ in b)
        print(
            f"ratio x{mults[1]}/x{mults[0]}: {tb / ta:.2f}x wall for "
            f"{mults[1] // mults[0]}x docs"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
