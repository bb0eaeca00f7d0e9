"""tpch_q11 exchange-floor probe (r14 verdict ask #4, timeboxed
document-or-improve).

q11's sf100 ratio (30.4) was adjudicated structural: a ~20M-group
partkey aggregation whose map-side partials cannot reduce — the
NATION_7 semi cut leaves ~1.2 rows per surviving partkey, spread over
the scan tasks, so the post-partial exchange carries ~one compact
(partkey, cents) row per group no matter how partials are arranged.
The one untried lever the verdict names: the dups-per-TASK arithmetic
— fewer/larger shuffle partitions (or more) change per-task hash-table
size, spill behavior, and task overhead even when exchanged BYTES are
fixed. This probe measures q11 under several shuffle-partition counts
with the dedicated.py calibration protocol (fresh process per setting:
run this tool once per value), so the floor claim becomes a measured
curve instead of an argument.

    python tools/ab_q11_partitions.py <SF> <shuffle_partitions> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = float(sys.argv[1])
    parts = int(sys.argv[2])
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        f"sf{sf:g}",
    )
    from bun_csv_spark.session import get_spark

    spark = get_spark("ab_q11", cpus=32, shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    q = entry_mod.queries()["tpch_q11"]

    def calib_wall() -> float:
        t = time.time()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")),
            F.count("*"),
        ).collect()
        return time.time() - t

    t0 = time.time()
    q(spark, sf_dir).collect()
    cold = time.time() - t0
    walls, calibs = [], []
    for _ in range(runs):
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        calibs.append(calib_wall())
        t0 = time.time()
        q(spark, sf_dir).collect()
        walls.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "query": "tpch_q11",
                "sf": sf,
                "shuffle_partitions": parts,
                "cold_sec": round(cold, 2),
                "best_sec": min(walls),
                "walls_sec": walls,
                "calib_sec": [round(c, 2) for c in calibs],
                "ratio_to_calib": round(min(walls) / min(calibs), 3),
            }
        ),
        flush=True,
    )
    os._exit(0)


if __name__ == "__main__":
    raise SystemExit(main())
