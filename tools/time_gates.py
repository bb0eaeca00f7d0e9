"""Warm per-gate timing: build each named gate fresh, force it through
the noop sink, warmup + best-of-N in one session. The r19 targeted
measurement harness (the r18 full-registry sweep's focused sibling).

    python tools/time_gates.py <sf_dir> <runs> <gate> [gate ...]

Prints one JSON line: {"gate": best_sec, ...} plus per-run walls on
stderr for outlier attribution (memory: external load spikes hit single
passes — min-combine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bun_csv_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("time_gates", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    best: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_gates: {name}")
        walls = []
        for i in range(runs + 1):  # first run = warmup
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
        print(f"{name}: warmup={walls[0]} runs={walls[1:]}", file=sys.stderr)
        best[name] = min(walls[1:])
    print(json.dumps(best))


if __name__ == "__main__":
    main()
