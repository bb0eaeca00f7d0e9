"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect / disk write in the measurement), after one tiny warmup to
JIT the codegen paths.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from bun_csv_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    # q5 runs the r10 pre-reduced star join: ~0.25 s slower at sf0.1
    # (everything broadcasts here, so the extra pre-reduction is pure
    # cost) but 3.6x faster at sf10 where the canonical order shuffles
    # full lineitem+orders (SCALE.md r10). Do NOT "fix" the sf0.1
    # number by reverting — the sf10 shape is the design target.
    "tpch_q5",
    "join_inner",
    "groupby_reference_aggs",
    "sort_topk",
    "window_topk_per_group",
    "events_tumbling",
    "events_sessionize",
    "dedup_fingerprint",
    "text_quality",
    "minhash_signatures",
    "ann_cosine_topk",
    "multimodal_features",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_suite(spark, queries, sf_dir, samples: int = 3) -> dict[str, float]:
    """One warmup + best-of-``samples`` per headline query — the
    reference's own harness methodology (test/benchmark.ts: warmup + N
    iterations); single runs carry ±25% JIT/GC noise."""
    timings: dict[str, float] = {}
    for name in HEADLINE:
        force(queries[name](spark, sf_dir))  # warmup (codegen/JIT per plan)
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return timings


def _child_main() -> None:
    """One FRESH-process suite pass (spawned by the parent's fresh
    mode): new JVM, warmup + best-of-2 per query, one JSON line."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_fresh", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    force(queries["count_rows"](spark, sf_dir))
    timings = _run_suite(spark, queries, sf_dir, samples=2)
    # csv throughput measured here too (r12): in the parent it runs
    # AFTER 50+ query executions and reads 40% low on a stale box —
    # the baseline-comparison number deserves the same fresh-JVM
    # treatment as the queries
    print(json.dumps({
        "queries": timings,
        "calibrate_sec": _calibrate(spark),
        "csv_parse_mb_per_sec": csv_parse_throughput(spark, sf_dir),
    }))


def _fresh_runs(n: int) -> "dict | None":
    """Run the suite in ``n`` fresh subprocesses (new JVM each — no
    inherited JIT/GC/code-cache state) and min-combine per query. This
    is the cross-round-comparable number: the same-process suite's wall
    drifts ±25-45% with accumulated process state (SCALE.md), which a
    fresh JVM per pass removes. The caller stops the parent Spark
    session first, so only ONE local[32] executor heap lives at a time.
    Returns None if every child fails — with each child's returncode +
    stderr tail on OUR stderr, never silently."""
    import subprocess

    per_child = []
    for i in range(n):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=1200,
            )
            line = proc.stdout.strip().splitlines()[-1]
            per_child.append(json.loads(line))
        except subprocess.TimeoutExpired:
            print(f"bench fresh child {i}: timeout (1200s)", file=sys.stderr)
            continue
        except (IndexError, ValueError):
            tail = "\n".join(proc.stderr.strip().splitlines()[-5:])
            print(
                f"bench fresh child {i}: rc={proc.returncode}, no JSON; "
                f"stderr tail:\n{tail}",
                file=sys.stderr,
            )
            continue
    if not per_child:
        return None
    queries = {
        name: round(min(c["queries"][name] for c in per_child), 3)
        for name in HEADLINE
    }
    return {
        "queries": queries,
        "total": round(sum(queries.values()), 3),
        "calibrate_sec": round(min(c["calibrate_sec"] for c in per_child), 3),
        "csv_parse_mb_per_sec": round(
            max(c.get("csv_parse_mb_per_sec", 0.0) for c in per_child), 1
        ),
        "runs": len(per_child),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # warmup: JIT codegen + parquet footer caches on a small query
    force(queries["count_rows"](spark, sf_dir))

    cal_before = _calibrate(spark)

    timings = _run_suite(spark, queries, sf_dir, samples=3)

    csv_mb_s = csv_parse_throughput(spark, sf_dir)

    # host throughput drifts ~1.4x between rounds (verified by re-running
    # the round-2 commit side-by-side on the same box); cross-round deltas
    # reflect the box as much as the code, so every query is also reported
    # as a BOX-NORMALIZED ratio (query_sec / calibrate_sec) — compare THOSE
    # across rounds, and treat WALL-CLOCK as the headline. Calibrate on
    # BOTH sides of the query block and normalize by their MEAN (r8 used
    # min, which let a one-sided 27% calibrate swing inflate every ratio
    # at once; the mean bounds any one-sided swing's effect to half, and
    # both raw sides stay in the record for attribution — SCALE.md r9)
    cal_after = _calibrate(spark)
    cal = round((cal_before + cal_after) / 2, 3)
    total = round(sum(timings.values()), 3)

    # fresh-process pass (r11): the same suite, best-of-2 in each of 2
    # NEW JVMs, min-combined — carried alongside the same-process numbers
    # so cross-round comparisons have a process-state-free series.
    # SPARK_GRAFT_NO_FRESH=1 skips it (quick local iteration). The parent
    # session stops FIRST (r12): the same-process measurements are done,
    # and two concurrent local[32] heaps would squeeze the child the
    # series exists to keep clean.
    # 3 children since r12: two same-day fresh totals spread 12%
    # (8.411 vs 9.503 s), past the r11 rule's ~10% trigger — the third
    # JVM's min-combine absorbs one bad draw (spread recorded in
    # SCALE.md r12)
    fresh = None
    if not os.environ.get("SPARK_GRAFT_NO_FRESH"):
        spark.stop()
        fresh = _fresh_runs(3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "csv_parse_mb_per_sec": csv_mb_s,
                "calibrate_sec": cal,
                # both sides reported so calibrate noise is VISIBLE in the
                # record — the r7->r8 "regression" was this yardstick
                # swinging 27% within one process, not the queries
                "calibrate_before_sec": cal_before,
                "calibrate_after_sec": cal_after,
                "queries_normalized": {
                    k: round(v / cal, 2) for k, v in timings.items()
                },
                "total_normalized": round(total / cal, 2),
                # normalization-rule version: r<=8 divided by min(before,
                # after), r9+ divides by their mean — normalized totals are
                # only comparable within the same rule
                "normalization": "mean-r9+",
                # fresh-JVM series (None if the children failed or were
                # skipped): per-query min over 2 fresh processes x
                # best-of-2 — compare THIS across rounds; the
                # same-process numbers above carry accumulated JIT/GC
                # state worth ±25-45% (SCALE.md)
                "fresh": fresh,
            }
        )
    )


def _calibrate(spark) -> float:
    """Fixed synthetic workload (no I/O): a box-speed yardstick recorded
    alongside the query timings so round-over-round comparisons can be
    normalized for host drift."""
    from pyspark.sql import functions as F

    def run():
        t0 = time.time()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select((F.col("id") % 9973).alias("k"), (F.col("id") * 31 % 7919).alias("v"))
            .groupBy("k")
            .agg(F.sum("v"), F.avg("v"), F.max("v"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.time() - t0

    run()  # warmup
    return round(min(run() for _ in range(3)), 3)


def csv_parse_throughput(spark, sf_dir: str) -> float:
    """End-to-end CSV parse MB/s — the reference's own headline metric
    (BASELINE.md: iterate all rows + access a field, warmup + best-of-N).

    lineitem is serialized to CSV once (cached in /tmp), then timed through
    the native reader with a projection+aggregation that forces every row
    to parse. CSV with multiLine=false splits, so all cores participate."""
    import glob

    from pyspark.sql import functions as F

    from bun_csv_spark.sources.csv_reader import CSVOptions, read_csv
    from bun_csv_spark.sources.csv_writer import write_csv

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/bench_csv_{tag}/lineitem_csv"
    if not glob.glob(f"{out}/part-*"):
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        # many part files = many scan splits (how real pipelines lay out CSV)
        write_csv(li.repartition(32), out)
    size = sum(os.path.getsize(p) for p in glob.glob(f"{out}/part-*"))

    def parse_all():
        df = read_csv(spark, out, CSVOptions())
        force(df.select(F.sum(F.length("l_returnflag")).alias("s")))

    parse_all()  # warmup
    parse_all()  # second warmup: the first run still JITs codegen paths
    best = float("inf")
    for _ in range(6):
        t0 = time.time()
        parse_all()
        best = min(best, time.time() - t0)
    return round(size / 1e6 / best, 1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child_main()
    else:
        main()
