"""r16 A/B: is the +4.3% r15 fresh-bench regression box noise?

The two worst r15 fresh rows (groupby_reference_aggs +28%,
events_tumbling +30%) had NO code change in the r15 diff (verified:
`git diff 40859c4 4dc8466 -- __spark_entry__.py` touches only
q21/q11/q8), so tree-to-tree equality is the null hypothesis. This
harness interleaves FRESH-process suite children alternating between
the r14 tree (a git worktree of 40859c4) and the r15/HEAD tree —
A,B,A,B,A,B — so both trees sample the same box state, and reports
per-tree best + spread for the two queries.

Usage: python tools/ab_bench_noise_r16.py [reps_per_tree=3]
(creates/removes the r14 worktree at /tmp/ab_r14_tree)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

R14_COMMIT = "40859c4"
R14_TREE = "/tmp/ab_r14_tree"
R15_TREE = "/root/repo"
QUERIES = ["groupby_reference_aggs", "events_tumbling"]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import __spark_entry__ as entry_mod
from bun_csv_spark.session import get_spark

spark = get_spark("ab_noise", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
queries = entry_mod.queries()

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(queries["count_rows"](spark, sf_dir))
out = {}
for name in %(queries)s:
    force(queries[name](spark, sf_dir))  # warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        force(queries[name](spark, sf_dir))
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
""" % {"queries": json.dumps(QUERIES)}


def run_child(tree: str) -> dict[str, float]:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", CHILD],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("ABRESULT "):
            return json.loads(ln[len("ABRESULT "):])
    raise RuntimeError(f"child in {tree} produced no result:\n{p.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    subprocess.run(
        ["git", "worktree", "add", "--force", R14_TREE, R14_COMMIT],
        cwd=R15_TREE,
        check=True,
    )
    try:
        results = {"r14": [], "r15": []}
        for rep in range(reps):
            for tag, tree in (("r14", R14_TREE), ("r15", R15_TREE)):
                r = run_child(tree)
                results[tag].append(r)
                print(f"rep{rep} {tag}: {r}", flush=True)
        print()
        for q in QUERIES:
            a = [r[q] for r in results["r14"]]
            b = [r[q] for r in results["r15"]]
            print(
                f"{q}: r14 best {min(a):.3f} (all {a})  "
                f"r15 best {min(b):.3f} (all {b})  "
                f"delta {(min(b) - min(a)) / min(a) * 100:+.1f}%"
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", R14_TREE], cwd=R15_TREE
        )


if __name__ == "__main__":
    main()
