"""Lint every registry gate's plan at a given scale factor.

The standing pytest sweep lints at sf0.001, where EVERYTHING prices
under the broadcast threshold — the two static-pricing trap rules can
only fire there on pathological shapes. Broadcast decisions DIVERGE at
sf10 (fact files cross the 64 MB threshold, narrow projections do
not), so this tool re-lints the whole registry against a generated
.scale fixture. Round 16's first run found four live trap instances in
the gates themselves (q22 + semi_anti_join broadcasting SF-scaling
orders cuts — the q9 window, 1.5-2.1x fixed; q2's SMJ'd supplier cut —
the q11 family, 1.22x fixed; q21 a measured wash, documented) and one
rule bug (outer-join preserved sides) — see SCALE.md r16.

Gates whose tables don't exist in the fixture (documents/events/
embeddings are TPC-H-only in .scale) are skipped and counted.

Usage: python tools/lint_registry.py [sf_dir=/root/repo/.scale/sf10]
Exit 1 if any gate fires a trap rule (q21's adjudicated wash is
allowlisted with its reason).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measured-wash allowlist: gate -> reason (SCALE.md r16)
ADJUDICATED = {
    "tpch_q21": "sup_cut broadcast A/B'd 1.04-1.05x at sf10 AND sf100 — "
    "the flagged exchange carries the post-aggregate qualifier set, "
    "already collapsed by map-side partials; left unhinted to keep the "
    "audited plan minimal",
}

TRAP_CODES = ("fact-broadcast", "dim-cut-not-broadcast")


def main() -> int:
    from bun_csv_spark.plans.lint import lint_plan
    from bun_csv_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    spark = get_spark("lint_registry", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    bad, skipped, clean = {}, 0, 0
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            codes = [f.code for f in lint_plan(df) if f.code in TRAP_CODES]
        except Exception:  # noqa: BLE001 — table absent in this fixture
            skipped += 1
            continue
        if codes and name in ADJUDICATED:
            print(f"WASH {name}: {codes} — {ADJUDICATED[name]}")
        elif codes:
            bad[name] = codes
            print(f"TRAP {name}: {codes}")
        else:
            clean += 1
    print(f"\n{clean} clean, {len(bad)} trap, "
          f"{len(ADJUDICATED)} adjudicated, {skipped} skipped (table "
          f"absent at this SF)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
