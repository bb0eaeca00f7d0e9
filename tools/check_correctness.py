"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()`` twin
through DuckDB at sf0.01, then compares column sets, row counts, and
order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bun_csv_spark.session import TABLES, get_spark  # noqa: E402


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NA or v is pd.NaT:
        return None
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return float(int(v))
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9) + 0.0  # normalize -0.0 (sorts as '-0.0')
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_value(x) for x in v)
    return v


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(norm_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_duck = time.time() - t0

        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: column mismatch spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: row count spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        s_rows, o_rows = canonical(sdf), canonical(odf)
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first 3:")
            for i, a, b in bad[:3]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            n_fail += 1
        else:
            print(
                f"PASS {name}: {len(s_rows)} rows  (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)"
            )
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
