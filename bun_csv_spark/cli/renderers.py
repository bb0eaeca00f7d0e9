"""Output renderers: table / csv / json (reference cli/index.ts:119-187).

"auto" renders a table on a TTY and CSV otherwise, like the reference.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Mapping, Sequence

from bun_csv_spark.sources.csv_writer import unparse


def render(rows: Sequence[Mapping[str, Any]], fmt: str = "auto") -> str:
    if fmt == "auto":
        fmt = "table" if sys.stdout.isatty() else "csv"
    if fmt == "table":
        return render_table(rows)
    if fmt == "csv":
        return unparse(list(rows), newline="\n").rstrip("\n")
    if fmt == "json":
        return json.dumps([dict(r) for r in rows], indent=2, default=str)
    raise ValueError(f"unknown format {fmt!r}")


def render_table(rows: Sequence[Mapping[str, Any]]) -> str:
    if not rows:
        return "(no rows)"
    cols = list(dict.fromkeys(k for r in rows for k in r))
    cells = [[_s(r.get(c)) for c in cols] for r in rows]
    widths = [
        max(len(cols[i]), *(len(row[i]) for row in cells)) if cells else len(cols[i])
        for i in range(len(cols))
    ]
    sep = "-+-".join("-" * w for w in widths)
    head = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
    body = "\n".join(
        " | ".join(cell.ljust(w) for cell, w in zip(row, widths)) for row in cells
    )
    return f"{head}\n{sep}\n{body}" if body else f"{head}\n{sep}"


def _s(v: Any) -> str:
    if v is None:
        return ""
    return str(v)


def print_summary(n_rows: int, elapsed_s: float, file_size: int | None = None) -> None:
    """Rows / elapsed / MB/s summary to stderr (cli/index.ts:190-204)."""
    msg = f"{n_rows:,} rows in {elapsed_s * 1000:.0f}ms"
    if file_size and elapsed_s > 0:
        msg += f" ({file_size / 1e6 / elapsed_s:.1f} MB/s)"
    print(msg, file=sys.stderr)
