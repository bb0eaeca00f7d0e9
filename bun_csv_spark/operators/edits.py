"""Copy-on-write edit overlay — the reference's writable mode on Spark.

Reference: src/ts/parser.ts:744-899 (setCell / deleteRow / insertRow /
save / discardChanges / getCell), src/ts/writer.ts:207-290. The reference
replays a modification log over the re-parsed file into a new file; insert
positions are OUTPUT-stream positions consumed during the replay loop
(parser.ts:816-850: before each surviving original row, then once at EOF).

Spark design (SURVEY §7.1 item 7): the LOG is driver-side state (it is
small — a user's manual edits), the DATA stays distributed. ``apply``:

1. one count() + the sorted delete set resolve each insert's output
   position to an anchor original row, by inverting
   emitted(r) = r - |deletes < r| with binary search — O(log·log N) on the
   driver, no data movement;
2. cell edits become per-column broadcast joins (edit tables are tiny);
3. deletes are a filter, inserts a union, and one final sort by
   (anchor row, originals-after-inserts, insert sequence) reproduces the
   replay order exactly.

The row identity column is the reader's file-order ``__row_idx``
(read_csv(with_row_index=True)); apply() renumbers it to the reference's
0-based data-row index internally.
"""

from __future__ import annotations

import bisect
import weakref
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bun_csv_spark.operators.frame import ROW_IDX


@dataclass
class EditLog:
    """Accumulates cell edits, row deletes, and positional inserts."""

    cell_edits: dict[tuple[int, str], str | None] = field(default_factory=dict)
    deleted: set[int] = field(default_factory=set)
    inserts: dict[int, list] = field(default_factory=dict)  # output pos -> values
    # get_cell contiguity memo: df -> {row_col -> min index or None}.
    # Weak-keyed on the DataFrame itself: id(df) would be reusable after
    # gc, letting a new frame inherit a stale contiguity base.
    _contig_base: "weakref.WeakKeyDictionary" = field(
        default_factory=weakref.WeakKeyDictionary, repr=False
    )

    def set_cell(self, row: int, column: str, value) -> None:
        self.cell_edits[(row, column)] = value

    def delete_row(self, row: int) -> None:
        self.deleted.add(row)

    def insert_row(self, position: int, values: list) -> None:
        self.inserts[position] = list(values)

    def clear(self) -> None:
        """discardChanges (parser.ts:864-868)."""
        self.cell_edits.clear()
        self.deleted.clear()
        self.inserts.clear()

    # -- replay ---------------------------------------------------------------

    def _anchor_rows(self, n_rows: int) -> dict[int, tuple[int, int]]:
        """Map each insert's output position -> (anchor original row, seq).

        Anchor r means "emit just before original row r" (r == n_rows means
        EOF). Mirrors the replay loop: at each output position, pending
        inserts emit first, then the surviving original row."""
        deletes = sorted(d for d in self.deleted if 0 <= d < n_rows)

        def emitted_before(r: int) -> int:
            # originals among [0, r) that survive deletion
            return r - bisect.bisect_left(deletes, r)

        anchors: dict[int, tuple[int, int]] = {}
        placed = 0
        for seq, pos in enumerate(sorted(self.inserts)):
            target = pos - placed  # originals that must precede this insert
            # smallest r with emitted_before(r) >= target
            lo, hi = 0, n_rows
            while lo < hi:
                mid = (lo + hi) // 2
                if emitted_before(mid) >= target:
                    hi = mid
                else:
                    lo = mid + 1
            anchors[pos] = (lo, seq)
            placed += 1
        return anchors

    def apply(self, df: DataFrame, row_col: str = ROW_IDX) -> DataFrame:
        """Replay the log over a DataFrame carrying file-order identity.

        Returns the edited frame with the same user-facing columns, ordered
        like the reference's saved file, with a fresh ``__row_idx``.

        Scale boundary: the renumbering and final replay-order windows are
        GLOBAL (single task) — correct for the operator's actual domain, an
        interactive edit log over one ordered file (the reference replays a
        user's manual edits, parser.ts:816-850). This is not a 100 TB path;
        batch mutations at scale belong in ordinary joins/filters/unions."""
        spark = df.sparkSession
        data_cols = [c for c in df.columns if c != row_col]

        # renumber to 0-based contiguous data rows (the reference's row ids)
        w = Window.orderBy(F.col(row_col))
        df = df.withColumn("__r", F.row_number().over(w) - 1).drop(row_col)

        n_rows = df.count()

        # 1. cell edits: tiny broadcast join per edited column
        by_col: dict[str, list[tuple[int, object]]] = {}
        for (r, c), v in self.cell_edits.items():
            by_col.setdefault(c, []).append((r, v))
        for c, pairs in by_col.items():
            if c not in data_cols:
                raise KeyError(f"unknown column {c!r}")
            edits = spark.createDataFrame(pairs, f"__r long, __edit_{c} string")
            df = df.join(F.broadcast(edits), "__r", "left")
            df = df.withColumn(
                c,
                F.when(F.col(f"__edit_{c}").isNotNull(), F.col(f"__edit_{c}")).otherwise(
                    F.col(c)
                ),
            ).drop(f"__edit_{c}")
        # NOTE: an explicit edit to NULL is indistinguishable from no-edit in
        # the join; the reference stores strings only (value ?? ""), same here.

        # 2. deletes
        if self.deleted:
            df = df.filter(~F.col("__r").isin(*self.deleted))

        # 3. inserts with replay-order sort keys
        # originals sort at (__r, 1, 0); an insert anchored before row r at
        # (r, 0, seq)
        base = df.select(
            F.col("__r").alias("__anchor"),
            F.lit(1).alias("__kind"),
            F.lit(0).alias("__seq"),
            *data_cols,
        )
        if self.inserts:
            anchors = self._anchor_rows(n_rows)
            rows = []
            for pos, values in self.inserts.items():
                anchor, seq = anchors[pos]
                padded = list(values)[: len(data_cols)]
                padded += [None] * (len(data_cols) - len(padded))
                rows.append((anchor, 0, seq, *[None if v is None else str(v) for v in padded]))
            ins = spark.createDataFrame(rows, base.schema)
            base = base.unionAll(ins)

        out = base.orderBy("__anchor", "__kind", "__seq")
        w2 = Window.orderBy("__anchor", "__kind", "__seq")
        return (
            out.withColumn(ROW_IDX, (F.row_number().over(w2) - 1).cast("long"))
            .drop("__anchor", "__kind", "__seq")
            .select(ROW_IDX, *data_cols)
        )

    def get_cell(self, df: DataFrame, row: int, column: str, row_col: str = ROW_IDX):
        """Point lookup with modifications applied (parser.ts:874-899).

        When the frame's ``row_col`` is contiguous (no gaps from skipped
        comment/blank lines), the lookup is a direct equality filter on the
        existing index — no global window. The contiguity probe is one tiny
        aggregation, memoized per frame."""
        if (row, column) in self.cell_edits:
            return self.cell_edits[(row, column)]
        if row in self.deleted:
            return None
        per_df = self._contig_base.setdefault(df, {})
        if row_col not in per_df:
            b = df.agg(
                F.min(row_col).alias("mn"),
                F.max(row_col).alias("mx"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            contiguous = b["n"] > 0 and b["mx"] - b["mn"] + 1 == b["n"]
            per_df[row_col] = b["mn"] if contiguous else None
        base = per_df[row_col]
        if base is not None:
            hit = df.filter(F.col(row_col) == base + row).select(column).collect()
        else:
            w = Window.orderBy(F.col(row_col))
            hit = (
                df.withColumn("__r", F.row_number().over(w) - 1)
                .filter(F.col("__r") == row)
                .select(column)
                .collect()
            )
        return hit[0][0] if hit else None
