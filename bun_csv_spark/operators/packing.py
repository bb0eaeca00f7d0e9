"""Sequence packing — grouping documents into fixed token budgets for
training batches (the step between dedup/quality filtering and the
trainer's data loader).

Scale design: packing is inherently order-dependent, and a single global
ordering would serialize on one task. So documents are first sharded
(hash or caller-provided shard), and packing runs independently within
each shard — one shuffle, every shard packed in parallel, deterministic
for a fixed (shard, order) pair. Cross-shard packs never exist, which is
exactly how distributed training shards its data files anyway.

The fill rule is contiguous ("streaming fill"): a document belongs to
pack p when its starting token offset falls in [p·budget, (p+1)·budget).
A document longer than the budget overflows its pack rather than being
split — pair with ``functions.text.chunk_tokens`` upstream to bound
document length first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    budget: int,
    order_col: str,
    n_shards: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign (shard, pack_id, pack_pos) to every row.

    ``pack_id`` is the contiguous-fill pack within the shard (see module
    docstring); ``pack_pos`` is the row's 0-based position inside its
    pack. One shuffle (by shard), window arithmetic only."""
    if shard_col is None:
        df = df.withColumn(
            "shard", F.pmod(F.hash(F.col(order_col)), F.lit(n_shards))
        )
        shard_col = "shard"
    w = Window.partitionBy(shard_col).orderBy(order_col)
    cum_excl = F.coalesce(
        F.sum(token_count_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    out = df.withColumn(
        "pack_id", F.floor(cum_excl / F.lit(budget)).cast("long")
    )
    w_pack = Window.partitionBy(shard_col, "pack_id").orderBy(order_col)
    return out.withColumn(
        "pack_pos", (F.row_number().over(w_pack) - 1).cast("long")
    )
