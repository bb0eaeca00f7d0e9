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


def user_event_sequences(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events: int | None = 64,
):
    """Behavioral training sequences: each user's events, time-ordered and
    serialized to one token string — the events-to-training-data bridge a
    recommendation/agent corpus builds (the text twin of sequence
    packing's token side).

    One shuffle on the user key; the per-user collect is bounded by
    ``max_events`` (most recent kept), so a bot account can't blow up a
    task. Returns (user, n_events, seq) with seq = "type@ts type@ts ..."
    in ascending time order, ties broken by event id order embedded in
    ts uniqueness."""
    from pyspark.sql import functions as F

    ev = events.select(
        F.col(user_col),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")).alias("__e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e")).alias("__seq")
    )
    if max_events is not None:
        # keep the most RECENT max_events (suffix of the ascending sort)
        per_user = per_user.withColumn(
            "__seq",
            F.when(
                F.size("__seq") > max_events,
                F.slice(F.col("__seq"), -max_events, max_events),
            ).otherwise(F.col("__seq")),
        )
    return per_user.select(
        user_col,
        F.size("__seq").cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.col("__seq"),
                lambda e: F.concat(e["et"], F.lit("@"), e["ts"].cast("string")),
            ),
            " ",
        ).alias("seq"),
    )
