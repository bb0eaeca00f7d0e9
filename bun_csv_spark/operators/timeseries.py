"""Event-time series operators over epoch-nanos longs.

All event-time math runs on the exact nanos longs the events source
exposes (sources/events.py) — no timestamp codec, no session-timezone
dependence. Every operator is a keyed window or a keyed aggregate: the
only shuffles are on the entity key (user), so the plans scale with the
number of entities, not with a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000


def rolling_range_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 1800,
) -> DataFrame:
    """Trailing event-TIME window (RANGE, not ROWS): per key, the mean
    and count of ``value`` over the last ``window_sec`` seconds up to and
    including the current event. Irregular event spacing is the point —
    a rows-window would mean a different wall-clock span per row.

    One shuffle on the key; the range frame is evaluated with a sliding
    two-pointer pass over each partition's sort — no per-row rescans."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-window_sec * NS_PER_SEC, 0)
    )
    return df.select(
        "event_id",
        key_col,
        F.round(F.avg(value_col).over(w), 4).alias("roll_avg"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


def decay_weighted_sum(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_sec: int = 86400,
) -> DataFrame:
    """Exponential time-decay aggregate: sum(value * 0.5^(age/half_life))
    per key, with age measured from the corpus' max timestamp.

    The reference epoch is ONE ungrouped max — a 1-row broadcast, never a
    per-row subquery. Weights are computed map-side; the only wide op is
    the final keyed aggregate. Deterministic: the exponent's input is an
    exact long delta scaled by an exact power of two denominator."""
    ref = df.agg(F.max(F.col(ts_col).cast("long")).alias("__ref"))
    age = (F.col("__ref") - F.col(ts_col).cast("long")).cast("double")
    weight = F.pow(F.lit(0.5), age / F.lit(float(half_life_sec * NS_PER_SEC)))
    return (
        df.crossJoin(F.broadcast(ref))
        .groupBy(key_col)
        .agg(
            F.round(F.sum(F.col(value_col) * weight), 6).alias("decayed_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def trailing_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_break_col: str = "event_id",
    n_trailing: int = 20,
    threshold: float = 2.0,
) -> DataFrame:
    """Anomaly flags: z-score of each event's value against the TRAILING
    ``n_trailing`` events of the same key (the current row excluded, so a
    spike can't mask itself). Rows without a full trailing window are
    dropped — both engines would otherwise disagree on sub-sample
    stddev NULL semantics.

    One shuffle on the key; avg/stddev share the frame scan."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).cast("long"), order_break_col)
        .rowsBetween(-n_trailing, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev(value_col).over(w)
    n = F.count(F.lit(1)).over(w)
    # zero-variance window -> NULL z explicitly: ANSI Spark raises on /0
    # and engines disagree on float-div-by-zero otherwise
    z = F.when(sd > 0, (F.col(value_col) - mu) / sd)
    return (
        df.select(
            "event_id",
            key_col,
            F.col(value_col),
            n.alias("__n"),
            F.round(z, 4).alias("zscore"),
        )
        .filter((F.col("__n") == n_trailing))
        .withColumn("is_anomaly", F.abs(F.col("zscore")) > threshold)
        .drop("__n")
    )


def funnel_stages(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: how far each key progressed through ``stages``,
    where stage N counts only if it happened STRICTLY AFTER the key's
    first completion of stage N-1 (the classic conversion-funnel rule —
    a purchase before the first view is not a conversion).

    Plan: one shuffle on the key, then one unordered aggregate window per
    stage over the same partitioning (no sort, no joins, no self-reads of
    the fact table per stage). Returns (key, funnel_stage)."""
    ts_long = F.col(ts_col).cast("long")
    out = df.select(key_col, ts_long.alias("__ts"), F.col(type_col).alias("__et"))
    w = Window.partitionBy(key_col)
    prev = None
    stage_cols = []
    for i, stage in enumerate(stages):
        cond = F.col("__et") == stage
        if prev is not None:
            cond = cond & (F.col("__ts") > F.col(prev))
        name = f"__t{i}"
        out = out.withColumn(name, F.min(F.when(cond, F.col("__ts"))).over(w))
        stage_cols.append(name)
        prev = name
    per_key = out.groupBy(key_col).agg(
        *[F.max(c).alias(c) for c in stage_cols]
    )
    stage_expr = F.lit(0)
    for i, c in enumerate(stage_cols):
        stage_expr = F.when(F.col(c).isNotNull(), i + 1).otherwise(stage_expr)
    return per_key.select(key_col, stage_expr.cast("long").alias("funnel_stage"))


def temporal_holdout_split(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_break_col: str = "event_id",
    test_frac: float = 0.2,
) -> DataFrame:
    """Leakage-free per-entity temporal split: each key's LAST
    ceil(test_frac * n) events (by event time) are held out as test, the
    rest train — the evaluation regime for behavioral models, where a
    random split would leak the future into training.

    One shuffle on the key (count + reverse-time rank share the
    partitioning). ceil() of the same IEEE product is computed in both
    engines, so boundary rows land identically. Returns
    (event_id, key, split)."""
    kw = Window.partitionBy(key_col)
    w = kw.orderBy(
        F.col(ts_col).cast("long").desc(), F.col(order_break_col).desc()
    )
    n = F.count(F.lit(1)).over(kw)
    r = F.row_number().over(w)
    split = F.when(
        r <= F.ceil(n * F.lit(test_frac)), F.lit("test")
    ).otherwise(F.lit("train"))
    return df.select("event_id", key_col, split.alias("split"))


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_break_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for each (prev_state, state) pair, how often does an
    entity's event of type ``prev_state`` get immediately followed by
    ``state``, and what fraction of all transitions out of ``prev_state``
    is that — the session-flow / funnel-discovery summary (page-path
    analysis) the funnel operator's fixed stage list can't express.

    Plan: one lag window per entity (single keyed shuffle — sequences
    stay inside their entity partition, so cost scales with entities,
    not a global sort), then a (prev, curr) count aggregate, then the
    out-of-prev normalizer as a second tiny aggregate over the already
    STATE×STATE-sized counts — never a second pass over the events.
    Ordering is made total with ``order_break_col`` so same-timestamp
    events transition deterministically on any engine.

    Returns (prev_state, state, n double-rounded prob 6dp) rows.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).cast("long"), F.col(order_break_col)
    )
    pairs = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_state"), F.col(state_col).alias("state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out_total = Window.partitionBy("prev_state")
    return pairs.select(
        "prev_state",
        "state",
        "n",
        F.round(F.col("n") / F.sum("n").over(out_total), 6).alias("prob"),
    )


def last_touch_attribution(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    conversion: str = "purchase",
    order_break_col: str = "event_id",
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion`` event is
    credited to the entity's most recent PRECEDING non-conversion event
    (the "touch"); conversions with no prior touch credit ``None`` —
    the marketing/funnel-credit summary a plain transition matrix can't
    answer because it needs lookback across arbitrarily many
    intermediate conversions.

    Plan: one ``last(ignorenulls)`` window per entity over a bounded
    frame (unbounded preceding .. 1 preceding) — the identical
    union-and-carry shape the as-of join uses, ONE keyed shuffle, cost
    independent of how far back the touch sits. Ordering is made total
    with ``order_break_col``. Returns (touch_state, n_conversions)
    rows."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).cast("long"), F.col(order_break_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(state_col) != conversion, F.col(state_col)), ignorenulls=True
    ).over(w)
    return (
        df.withColumn("__touch", touch)
        .filter(F.col(state_col) == conversion)
        .groupBy(F.col("__touch").alias("touch_state"))
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


def retention_cohorts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_ns: int = 86_400_000_000_000,
) -> DataFrame:
    """Cohort retention matrix: entities grouped by the period of their
    FIRST event (the cohort); for each later period offset, how many of
    the cohort were active and what fraction — the canonical
    product-analytics rollup (cohort x offset retention triangle).

    Plan: per-entity first-event period (one keyed aggregate), distinct
    (entity, period) activity (a second aggregate, map-side combined),
    an equi-join on the entity key, then a COHORT x OFFSET-sized count —
    two data shuffles total, both on the entity key, and the retention
    matrix itself is bounded by periods², never by entities. cohort_size
    re-derives from the offset-0 row of the same matrix (every entity is
    active in its first period by definition), so no third pass.

    Returns (cohort_period, period_offset, n_active, retention 6dp)."""
    # exact integral division: a double quotient of epoch-nanos can land
    # one period off at the boundary (same pitfall as temporal._bk)
    period = F.expr(f"cast(`{ts_col}` as bigint) div {period_ns}")
    firsts = (
        df.select(key_col, period.alias("__p"))
        .groupBy(key_col)
        .agg(F.min("__p").alias("__cohort"))
    )
    activity = df.select(key_col, period.alias("__p")).distinct()
    matrix = (
        activity.join(firsts, key_col)
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    base = matrix.filter(F.col("period_offset") == 0).select(
        F.col("cohort_period").alias("__c0"), F.col("n_active").alias("__size")
    )
    return (
        matrix.join(F.broadcast(base), matrix["cohort_period"] == F.col("__c0"))
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("__size"), 6).alias("retention"),
        )
    )


def ohlc_resample(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    bucket: str = "hour",
    tiebreak_col: str = "event_id",
    strict_ties: bool = True,
) -> DataFrame:
    """Open/high/low/close resampling — the candlestick/downsampling
    aggregate every time-series store ships (first/last/min/max of a
    value per key per time bucket).

    All four stats come from ONE aggregate: high/low are plain min/max,
    open/close are min_by/max_by over a total order. Two orderings:

    - ``strict_ties=True`` (default): zero-padded ``(ts, tiebreak)``
      string key — total ordering by construction, deterministic on any
      engine/partitioning even when timestamps collide (relying on
      data-unique timestamps is a silent nondeterminism trap). Cost:
      string agg buffers are not hash-aggregable, so Spark plans a
      SortAggregate — still partial+final combinable with ONE exchange,
      but with a per-task sort on the group key.
    - ``strict_ties=False``: order by the epoch-nanos long alone —
      whole-stage-codegen HashAggregate (the fast path). Correct
      whenever ``ts_col`` is unique per (bucket, key) group; ties pick
      an arbitrary-but-valid row.

    Either way partial states are one (key, value) pair per group per
    task, so the single shuffle carries O(tasks x groups) rows and the
    plan is identical at any scale. ``ts_col`` is epoch-nanos (the
    events-table convention; see sources.events.ensure_ts_nanos).
    """
    from bun_csv_spark.functions.timefmt import ns_to_ntz

    key_cols = ["event_type"] if key_cols is None else key_cols
    if strict_ties:
        order_key = F.format_string(
            "%020d|%020d", F.col(ts_col).cast("long"), F.col(tiebreak_col).cast("long")
        )
    else:
        order_key = F.col(ts_col).cast("long")
    bucket_col = F.date_format(
        F.date_trunc(bucket, ns_to_ntz(ts_col).cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss",
    )
    v = F.col(value_col)
    return (
        df.withColumn("__ok", order_key)
        .groupBy(bucket_col.alias("bucket"), *key_cols)
        .agg(
            F.min_by(v, F.col("__ok")).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, F.col("__ok")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
