"""Deterministic, engine-portable cardinality sketches.

Spark's ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` (HLL) use different hash functions and register
layouts, so their estimates can never be compared value-for-value. The KMV
(k-minimum-values) sketch here is built from md5 — both engines compute
the identical hash, so the estimate itself is bit-reproducible and
oracle-checkable, while keeping the sketch property that matters at
100 TB: per-group state is k values, not the distinct set.

KMV estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002): hash values to uniform [0, 1); with U_(k) the k-th
smallest distinct hash, E[distinct] ~= (k-1) / U_(k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash domain: 15 hex chars -> exact integers in [0, 2^60)
KMV_DOMAIN = float(1 << 60)


def md5_uniform_long(col: Column | str, salt: str) -> Column:
    """Exact integer hash in [0, 2^60) — md5-derived, engine-portable.

    Kept as a LONG (not double) so DISTINCT and ordering are exact; divide
    by ``KMV_DOMAIN`` only at estimate time."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
    prune_buckets: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via the KMV sketch.

    Plan: distinct (group, hash) pairs — the map-side combine collapses
    duplicates before the shuffle (keyed on BOTH columns, so even one
    viral group spreads) — then the same two-level exact ranked prune
    as ``kmv_state_by``: a (group, hash mod ``prune_buckets``) pre-rank
    bounds the final per-group window at prune_buckets*k rows, so a hot
    group's full distinct set never lands on one reducer. Groups with
    fewer than k distinct values report the EXACT count (the sketch
    holds the whole distinct set below k). At 100 TB the per-group
    state after ranking is k longs regardless of group size.

    Returns (key_cols..., est_distinct double rounded to 4dp).
    """
    u = md5_uniform_long(value_col, salt)
    d = df.select(*key_cols, u.alias("__u")).distinct()
    if prune_buckets > 1:
        w1 = Window.partitionBy(
            *key_cols, F.pmod(F.col("__u"), F.lit(prune_buckets))
        ).orderBy("__u")
        d = (
            d.withColumn("__r", F.row_number().over(w1))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    w = Window.partitionBy(*key_cols).orderBy("__u")
    ranked = d.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    per = ranked.groupBy(*key_cols).agg(
        F.max("__u").alias("__uk"), F.count(F.lit(1)).alias("__n")
    )
    est = (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_DOMAIN) / F.col("__uk"))
    )
    return per.select(*key_cols, F.round(est, 4).alias("est_distinct"))


def kmv_state(
    df: DataFrame, value_col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """The ungrouped KMV (bottom-k / theta-sketch) STATE: the ``k``
    smallest DISTINCT md5-uniform hashes of the column, as a <=k-row
    single-column table (h). Mergeable — the k smallest of the union of
    two states IS the state of the union (Beyer et al., "On synopses for
    distinct-value estimation under multiset operations", SIGMOD 2007).

    Plan: distinct collapses duplicates map-side, then
    TakeOrderedAndProject keeps k rows per partition and reduces — never
    a global sort; the state is broadcastable at any corpus size.

    NULL values are excluded (like histogram_state): a NULL hashes to
    NULL, which Spark's ascending sort would place FIRST — permanently
    occupying a bottom-k slot, skewing every estimate, and diverging
    from SQL engines that sort NULLs last."""
    u = md5_uniform_long(value_col, salt)
    return (
        df.select(u.alias("h")).filter(F.col("h").isNotNull())
        .distinct().orderBy("h").limit(k)
    )


def kmv_merge(*states: DataFrame, k: int = 256) -> DataFrame:
    """Merge KMV states (same salt): the k smallest of the union of the
    states IS the state of the unioned inputs (Beyer et al. 2007) —
    idempotent and order-free like the HLL register max-merge, so
    duplicated or re-sent shards merge safely. All inputs are <=k rows;
    the merge never touches the corpora."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_set_estimates(
    state_a: DataFrame, state_b: DataFrame, k: int = 256
) -> DataFrame:
    """Distinct-set ALGEBRA from two KMV states alone (Beyer et al.
    2007): |A| and |B| from each state, |A∪B| from the merged bottom-k,
    |A∩B| = (rho/K) * |A∪B| where rho counts members of the merged
    state present in BOTH input states, Jaccard = rho/K. A state with
    fewer than k rows holds its ENTIRE distinct hash set, so small
    inputs degrade to EXACT counts (and rho/K collapses to the exact
    intersection).

    This is the decontamination pre-flight for two 100 TB crawls: one
    scan per corpus builds its state; every join/aggregate here runs on
    <= 2k rows. Returns ONE row: (est_distinct_a, est_distinct_b,
    est_union rounded 4dp, est_intersection_e4, est_jaccard_e4).

    The two rho/K-derived outputs are fixed-point longs
    (floor(x * 10000)), NOT round(x, 4) doubles: rho/K is an exact
    multiple of 1/K, so at e.g. K=512 values like 16/512 = 0.03125 land
    exactly on .xxxx5 ties where Spark's HALF_UP and DuckDB's
    scaled-double rounding disagree (the same cross-engine hazard
    maintenance.finalize_agg_state documents). floor-of-scaled is pure
    IEEE and engine-portable. The max/ratio estimates (est_distinct_*,
    est_union) keep round(): their values are quotients of 60-bit
    hashes and never land on a decimal tie. Two EMPTY states yield
    K = 0; the rho/K columns are defined as 0 in that case rather than
    a divide-by-zero NULL (or an error under ANSI mode)."""
    kk = F.lit(float(k - 1)) * F.lit(KMV_DOMAIN)

    def side(st, tag):
        return st.agg(
            F.count(F.lit(1)).alias(f"__n{tag}"), F.max("h").alias(f"__mx{tag}")
        )

    merged = kmv_merge(state_a, state_b, k=k)
    mstats = merged.agg(
        F.count(F.lit(1)).alias("__K"), F.max("h").alias("__uK")
    )
    rho = (
        merged.join(state_a.withColumnRenamed("h", "ha"), F.col("h") == F.col("ha"))
        .join(state_b.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"))
        .agg(F.count(F.lit(1)).alias("__rho"))
    )

    def est(n, mx):
        return F.when(n < k, n.cast("double")).otherwise(kk / mx)

    row = (
        side(state_a, "a")
        .crossJoin(side(state_b, "b"))
        .crossJoin(mstats)
        .crossJoin(rho)
    )
    union_est = est(F.col("__K"), F.col("__uK"))
    ratio = F.col("__rho") / F.col("__K")

    def e4(x):
        return F.when(F.col("__K") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x * 10000).cast("long")
        )

    return row.select(
        F.round(est(F.col("__na"), F.col("__mxa")), 4).alias("est_distinct_a"),
        F.round(est(F.col("__nb"), F.col("__mxb")), 4).alias("est_distinct_b"),
        F.round(union_est, 4).alias("est_union"),
        e4(ratio * union_est).alias("est_intersection_e4"),
        e4(ratio).alias("est_jaccard_e4"),
    )


def kmv_state_by(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    k: int = 256,
    salt: str = "kmv",
    prune_buckets: int = 32,
) -> DataFrame:
    """PER-GROUP KMV bottom-k states: (group_cols..., h), <=k rows per
    group — ``kmv_state`` lifted to one sketch per key, so "overlap
    between corpus A and B *per domain*" costs one scan per corpus
    instead of one scan per (corpus, domain). Same mergeable bottom-k
    algebra (Beyer et al. 2007) per group.

    Plan: distinct (group, hash) collapses duplicates map-side (that
    shuffle keys on (group, hash) — well spread even when one domain
    dominates), then TWO ranked windows: a pre-prune partitioned on
    (group, hash mod ``prune_buckets``) keeps <=k rows per sub-bucket,
    so the final per-group rank reads at most prune_buckets*k rows per
    group instead of the group's whole distinct set. The prune is EXACT
    (the k smallest per group are among the k smallest of each
    sub-bucket) and is what keeps a viral domain with billions of
    distinct shingles from serializing one reducer at 100 TB. The
    post-rank state is <=k longs per group regardless of group size.
    NULL values are excluded for the same reasons as ``kmv_state``."""
    u = md5_uniform_long(value_col, salt)
    d = (
        df.select(*group_cols, u.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    if prune_buckets > 1:
        w1 = Window.partitionBy(
            *group_cols, F.pmod(F.col("h"), F.lit(prune_buckets))
        ).orderBy("h")
        d = (
            d.withColumn("__r", F.row_number().over(w1))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_merge_by(
    *states: DataFrame, group_cols: "list[str]", k: int = 256
) -> DataFrame:
    """Merge per-group KMV states (same salt): per group, the k smallest
    of the union of the states IS the state of the unioned inputs —
    associative, commutative, idempotent, so daily shards merge in any
    grouping (the mergeable-family law the nightly pipeline relies on).
    All inputs are state-sized (<=k rows per group); the merge never
    touches the corpora."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        out.distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_set_estimates_by(
    state_a: DataFrame,
    state_b: DataFrame,
    group_cols: "list[str]",
    k: int = 256,
) -> DataFrame:
    """Per-group distinct-set algebra from two per-group KMV state
    tables (``kmv_state_by``): one row per group present in EITHER
    state, with the same five figures (and the same fixed-point e4
    encoding for the rho/K-derived two) as ``kmv_set_estimates``.
    A group present on one side only reports est_* = 0 for the missing
    side and Jaccard 0. Every group in the output has K >= 1 by
    construction (it appears via a non-NULL hash), so no zero guard is
    needed on the ratios.

    Everything here runs on state-sized tables (<=k rows per group):
    one window re-rank for the merge, per-group aggregates, and
    group+hash semi-joins for rho — nothing corpus-sized."""
    kk = F.lit(float(k - 1)) * F.lit(KMV_DOMAIN)
    gc = list(group_cols)
    merged = kmv_merge_by(state_a, state_b, group_cols=gc, k=k)

    def side(st, tag):
        return st.groupBy(*gc).agg(
            F.count(F.lit(1)).alias(f"__n{tag}"), F.max("h").alias(f"__mx{tag}")
        )

    mstats = merged.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("__K"), F.max("h").alias("__uK")
    )
    rho = (
        merged.join(state_a, [*gc, "h"], "left_semi")
        .join(state_b, [*gc, "h"], "left_semi")
        .groupBy(*gc)
        .agg(F.count(F.lit(1)).alias("__rho"))
    )
    base = (
        mstats.join(side(state_a, "a"), gc, "left")
        .join(side(state_b, "b"), gc, "left")
        .join(rho, gc, "left")
    )

    def est(n, mx):
        return F.when(n < k, n.cast("double")).otherwise(kk / mx)

    na = F.coalesce(F.col("__na"), F.lit(0))
    nb = F.coalesce(F.col("__nb"), F.lit(0))
    union_est = est(F.col("__K"), F.col("__uK"))
    ratio = F.coalesce(F.col("__rho"), F.lit(0)) / F.col("__K")

    def e4(x):
        return F.floor(x * 10000).cast("long")

    return base.select(
        *gc,
        F.round(est(na, F.col("__mxa")), 4).alias("est_distinct_a"),
        F.round(est(nb, F.col("__mxb")), 4).alias("est_distinct_b"),
        F.round(union_est, 4).alias("est_union"),
        e4(ratio * union_est).alias("est_intersection_e4"),
        e4(ratio).alias("est_jaccard_e4"),
    )


#: HLL register width: 13 hex chars = 52 bits of hash tail per register,
#: so 2^(53-rho) is an exact LONG and register sums are integer-exact
#: (order-independent — double sums of 2^-rho would round differently
#: between Spark's and DuckDB's reduction orders).
HLL_TAIL_HEX = 13


def _hll_alpha(m: int) -> float:
    """Bias constant from Flajolet et al., "HyperLogLog: the analysis of a
    near-optimal cardinality estimation algorithm" (AofA 2007), Fig. 3."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic HyperLogLog.

    Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's HLL hash
    differently, so their estimates can never be value-compared. This
    sketch derives every register from md5 — identical in both engines —
    so the ESTIMATE itself is bit-reproducible and oracle-checkable, while
    keeping HLL's scale property: per-group state is m = 2^p registers
    (one shuffle carrying at most m rows per group after the map-side
    max-combine), never the distinct set.

    Register layout: the md5 hex digest splits into a ``p``-bit bucket
    (first p/4 hex chars; p must be a multiple of 4) and a 52-bit tail;
    rho = leading-zero bits of the tail + 1, computed with string ops
    (regexp strip of leading '0' chars + a 15-way CASE on the first
    nonzero char) that restate verbatim in DuckDB SQL. Register sums use
    exact integers (2^(53-rho) as LONG) so no floating-point reduction
    order can perturb the estimate. Includes the small-range linear-
    counting correction (E <= 2.5m with empty registers).

    Standard error ~= 1.04/sqrt(m) (~6.5% at p=8). Returns
    (key_cols..., est_distinct double rounded to 4dp).
    """
    return hll_estimate(hll_registers(df, key_cols, value_col, p, salt), key_cols, p)


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """The HLL sketch STATE as a table: (key_cols..., bucket, max_rho) —
    at most 2^p rows per group. This is the mergeable/persistable half
    of ``hll_distinct``: write it per partition/day/shard, then
    ``hll_merge`` register tables and ``hll_estimate`` the union — the
    incremental-pipeline shape (same as operators.maintenance's
    incremental_agg, but for DISTINCT counts, which plain partial sums
    cannot carry)."""
    if p % 4 != 0:
        raise ValueError("p must be a multiple of 4 (hex-char bucket split)")
    bucket_hex = p // 4
    c = F.col(value_col)
    digest = F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string")))
    bucket = F.conv(F.substring(digest, 1, bucket_hex), 16, 10).cast("long")
    tail = F.substring(digest, bucket_hex + 1, HLL_TAIL_HEX)
    stripped = F.regexp_replace(tail, "^0+", "")
    first = F.substring(stripped, 1, 1)
    lz_in_char = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.length(stripped) == 0, F.lit(4 * HLL_TAIL_HEX + 1)).otherwise(
        F.lit(4) * (F.lit(HLL_TAIL_HEX) - F.length(stripped)) + lz_in_char + F.lit(1)
    )
    return (
        df.select(*key_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*key_cols, "__b")
        .agg(F.max("__rho").alias("__M"))
    )


def hll_merge(*register_tables: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge HLL register tables (same p and salt): union + per-register
    max. Lossless by construction — max is associative/commutative/
    idempotent, so merge(est(A), est(B)) == est(A ∪ B) EXACTLY, late or
    duplicated shards can be re-merged safely, and incremental distinct
    counting needs no re-scan of history."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*key_cols, "__b").agg(F.max("__M").alias("__M"))


def hll_estimate(regs: DataFrame, key_cols: list[str], p: int = 8) -> DataFrame:
    """Estimate from a register table (see ``hll_distinct`` for the
    estimator and portability notes)."""
    m = 1 << p
    # 2^(53-M) is exact as a double for M in [1, 53] and fits a LONG
    word = F.pow(F.lit(2.0), (F.lit(53) - F.col("__M")).cast("double")).cast("long")
    per = regs.groupBy(*key_cols).agg(
        F.sum(word).alias("__z"), F.count(F.lit(1)).alias("__nb")
    )
    two53 = float(1 << 53)
    zeros = F.lit(m) - F.col("__nb")
    z_total = F.col("__z").cast("double") / F.lit(two53) + zeros.cast("double")
    raw = F.lit(_hll_alpha(m) * m * m) / z_total
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per.select(*key_cols, F.round(est, 4).alias("est_distinct"))


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    n_bins: int = 1000,
) -> DataFrame:
    """Approximate quantiles by equi-width histogram interpolation — the
    mergeable, bounded-state alternative to an exact percentile when the
    column no longer fits a single sort: the aggregate state is
    ``n_bins`` counters regardless of row count, and two histograms
    merge by adding counters (incremental/partitioned recompute safe).

    Spark's ``percentile_approx`` and DuckDB's ``approx_quantile`` use
    different sketches and can never be value-compared; this one is
    plain arithmetic (bin = floor((x-min)/w), cumulative counts, linear
    interpolation inside the straddling bin), so the ESTIMATE is
    engine-portable and oracle-checked. Error is bounded by one bin
    width. Bounds come from a 1-row min/max aggregate broadcast back —
    the same bounds-broadcast shape as embedding quantization.

    Returns one row per requested quantile: (q, est)."""
    v = F.col(value_col).cast("double")
    bounds = df.select(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"), F.count(v).alias("__n")
    )
    b = df.crossJoin(F.broadcast(bounds))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    # degenerate domain (all values equal): width is 0 and the bin
    # expression would be 0/0 = NaN — pin every value to bin 0 so each
    # quantile interpolates to __lo, identically in any engine
    bin_ = F.when(F.col("__hi") == F.col("__lo"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((v - F.col("__lo")) / width).cast("long"), F.lit(n_bins - 1)
        )
    )
    hist = (
        b.filter(v.isNotNull())
        .groupBy(bin_.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # global-order window over the HISTOGRAM only: <= n_bins rows on one
    # partition, bounded by construction, never by the data
    w = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("__cum", F.sum("__c").over(w)).crossJoin(
        F.broadcast(bounds)
    )
    # ONE pass for all quantiles: explode the q list over the bounded
    # cumulative histogram, keep the first straddling bin per q
    withq = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    rank = F.col("q") * (F.col("__n") - 1) + 1  # target rank in [1, n]
    frac = (rank - (F.col("__cum") - F.col("__c"))) / F.col("__c")
    est = (
        F.col("__lo")
        + (F.col("__bin") + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)))
        * (F.col("__hi") - F.col("__lo"))
        / F.lit(float(n_bins))
    )
    return (
        withq.filter(F.col("__cum") >= rank)
        .withColumn("__est", F.round(est, 6))
        .groupBy("q")
        .agg(F.min_by("__est", "__bin").alias("est"))
    )


def _cm_positions(value: Column, depth: int, width: int, salt: str) -> Column:
    """The sketch addresses of one value: array of (row, col) structs,
    one per hash row — md5-derived so Spark and any SQL oracle compute
    the identical counter layout."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(md5_uniform_long(value, f"{salt}{j}"), F.lit(width)).alias(
                    "col"
                ),
            )
            for j in range(depth)
        ]
    )


def cm_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as
    a (row, col, cnt) counter table — at most ``depth * width`` rows.

    Scale design: the explode multiplies rows by ``depth``, but the
    groupBy's map-side combine collapses every task's contribution to
    <= depth*width partial counters before the single shuffle, so shuffle
    volume is O(tasks * depth * width) — independent of input size, the
    whole point of sketching at 100 TB. The counter table is mergeable
    across shards/days by (row, col) sum (``cm_merge``), the frequency
    analogue of ``hll_registers``/``hll_merge`` for distinct counts.

    Reference parity note: the reference has no sketches; this extends
    its stats surface (reference src/stats.ts) with bounded-state
    frequency estimation.
    """
    c = F.col(value_col).cast("string")
    return (
        df.select(F.explode(_cm_positions(c, depth, width, salt)).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min counter tables (same depth/width/salt): union +
    per-counter sum. Exact: counters are linear, so
    merge(sketch(A), sketch(B)) == sketch(A ++ B) row-for-row."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the sketch for each candidate value: min over the
    ``depth`` addressed counters — the classic never-underestimates
    answer (est >= true count; over by collisions only).

    The sketch is <= depth*width rows — broadcast it; the candidate side
    never shuffles for the lookup. Candidates absent from the sketched
    data read counter 0 via the left join's coalesce."""
    c = F.col(value_col).cast("string")
    probes = candidates.select(
        value_col, F.explode(_cm_positions(c, depth, width, salt)).alias("p")
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (probes["p.row"] == sketch["row"]) & (probes["p.col"] == sketch["col"]),
            "left",
        )
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def cm_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    with the same depth/width/salt: |A JOIN B on k| = sum_v fA(v)*fB(v),
    estimated as min over hash rows of the counter inner product
    (Cormode & Muthukrishnan 2005, sec. 4.3 — never underestimates;
    expected overshoot ~ |A|*|B|/width, so size width accordingly).

    This is the shuffle-free answer to "how big is this join going to
    be": both sketches are bounded tables built with one scan each, the
    product is a depth*width-row join — no key shuffle of either input.
    Returns one row: est_join_size."""
    a, b = sk_a.alias("a"), sk_b.alias("b")
    return (
        a.join(b, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("__ip"))
        .agg(F.min("__ip").alias("est_join_size"))
    )


def histogram_state(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """The quantile sketch's STATE as a table: (key_cols..., bin, cnt)
    with CALLER-FIXED ``[lo, hi)`` bounds — the persistable/mergeable
    half of ``histogram_quantiles`` (which derives bounds from the data
    and is therefore whole-corpus only). Fixing the domain up front is
    what makes per-shard/per-day states MERGEABLE: every shard bins
    identically, so ``histogram_merge`` is a plain counter sum — the
    same incremental-pipeline shape as ``hll_registers``/``cm_sketch``.
    Out-of-range values clamp to the edge bins (count preserved, like
    any production histogram). State is <= n_bins rows per key."""
    key_cols = key_cols or []
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(*key_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(
    *states: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Merge histogram states (same lo/hi/n_bins): union + per-bin sum.
    Exact — counters are linear, so merge(state(A), state(B)) ==
    state(A ++ B) row-for-row; late or re-sent shards re-merge safely
    only if delivered exactly once (sums are not idempotent — dedupe
    shards upstream, unlike the max-merge HLL registers)."""
    key_cols = key_cols or []
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_state_quantiles(
    state: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 128,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram state — same linear
    interpolation as ``histogram_quantiles`` (rank = q*(n-1)+1 inside
    the straddling bin), but per key group. The cumulative window runs
    over <= n_bins rows PER KEY (partitioned by the key, bounded by
    construction); output is one row per (key, q)."""
    key_cols = key_cols or []
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*key_cols).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(*key_cols)
    cum = state.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(wn)
    )
    withq = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    rank = F.col("q") * (F.col("__n") - 1) + 1
    frac = (rank - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
    est = (
        F.lit(lo)
        + (F.col("bin") + F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)))
        * F.lit(width)
    )
    return (
        withq.filter(F.col("__cum") >= rank)
        .withColumn("__est", F.round(est, 6))
        .groupBy(*key_cols, "q")
        .agg(F.min_by("__est", "bin").alias("est"))
    )
