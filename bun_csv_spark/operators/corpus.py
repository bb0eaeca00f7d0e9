"""Corpus-hygiene operators for training-data pipelines: repetition
filters, eval-set decontamination, cross-corpus dedup, mixture
statistics, and deterministic oversampling.

Extension surface beyond the reference (the reference stops at CSV-level
dedup; these are the document-level passes a 100 TB pretraining pipeline
runs between ingest and tokenization — the Gopher/MassiveText repetition
heuristics, benchmark decontamination, and mixture control).

Scale notes (SCALE.md has the table form):

- Repetition features are pure per-row Column expressions over token
  arrays — zero shuffles, whole-stage codegen, linear in corpus size.
  The top-n-gram mode count is O(u·g) per document (u distinct grams,
  g total) — bounded by document length, never by corpus size.
- Decontamination joins the corpus's exploded n-grams against the EVAL
  set's grams. The eval side is a fixed benchmark suite — bounded by the
  benchmark, not the corpus — so ``broadcast()`` is correct there (unlike
  corpus-sized builds, which this module never broadcasts).
- Cross-corpus dedup is a LEFT ANTI join on the md5 fingerprint: one
  shuffle on a 32-byte key, no payload movement; at 100 TB pre-bucket
  both corpora by fingerprint (operators.bucketing) and the anti join is
  shuffle-free.
- Oversampling is ``explode(sequence(1, k))`` — a map-side row
  multiplier, no shuffle; the deterministic hash-downsample half reuses
  ``operators.util.stratified_sample_hash`` (filter pushdown).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bun_csv_spark.functions.text import fingerprint, tokens

__all__ = [
    "word_ngrams_strict",
    "dup_fraction",
    "top_gram_fraction",
    "repetition_features",
    "repetition_keep",
    "decontaminate",
    "dedup_against",
    "mixture_stats",
    "oversample_by_factor",
]


def word_ngrams_strict(col: Column | str, n: int) -> Column:
    """Word n-gram array; docs with fewer than ``n`` tokens yield an
    EMPTY array (unlike ``functions.text.word_ngrams``, which degrades to
    a whole-text gram for Jaccard's benefit). Repetition statistics need
    the strict form: a 2-token doc has no 3-grams, and pretending it has
    one would count it as 100% duplicated."""
    return word_ngrams_strict_of(tokens(col), n)


def word_ngrams_strict_of(toks: Column, n: int) -> Column:
    """Strict word n-grams from a token-array Column. Hot paths should
    pass a NAMED column (projected as its own field first): an inline
    ``tokens()`` expression is re-evaluated once per GRAM by the slice
    lambda (higher-order functions run interpreted; outer subtrees in the
    lambda body are re-evaluated per element — r19, same lesson as
    dedup._doc_grams)."""
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def dup_fraction(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier element:
    ``1 - distinct/total`` (0.0 for empty arrays). The MassiveText
    duplicate-line / duplicate-n-gram fraction, on whatever unit the
    caller tokenized into (lines, words, n-grams)."""
    n = F.size(arr)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n,
    ).otherwise(F.lit(0.0))


def top_gram_fraction(arr: Column) -> Column:
    """Fraction of occurrences claimed by the single most frequent
    element — the Gopher "top n-gram character fraction" simplified to
    occurrence counts (engine-portable; the character-weighted variant
    multiplies by gram length). Computed as a per-row array fold: count
    each DISTINCT gram's occurrences, take the max. O(u·g) in document
    size, constant in corpus size."""
    n = F.size(arr)
    counts = F.transform(
        F.array_distinct(arr),
        lambda g: F.size(F.filter(arr, lambda x: x == g)),
    )
    return F.when(
        n > 0, F.array_max(counts).cast("double") / n
    ).otherwise(F.lit(0.0))


def repetition_features(col: Column | str) -> dict[str, Column]:
    """The repetition-filter feature set (MassiveText §A1.1 shape, on
    word units — the synthetic corpus has no newlines, so lines don't
    discriminate; callers with multi-line text add
    ``dup_fraction(F.split(c, '\\n'))`` the same way):

    - ``dup_word_frac``   fraction of tokens that repeat an earlier token
    - ``dup_2gram_frac``  fraction of word 2-grams that are repeats
    - ``dup_3gram_frac``  fraction of word 3-grams that are repeats
    - ``top_2gram_frac``  share of the most frequent 2-gram
    """
    c = F.col(col) if isinstance(col, str) else col
    return {
        "dup_word_frac": dup_fraction(tokens(c)),
        "dup_2gram_frac": dup_fraction(word_ngrams_strict(c, 2)),
        "dup_3gram_frac": dup_fraction(word_ngrams_strict(c, 3)),
        "top_2gram_frac": top_gram_fraction(word_ngrams_strict(c, 2)),
    }


def repetition_keep(
    col: Column | str,
    max_dup_2gram: float = 0.04,
    max_top_2gram: float = 0.05,
) -> Column:
    """Boolean keep-flag combining the repetition thresholds — documents
    above either bound are boilerplate/spam candidates. Defaults sit at
    the synthetic corpus's ~median so the flag actually discriminates in
    tests (MassiveText's production bounds are looser — 0.2 duplicate
    2-gram, 0.08 top 2-gram on web text); production pipelines tune
    per-source."""
    f = repetition_features(col)
    return (f["dup_2gram_frac"] <= max_dup_2gram) & (
        f["top_2gram_frac"] <= max_top_2gram
    )


def repetition_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_2gram: float = 0.04,
    max_top_2gram: float = 0.05,
) -> DataFrame:
    """Per-document repetition report: the ``repetition_features`` set
    (rounded to 6 dp) plus the ``keep`` flag, computed from STAGED token
    and n-gram arrays.

    Staging matters: Catalyst does not subexpression-eliminate across
    lambda (higher-order) expressions, so composing
    ``repetition_features`` + ``repetition_keep`` directly re-inlines the
    n-gram construction into every consumer — ~10× codegen/compile and
    runtime blowup measured at sf0.01. Building the arrays once behind a
    projection boundary keeps each array materialized per row and every
    metric a cheap scan over it."""
    c = F.col(text_col)
    # r19: grams build FROM the staged token array (word_ngrams_strict_of
    # on the named __t), not from the raw text — inlined, the slice
    # lambda re-tokenized the doc once per gram (O(tokens²) per row)
    staged = docs.select(id_col, tokens(c).alias("__t")).select(
        id_col,
        "__t",
        word_ngrams_strict_of(F.col("__t"), 2).alias("__g2"),
        word_ngrams_strict_of(F.col("__t"), 3).alias("__g3"),
    )
    raw = staged.select(
        id_col,
        dup_fraction(F.col("__t")).alias("__dw"),
        dup_fraction(F.col("__g2")).alias("__d2"),
        dup_fraction(F.col("__g3")).alias("__d3"),
        top_gram_fraction(F.col("__g2")).alias("__t2"),
    )
    return raw.select(
        id_col,
        F.round("__dw", 6).alias("dup_word_frac"),
        F.round("__d2", 6).alias("dup_2gram_frac"),
        F.round("__d3", 6).alias("dup_3gram_frac"),
        F.round("__t2", 6).alias("top_2gram_frac"),
        ((F.col("__d2") <= max_dup_2gram) & (F.col("__t2") <= max_top_2gram)).alias(
            "keep"
        ),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: count, per training document, how many
    of its word ``n``-grams appear anywhere in the eval set; a document
    with any hit is flagged ``contaminated``.

    Plan shape: both sides explode to DISTINCT (doc, gram) rows; the
    eval side collapses to a distinct gram set and is broadcast — eval
    suites are fixed-size (thousands of docs), NOT corpus-scaled, so the
    broadcast is bounded regardless of training-corpus size. The corpus
    side then left-joins (one pass, no shuffle of the corpus beyond the
    explode aggregation).

    Returns (id_col, n_hits bigint, contaminated boolean).
    """
    # r19: two-step projection — grams from the NAMED token array (an
    # inlined tokens() re-splits the text once per gram in the lambda)
    grams = lambda df: df.select(  # noqa: E731
        F.col(id_col), tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_strict_of(F.col("__toks"), n))
        ).alias("gram"),
    )
    eval_grams = F.broadcast(grams(eval_docs).select("gram").distinct())
    hits = (
        grams(docs)
        .join(eval_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dedup_against(
    corpus: DataFrame,
    reference_corpus: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus deduplication: drop every document whose normalized
    fingerprint already appears in ``reference_corpus`` (e.g. dedup a new
    crawl against the previous snapshot, or training data against a
    held-out set). LEFT ANTI join on the md5 fingerprint — one shuffle on
    a 32-byte key; bucket both sides by fingerprint at write time
    (operators.bucketing) to make it shuffle-free at 100 TB."""
    fp = fingerprint(text_col)
    ref = reference_corpus.select(fp.alias("__fp")).distinct()
    return corpus.withColumn("__fp", fp).join(ref, "__fp", "left_anti").drop("__fp")


def mixture_stats(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum corpus composition: document share, token share, mean
    document length — the numbers a mixture-weight decision is made from.
    One wide aggregation pass (single shuffle on the stratum key)."""
    toks = F.size(tokens(text_col)).cast("long")
    per = docs.select(F.col(by), toks.alias("__t"), F.length(text_col).alias("__c"))
    agg = per.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("n_tokens"),
        F.round(F.avg("__c"), 4).alias("mean_chars"),
    )
    tot = agg.agg(
        F.sum("n_docs").alias("__nd"), F.sum("n_tokens").alias("__nt")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        by,
        "n_docs",
        "n_tokens",
        "mean_chars",
        F.round(F.col("n_docs") / F.col("__nd"), 6).alias("doc_share"),
        F.round(F.col("n_tokens") / F.col("__nt"), 6).alias("token_share"),
    )


def oversample_by_factor(
    docs: DataFrame,
    factor_col: Column,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Mixture control by integer oversampling: repeat each row
    ``factor`` times, tagging the copy index (1-based ``epoch``) — how a
    pipeline upweights a small high-quality source without fractional
    sampling. ``explode(sequence(...))`` is a map-side row multiplier:
    no shuffle, and the multiplied rows never materialize on the driver.
    Rows with factor < 1 are dropped (factor 0 = exclude the source):
    ``sequence(1, n)`` with n < 1 auto-steps DOWNWARD in Spark (1,0,... —
    it would RE-EMIT the row), so the sequence is gated behind
    ``factor >= 1`` and ``explode`` of the resulting NULL drops the row,
    matching ``generate_series(1, n)``'s empty result in the oracle."""
    fac = factor_col.cast("int")
    seq = F.when(fac >= 1, F.sequence(F.lit(1), fac))
    return docs.withColumn(epoch_col, F.explode(seq)).withColumn(
        epoch_col, F.col(epoch_col).cast("long")
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_col: str, cap: int
) -> DataFrame:
    """Per-domain document cap — the CommonCrawl-pipeline rule "at most N
    documents per host" that stops one boilerplate-heavy domain from
    dominating a training mixture. Deterministic: keeps the first ``cap``
    rows per group in ``order_col`` order (pass a unique column).

    One shuffle on the group key (the same exchange a groupBy would take);
    the window never materializes a group in memory beyond the sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def quality_percentile_filter(
    df: DataFrame,
    score: Column,
    keep_top_fraction: float,
    exact: bool = True,
) -> DataFrame:
    """Keep the top ``keep_top_fraction`` of documents by ``score`` —
    percentile thresholding, the adaptive form of a fixed quality cutoff
    (a threshold that tracks the corpus instead of hard-coding 0.x).

    The score is a map-side expression; the threshold is ONE corpus-wide
    percentile aggregate brought back as a 1-row broadcast (never a
    corpus-sized collect). ``exact=True`` uses the sort-based exact
    percentile (oracle-replayable, single-reducer for the agg — fine to
    sf-scale); at 100 TB pass ``exact=False`` for t-digest
    ``approx_percentile``, which is map-side combinable."""
    scored = df.withColumn("__score", score)
    p = F.lit(1.0) - F.lit(keep_top_fraction)
    thr_expr = (
        F.percentile("__score", p) if exact else F.approx_percentile("__score", p)
    )
    thr = scored.agg(thr_expr.alias("__thr"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("__score") >= F.col("__thr"))
        .drop("__thr")
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", bucket_width: int = 10
) -> DataFrame:
    """Token-length histogram + corpus shares — the token-budget
    accounting a training run plans against (how much of the corpus sits
    in each sequence-length band). One shuffle on the bucket key; the
    totals are a broadcast 1-row aggregate over the (tiny) histogram, not
    the corpus. Returns (bucket_lo, n_docs, total_tokens, doc_share,
    token_share)."""
    n = F.size(tokens(text_col)).cast("long")
    per = df.select((n - n % bucket_width).alias("bucket_lo"), n.alias("__n"))
    hist = per.groupBy("bucket_lo").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__n").alias("total_tokens")
    )
    tot = hist.agg(
        F.sum("n_docs").alias("__nd"), F.sum("total_tokens").alias("__nt")
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "bucket_lo",
        "n_docs",
        "total_tokens",
        F.round(F.col("n_docs") / F.col("__nd"), 6).alias("doc_share"),
        F.round(F.col("total_tokens") / F.col("__nt"), 6).alias("token_share"),
    )


def boilerplate_prefix_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 64,
) -> DataFrame:
    """Template/boilerplate detection: documents sharing an identical
    first-``prefix_chars`` span (md5'd) — the cheap tell for scraped
    page templates, license headers, and mirrored articles that full
    near-dup may miss or spend bands on. One shuffle on a 32-byte key.
    Returns (prefix_fp, n_docs, keep_id) for groups of 2+ only."""
    fp = F.md5(F.substring(F.col(text_col), 1, prefix_chars))
    return (
        df.select(F.col(id_col), fp.alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def temperature_resample(
    df: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture resampling (the mT5/XLM-R α-weighting):
    source s with corpus share p_s is kept at a rate proportional to
    p_s^α / p_s — α < 1 upweights small sources, α = 1 preserves the
    mixture, α = 0 equalizes. ``target_frac`` sets the overall kept
    fraction; per-source rates cap at 1 (no upsampling here — compose
    ``oversample_by_factor`` for that).

    Deterministic: the keep decision is an md5-derived uniform per row
    (engine-portable, rerun-stable), so the same corpus always yields the
    same sample — a property shuffle-based samplers lose across Spark
    versions. Plan: one small groupBy for shares, rates broadcast back,
    filter map-side; the corpus itself never shuffles."""
    from pyspark.sql import Window

    hist = df.groupBy(by).agg(F.count(F.lit(1)).alias("__n"))
    rates = (
        # whole-frame windows over the SOURCE HISTOGRAM (tens of rows),
        # never the corpus
        # NB: name resolution is case-insensitive by default — "__N" would
        # silently resolve to "__n" (observed: rates all collapsed to
        # w/sw·target), hence "__tot"
        hist.withColumn("__tot", F.sum("__n").over(Window.partitionBy()))
        .withColumn("__w", F.pow(F.col("__n") / F.col("__tot"), F.lit(alpha)))
        .withColumn("__sw", F.sum("__w").over(Window.partitionBy()))
        .select(
            by,
            F.least(
                F.lit(1.0),
                (F.col("__w") / F.col("__sw"))
                * F.lit(target_frac)
                * F.col("__tot")
                / F.col("__n"),
            ).alias("__rate"),
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        df.join(F.broadcast(rates), by)
        .filter(u < F.col("__rate"))
        .drop("__rate")
    )


def token_budget_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 1_000_000,
    salt: str = "budget",
    n_buckets: int = 32,
) -> DataFrame:
    """Take ~``budget`` tokens from the corpus: hash docs into
    ``n_buckets`` independent groups by the leading bits of a
    deterministic md5 uniform, and within each group keep the
    hash-ordered prefix whose running token total stays inside that
    group's share of the budget — the "give me 1B tokens from this
    source" primitive a mixture schedule executes. Unbiased (the uniform
    is content-independent) and rerun-stable.

    Scale design: the running sum is ``Window.partitionBy(bucket)`` —
    there is NO global ordering window, so no single-partition funnel at
    100 TB; each bucket sorts independently after one hash shuffle.
    Budget split is exact and deterministic: floor(budget/n) per bucket
    plus one extra token of quota for the first budget%n buckets. The
    deviation vs the exact global greedy prefix is bounded by one
    document per bucket (each group may leave at most one doc's worth of
    quota unused)."""
    from pyspark.sql import Window

    n = F.size(tokens(text_col)).cast("long")
    u = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    staged = df.withColumn("__n_tok", n).withColumn("__u", u)
    # bucket = first byte of the same uniform -> [0, n_buckets); reuses
    # the hash already computed for ordering (one md5, two purposes)
    staged = staged.withColumn(
        "__b", F.conv(F.substring("__u", 1, 2), 16, 10).cast("long") % n_buckets
    )
    quota = F.lit(budget // n_buckets) + F.when(
        F.col("__b") < budget % n_buckets, F.lit(1)
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy("__b")
        .orderBy("__u")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        staged.withColumn("__cum", F.sum("__n_tok").over(w))
        .filter(F.col("__cum") <= quota)
        .drop("__u", "__b", "__cum")
    )


QUALITY_WEIGHTS = {
    # fixed, documented linear-model weights over quality_features — the
    # pluggable stand-in for a trained fastText/logreg quality classifier
    # (same feature plumbing, swap the weights)
    "bias": -1.0,
    "n_tokens": 0.02,
    "mean_token_len": 0.3,
    "stopword_ratio_en": 1.5,
}


def quality_score_linear(col: Column | str) -> Column:
    """Model-based quality score: sigmoid of a fixed linear combination
    of the ``quality_features`` set. Deterministic and engine-portable
    (exp/round are IEEE-identical for identical inputs); production
    swaps QUALITY_WEIGHTS for trained coefficients without touching the
    plan shape. Pure per-row expression — zero shuffles."""
    from bun_csv_spark.functions.text import quality_features

    f = quality_features(col)
    z = (
        F.lit(QUALITY_WEIGHTS["bias"])
        + f["n_tokens"].cast("double") * QUALITY_WEIGHTS["n_tokens"]
        + f["mean_token_len"] * QUALITY_WEIGHTS["mean_token_len"]
        + f["stopword_ratio_en"] * QUALITY_WEIGHTS["stopword_ratio_en"]
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def decontaminate_surgical(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Surgical decontamination: REMOVE the contaminated token spans
    instead of dropping whole documents — the GPT/Llama-style treatment
    that preserves the clean remainder of a long document whose one
    paragraph quotes a benchmark.

    Every token covered by any matching eval ``n``-gram is cut; the
    survivors re-join in order. Plan: corpus n-grams with start positions
    (one explode), semi-join against the broadcast eval gram set (bounded
    by the benchmark suite, not the corpus), hit starts expand to covered
    positions, token rows anti-join covered, and an ordered re-assembly
    aggregate. Shuffles: the hit/covered aggregates and the final
    per-doc groupBy — all keyed on doc id.

    Returns (id, clean_text, n_tokens_kept, n_tokens_cut); fully
    contaminated docs come back with empty clean_text, untouched docs
    come back intact."""
    toks_col = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks_col.alias("__t"))

    cnt = F.size(F.col("__t"))
    gram_structs = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.struct(
                i.cast("long").alias("start"),
                F.array_join(F.slice(F.col("__t"), i, n), " ").alias("gram"),
            ),
        ),
    )
    corpus_grams = base.select(
        F.col(id_col), F.explode(gram_structs).alias("g")
    ).select(id_col, F.col("g.start").alias("start"), F.col("g.gram").alias("gram"))

    eval_grams = F.broadcast(
        eval_docs.select(tokens(text_col).alias("__toks"))
        .select(
            F.explode(
                F.array_distinct(word_ngrams_strict_of(F.col("__toks"), n))
            ).alias("gram")
        )
        .distinct()
    )
    hits = corpus_grams.join(eval_grams, "gram", "left_semi")
    covered = hits.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("pos"),
    ).distinct()

    tok_rows = base.select(
        F.col(id_col), F.posexplode(F.col("__t")).alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "tok")
    clean = tok_rows.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = clean.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    totals = base.select(
        F.col(id_col), F.size(F.col("__t")).cast("long").alias("__n_total")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
            (F.col("__n_total") - F.coalesce("n_tokens_kept", F.lit(0)))
            .cast("long")
            .alias("n_tokens_cut"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    score_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-group quantile normalization of a score: percent_rank of
    ``score_col`` inside each ``group_col`` — the standard move before
    mixing quality scores across sources whose raw scales differ (one
    scorer's 0.7 is another's 0.9; their percentiles are comparable).

    Ties share a rank in both engines (rank-based, order within ties
    irrelevant), so the output is deterministic even for equal scores.
    One shuffle on the group key. Returns (id, group, score, qnorm)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score_col)
    return df.select(
        id_col,
        group_col,
        F.col(score_col).cast("long").alias("score"),
        F.round(F.percent_rank().over(w), 6).alias("qnorm"),
    )


def balanced_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    per_group: int = 50,
    salt: str = "balanced",
) -> DataFrame:
    """Equal-allocation stratified sample: the ``per_group`` docs with
    the smallest md5 uniform per stratum — deterministic, rerun-stable,
    and engine-portable (the same docs are chosen on any engine, unlike
    TABLESAMPLE). The counter-skew companion to proportional
    ``stratified_sample``: rare strata keep everything they have, huge
    strata are capped at the same allocation.

    One window shuffle on the stratum key; the ranked-prefix filter is
    the same bounded top-k-per-group shape the LSH bucket cap uses."""
    from pyspark.sql import Window

    from bun_csv_spark.functions.sketches import md5_uniform_long

    u = md5_uniform_long(id_col, salt)
    w = Window.partitionBy(group_col).orderBy("__u")
    return (
        df.withColumn("__u", u)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= per_group)
        .drop("__u", "__r")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    A-Res key (Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006): each row gets key = u^(1/w) with u uniform in
    (0, 1]; the k largest keys are a weighted sample without replacement.
    The mixture-building primitive the temperature/budget samplers can't
    express: pick exactly k docs with inclusion probability proportional
    to an arbitrary per-row weight (quality score, token count, domain
    boost).

    u is md5-derived (deterministic, rerun-stable, engine-portable — the
    same k rows are chosen on any engine); rows with weight <= 0 or NULL
    are excluded, matching the estimator's domain. Top-k by key is
    orderBy+limit → ``TakeOrderedAndProject``: a per-partition k-row heap
    and a k-row reduce at the driver — no global sort, no shuffle of the
    data, scales to any corpus size for sane k.

    Returns the sampled rows plus ``sample_key`` (rounded 9dp)."""
    from bun_csv_spark.functions.sketches import KMV_DOMAIN, md5_uniform_long

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # (hash+1)/2^60 lies in (0, 1] — never 0, so pow/log are safe
    u = (md5_uniform_long(id_col, salt) + F.lit(1)).cast("double") / F.lit(KMV_DOMAIN)
    key = F.pow(u, F.lit(1.0) / w.cast("double"))
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key", F.round(key, 9))
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str | Column,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Per-stratum Efraimidis–Spirakis weighted sample: the ``k`` rows
    with the largest A-Res keys WITHIN each group — weighted mixture
    allocation per source/language, where the global ``weighted_sample``
    would let a heavy stratum crowd out the rest.

    Same deterministic md5 key; the top-k-per-group is a ranked window
    on the group key (one keyed shuffle, the same bounded prefix shape
    as ``balanced_sample``) — the 9dp-rounded key with the id tiebreak
    makes the rank total and engine-portable. Returns the sampled rows
    plus ``sample_key``."""
    from pyspark.sql import Window

    from bun_csv_spark.functions.sketches import KMV_DOMAIN, md5_uniform_long

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (md5_uniform_long(id_col, salt) + F.lit(1)).cast("double") / F.lit(KMV_DOMAIN)
    key = F.round(F.pow(u, F.lit(1.0) / w.cast("double")), 9)
    win = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .withColumn("__r", F.row_number().over(win))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def curriculum_shards(
    df: DataFrame,
    difficulty_col: str = "n_chars",
    id_col: str = "doc_id",
    n_shards: int = 10,
) -> DataFrame:
    """Curriculum-ordering shards: assign each doc to one of ``n_shards``
    difficulty deciles. NOT ntile() — a global ranking window funnels the
    corpus through one partition. Instead the shard boundaries are ONE
    ungrouped exact-percentile aggregate (a 1-row broadcast) and the
    assignment is a map-side comparison against them; the plan is two
    linear scans and zero wide shuffles, the same bounds-broadcast shape
    as int8 quantization.

    Boundary semantics: shard i takes docs with
    bounds[i-1] < difficulty <= bounds[i] (upper-inclusive), so docs
    tied at a boundary land together — deterministic in both engines.
    Returns (id, difficulty, shard 1..n_shards)."""
    d = F.col(difficulty_col).cast("double")
    ps = [i / n_shards for i in range(1, n_shards)]
    bounds = df.agg(
        F.percentile(d, F.lit(ps)).alias("__bounds")
    )
    shard = F.lit(1)
    for i in range(len(ps)):
        shard = shard + F.when(d > F.element_at("__bounds", i + 1), 1).otherwise(0)
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            id_col,
            F.col(difficulty_col).cast("long").alias("difficulty"),
            shard.cast("long").alias("shard"),
        )
    )


def robust_scale(
    df: DataFrame,
    score_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Median/IQR scaling of a score within each group — the
    outlier-robust companion to quantile normalization when downstream
    wants a CENTERED score rather than a rank.

    Per-group stats are ONE grouped exact-percentile aggregate (state =
    three doubles per group) broadcast back onto the corpus — group
    cardinality is source-count-sized, a dimension, never corpus-sized.
    Zero-IQR groups (constant scores) yield explicit NULL rather than
    engine-specific division-by-zero behavior."""
    d = F.col(score_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.percentile(d, F.lit([0.25, 0.5, 0.75])).alias("__q")
    )
    med = F.element_at("__q", 2)
    iqr = F.element_at("__q", 3) - F.element_at("__q", 1)
    scaled = F.when(iqr > 0, (d - med) / iqr)
    return (
        df.join(F.broadcast(stats), group_col)
        .select(
            id_col,
            group_col,
            F.col(score_col).cast("long").alias("score"),
            F.round(scaled, 6).alias("scaled"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    neardup_pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    id_a: str = "id_a",
    id_b: str = "id_b",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment where near-duplicate documents NEVER
    straddle splits — the leakage-safe version of ``util.hash_split``.

    A doc in the val split with a near-twin in train leaks evaluation
    signal; plain per-doc hash splitting does this to every duplicate
    cluster with probability ~1-sum(w_i^2). Here each connected
    component of the near-dup graph moves as a unit: docs are labeled
    with their component's canonical (min-id) label, singletons label
    themselves, and the md5-uniform split rule is applied to the LABEL
    rather than the doc id.

    Scale design: connected components runs over the EDGE LIST only
    (near-dup pairs, vastly smaller than the corpus); the resulting
    (node, label) table is duplicate-bounded, so the join back to the
    corpus broadcasts. One map-side split expression after that —
    the corpus itself is never shuffled. Adds ``split`` and
    ``split_group`` columns."""
    from bun_csv_spark.operators.dedup import connected_components
    from bun_csv_spark.operators.util import hash_split

    labels = connected_components(neardup_pairs, id_a=id_a, id_b=id_b)
    labeled = docs.join(
        F.broadcast(labels), docs[id_col] == labels["node"], "left"
    ).select(
        docs["*"],
        F.coalesce(labels["label"], docs[id_col]).alias("split_group"),
    )
    return hash_split(labeled, "split_group", weights, salt=salt)
