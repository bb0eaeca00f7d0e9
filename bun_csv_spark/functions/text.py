"""Text-analysis column expressions for large-scale document pipelines.

Extension surface beyond the reference (BASELINE.json north star): language
ID, quality scoring, token counting, fingerprinting, shingling. Everything
is built-in Column expressions — no Python UDFs — so the hot path stays in
whole-stage codegen and scales linearly with executors.

Shingling uses sequence+transform+substring instead of exploding through a
UDF: at 100 TB the explode itself dominates, so the per-row array build must
be JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword tables for the n-gram/stopword-vote language
# heuristic. Deliberately small and deterministic (no external models).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"),
    "es": ("el", "la", "de", "que", "los", "es", "en", "una", "por", "con"),
}

_PUNCT_RE = r"[^\p{L}\p{N}\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-ish proxy: word-piece segments = runs of letters / digits /
    single punctuation, roughly what a byte-pair tokenizer counts. Cheap,
    deterministic, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces).cast("long")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    stop = LANG_STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_features(col: Column | str) -> dict[str, Column]:
    """The quality-scoring feature set as named columns: length, token
    count, mean token length, punctuation/digit ratios, stopword ratio.

    r18: the stopword ratio lowercases the SHARED token array instead of
    calling ``stopword_ratio`` (which re-tokenizes ``lower(text)`` with a
    second regex split + array build per row — lowercasing commutes with
    whitespace splitting, so ``filter(toks, lower(t) ∈ stop)`` is
    value-identical; A/B at sf0.1: text_quality 0.392 → 0.325 s
    noop-forced best-of-5, results bit-equal)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_toks = F.size(toks)
    total_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop = LANG_STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stop)))
    return {
        "n_chars_calc": F.length(c).cast("long"),
        "n_tokens": n_toks.cast("long"),
        "mean_token_len": F.when(
            n_toks > 0, total_tok_len.cast("double") / n_toks
        ).otherwise(F.lit(0.0)),
        "punct_ratio": punct_ratio(c),
        "digit_ratio": digit_ratio(c),
        "stopword_ratio_en": F.when(
            n_toks > 0, stop_hits.cast("double") / n_toks
        ).otherwise(F.lit(0.0)),
    }


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.

    Used by fingerprint-dedup; md5 is deliberate (stable across engines,
    exact-match friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-gram shingle array, JVM-side (sequence + substring).

    Text shorter than k yields a single shingle of the whole text so short
    docs still participate in MinHash."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(c, i, k))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram array (for n-gram Jaccard dedup).

    PERFORMANCE (r19): this inlines the tokenization INSIDE the per-gram
    slice lambda, and higher-order-function lambdas re-evaluate outer
    subtrees per ELEMENT — the gram build is O(tokens²) per row this
    way. Hot paths should project ``tokens(col)`` as a NAMED column
    first and call ``word_ngrams_of`` on it (attribute references are
    O(1) per element); see dedup.ngram_jaccard_pairs."""
    return word_ngrams_of(tokens(col), n)


def word_ngrams_of(toks: Column, n: int = 3) -> Column:
    """Word n-grams from a token-array Column. Pass an ALREADY-NAMED
    column (projected as its own field in a preceding select) on hot
    paths — an inline ``tokens()`` expression here is re-evaluated once
    per GRAM by the slice lambda (r19 plan read: the split CASE sat
    inside the lambda body of the committed ngram gates' plans)."""
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(cnt >= n,
                  F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
                  ).otherwise(F.array(F.array_join(toks, " ")))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-vote score per language (hits / tokens)."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    n = F.size(toks)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        # bind `words` via a factory — pyspark lambdas must take Column
        # params only (a default arg would be treated as a lambda param)
        pred = (lambda ws: (lambda t: t.isin(*ws)))(words)
        hits = F.size(F.filter(toks, pred))
        out[lang] = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
    return out


def detect_language(col: Column | str) -> Column:
    """Pick the language with the max stopword score; 'und' when all zero."""
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(v.alias("score"), F.lit(k).alias("lang")) for k, v in scores.items()]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# training-data preparation: chunking, redaction
# ---------------------------------------------------------------------------

# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB/others): no backreferences, no lookaround
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d -]{7,}\d"


def redact_pii(col: Column | str) -> Column:
    """Scrub common PII spans (emails, IPv4 addresses, +international
    phone numbers) with typed placeholder tokens — a standard
    training-data hygiene pass. Pure chained ``regexp_replace`` (codegen,
    no UDF); patterns are engine-portable. Order matters: emails first so
    their host parts aren't half-eaten by the IP rule."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def chunk_tokens(
    col: Column | str, max_tokens: int = 128, overlap: int = 16
) -> Column:
    """Split a document into overlapping token-window chunks — the
    standard long-document preparation for a fixed-context trainer.

    Returns ``array<struct<chunk_idx, chunk_text, n_tokens>>`` built
    entirely from array expressions (sequence + slice + array_join): no
    explode here, so callers decide when to flatten (keeping the per-doc
    work a pure map until then). Chunk i starts at token
    ``i * (max_tokens - overlap)``; the final chunk may be short; empty
    docs yield one empty chunk."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = tokens(col)
    n = F.size(toks)
    stride = max_tokens - overlap
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(F.slice(toks, i * stride + 1, max_tokens), " ").alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(max_tokens))
            .cast("long")
            .alias("n_tokens"),
        ),
    )


def array_entropy(arr: Column) -> Column:
    """Shannon entropy (bits/element) of an array's element distribution:
    per-distinct-element counts as an O(u·n) fold (u = distinct values),
    then -Σ (c/n)·log2(c/n). Empty array -> 0.0.

    Pass a MATERIALIZED column (stage the array in a prior select):
    Catalyst does not CSE across lambda bodies, so handing in a derived
    expression re-computes it once per distinct element."""
    n = F.size(arr)
    counts = F.transform(
        F.array_distinct(arr),
        lambda ch: F.size(F.filter(arr, lambda x: x == ch)),
    )
    terms = F.transform(
        counts,
        lambda cnt: (cnt.cast("double") / n) * F.log2(cnt.cast("double") / n),
    )
    ent = -F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    low-entropy tell for keyboard-mash, padding, and generated spam
    (Gopher-family quality signal). Zero shuffles.

    Convenience composition; for hot paths stage the char array once and
    call ``array_entropy`` on the staged column (see q_char_entropy) —
    composing inline re-derives the char array per distinct char."""
    c = F.col(col) if isinstance(col, str) else col
    return array_entropy(char_shingles(c, 1))


def build_inverted_index(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_terms: int = 100,
):
    """Bounded inverted index: postings (term, doc_id, df) for the
    ``top_terms`` highest-document-frequency terms (ties broken by term,
    so the cut is deterministic).

    Plan: distinct per-doc terms explode -> df aggregate ->
    TakeOrdered(top_terms) -> broadcast semi-join back onto the postings.
    The index is bounded by the term budget, never by the vocabulary; the
    posting explode is the only corpus-scaled stage and it shuffles on
    the 1-term key only for the df count."""
    posting = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("term"),
    )
    df_counts = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = df_counts.orderBy(F.col("df").desc(), "term").limit(top_terms)
    return posting.join(F.broadcast(top), "term").select("term", id_col, "df")


def nfc_normalize_udf(col: Column | str) -> Column:
    """Unicode NFC normalization (compose combining sequences) — an
    Arrow-batched pandas_udf because Spark has no normalization builtin.
    The canonical first step of a text-dedup pipeline: visually identical
    strings with different combining-mark encodings must hash equal."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(c)


def strip_accents_udf(col: Column | str) -> Column:
    """Accent folding: NFD-decompose, drop combining marks (category Mn),
    keep everything else — 'Café' -> 'Cafe'. Matches DuckDB's
    strip_accents on Latin text (the oracle checks exactly that)."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        import unicodedata

        def f(x):
            if x is None:
                return None
            return "".join(
                ch
                for ch in unicodedata.normalize("NFD", x)
                if unicodedata.category(ch) != "Mn"
            )

        return s.map(f)

    return _strip(c)


def compression_ratio_udf(col: Column | str, level: int = 6) -> Column:
    """zlib-compressed size / raw size — the classic cheap quality signal
    (highly repetitive or templated text compresses far below ~0.4;
    natural prose sits around 0.4-0.7). Arrow-batched; zlib at a fixed
    level is deterministic for a given library, so results are
    rerun-stable (no SQL oracle can restate it — the gate is rows-only
    by design)."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def f(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(f)

    return _ratio(c)


def char_bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Character-bigram language-model quality score — the KenLM-style
    perplexity filter of production corpus pipelines (CCNet / Wenzhong
    et al.), scaled down to a self-trained char bigram model: docs whose
    character sequences are improbable under the corpus's own statistics
    (mojibake, binary spills, boilerplate markup) score high perplexity
    and can be thresholded out.

    P(c2|c1) = (count(c1c2) + alpha) / (count(c1·) + alpha·V) with add-
    alpha smoothing; V = the corpus's distinct successor-character count.
    Per doc: mean log-likelihood per bigram and its perplexity
    exp(-mean).

    Plan: ONE explode of the text into bigram windows (O(total chars)
    rows, the same cost as tokenization), immediately collapsed to a
    per-(doc, bigram) histogram — within-doc bigram repeats (most of a
    natural-language stream) reduce map-side, so everything downstream
    runs on per-doc-DISTINCT bigrams, a fraction of the raw stream. The
    model is a second aggregate over those already-reduced rows (at most
    |Σ|² rows per task), broadcast back for the score join; the mean
    log-likelihood is the count-weighted sum over the histogram —
    algebraically the plain mean over the stream, without re-exploding
    it. Everything is md5-free exact counting: the oracle restates it
    verbatim (in the same weighted form, so FP reduction shapes match).

    Returns (id, n_bigrams, logprob rounded 6dp, ppx rounded 4dp)."""
    c = F.col(text_col)
    dbg = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.length(c) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.length(c) - 1),
                        lambda i: F.substring(c, i, 2),
                    ),
                )
            ).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    model = dbg.groupBy("bg").agg(F.sum("__cnt").alias("__nbg"))
    prefix = model.groupBy(F.substring("bg", 1, 1).alias("__c1")).agg(
        F.sum("__nbg").alias("__npre")
    )
    v = model.select(
        F.countDistinct(F.substring("bg", 2, 1)).alias("__V")
    )
    probs = (
        model.join(F.broadcast(prefix), F.substring("bg", 1, 1) == F.col("__c1"))
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            (
                (F.col("__nbg") + F.lit(alpha))
                / (F.col("__npre") + F.lit(alpha) * F.col("__V"))
            ).alias("__p"),
        )
    )
    scored = dbg.join(F.broadcast(probs), "bg")
    out = scored.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_bigrams"),
        (F.sum(F.col("__cnt") * F.log("__p")) / F.sum("__cnt")).alias("__lp"),
    )
    return out.select(
        id_col,
        "n_bigrams",
        F.round("__lp", 6).alias("logprob"),
        F.round(F.exp(-F.col("__lp")), 4).alias("ppx"),
    )
