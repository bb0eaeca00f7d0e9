"""Vector math over array<float|double> columns — pure built-in expressions.

Dot products fold left in array order (F.aggregate), so results are
bit-deterministic for a given vector pair — important both for oracle
comparison and for reproducible ANN results across cluster re-runs.

At 100 TB scale these expressions run inside whole-stage codegen; no Arrow
transfer, no Python. For very high dimensions (>4k) a Pandas-UDF BLAS path
would win — not needed at dim=64-1024.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    av = _c(a)
    sq = F.aggregate(
        av, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    num = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, num / denom).otherwise(F.lit(0.0))


def const_l2_norm(vec) -> float:
    """Driver-side l2 norm of a CONSTANT vector, bit-identical to
    evaluating ``l2_norm(dlit(vec))`` in-plan: the same left fold of
    IEEE-double multiply-adds and the same correctly-rounded sqrt
    (asserted exactly in test_similarity). Lets constant query/centroid
    norms fold at plan-build time instead of re-aggregating a literal
    array once per corpus row."""
    acc = 0.0
    for x in vec:
        fx = float(x)
        acc = acc + fx * fx
    return math.sqrt(acc)


def cosine_similarity_const(a: Column | str, qvec) -> Column:
    """``cosine_similarity(a, dlit(qvec))`` for a CONSTANT query vector,
    with the query norm folded driver-side (r18, guide §4 "heavyweight
    init once" applied to expression constants): the generic form carries
    ``SQRT(aggregate(<literal array>))`` in the plan, ~2·dim wasted FLOPs
    per corpus row (A/B at sf0.1: ann_brute_force 0.332 → 0.247 s
    noop-forced best-of-5, results bit-equal). Same guard, same operand
    order, so the result is bit-identical to the generic form."""
    q = [float(x) for x in qvec]
    num = dot(a, dlit(q))
    denom = l2_norm(a) * F.lit(const_l2_norm(q))
    return F.when(denom > 0, num / denom).otherwise(F.lit(0.0))


def dim_bounds(df, vec_col: str, dim: int):
    """Per-dimension (min, max) over the whole corpus as ONE 1-row
    aggregate: 2·dim scalar min/max expressions, all map-side combinable,
    so the reduce moves a single row regardless of corpus size — no
    posexplode (which would shuffle n·dim rows at 100 TB). Returns a
    1-row DataFrame with columns mn_0..mn_{d-1}, mx_0..mx_{d-1}."""
    v = F.col(vec_col)
    aggs = []
    for i in range(dim):
        e = F.element_at(v, i + 1).cast("double")
        aggs.append(F.min(e).alias(f"mn_{i}"))
        aggs.append(F.max(e).alias(f"mx_{i}"))
    return df.agg(*aggs)


def quantize_int8(df, id_col: str, vec_col: str, dim: int):
    """Corpus min-max int8-style quantization — the memory-bound-scan
    optimization real ANN deployments apply before a 100 TB corpus scan
    (4x smaller vectors, cache-resident distance kernels).

    Two passes: (1) ``dim_bounds`` (one combinable aggregate, 1-row
    result); (2) a map-only projection quantizing every component against
    the broadcast bounds: q = floor((x - mn) * 255 / (mx - mn) + 0.5),
    clamped degenerate dims (mx == mn) to 0. Output is FLAT
    (id, pos, q) rows — oracle-hashable (array columns crash the driver
    canon) and the shape a columnar sink wants."""
    bounds = dim_bounds(df, vec_col, dim)
    mins = F.array(*[F.col(f"mn_{i}") for i in range(dim)])
    maxs = F.array(*[F.col(f"mx_{i}") for i in range(dim)])
    joined = df.select(id_col, vec_col).crossJoin(F.broadcast(bounds))
    exploded = joined.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
        mins.alias("__mns"),
        maxs.alias("__mxs"),
    )
    mn = F.element_at("__mns", F.col("pos") + 1)
    mx = F.element_at("__mxs", F.col("pos") + 1)
    q = F.when(mx == mn, F.lit(0).cast("long")).otherwise(
        F.floor((F.col("x").cast("double") - mn) * 255 / (mx - mn) + 0.5)
    )
    return exploded.select(
        id_col, F.col("pos").cast("long").alias("pos"), q.cast("long").alias("q")
    )

def dlit(vals):
    """Nested double-array literal in ONE py4j roundtrip. PySpark's
    ``F.lit(list)`` / ``F.array(*[F.lit(x) ...])`` issue one JVM call
    PER ELEMENT, so plan construction for literal-heavy expressions
    (ANN codebooks, LSH plane matrices) costs seconds of pure
    driver-side py4j traffic (measured r13: pq_encode_expr built for
    5.75 s at 8x16x8 elements, 0.81 s with this). A SQL string parsed
    by ``F.expr`` builds the identical Literal tree JVM-side in one
    call; values cannot drift — ``repr(float)`` emits the shortest
    round-trip decimal and both Python's float() and the SQL lexer's
    Double.parseDouble map it to the same IEEE double."""
    def fmt(v):
        if isinstance(v, (list, tuple)):
            if len(v) == 0:
                # array() types as array<void> and breaks downstream
                # zip_with/element_at typing — fail loudly instead
                raise ValueError("dlit: empty array literal not supported")
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        f = float(v)
        if f != f or f in (float("inf"), float("-inf")):
            # repr() would emit 'nanD'/'infD' — unparseable SQL tokens;
            # the old F.lit(float) path accepted these, so keep parity
            return f"CAST('{f}' AS DOUBLE)"
        return repr(f) + "D"

    return F.expr(fmt(vals))


def llit(vals) -> Column:
    """1-D bigint-array literal in one py4j roundtrip (see dlit)."""
    vals = list(vals)
    if not vals:
        raise ValueError("llit: empty array literal not supported")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")
