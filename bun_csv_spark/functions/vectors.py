"""Vector math over array<float|double> columns — pure built-in expressions.

Dot products fold left in array order (F.aggregate), so results are
bit-deterministic for a given vector pair — important both for oracle
comparison and for reproducible ANN results across cluster re-runs.

At 100 TB scale these expressions run inside whole-stage codegen; no Arrow
transfer, no Python. For very high dimensions (>4k) a Pandas-UDF BLAS path
would win — not needed at dim=64-1024.
"""

from __future__ import annotations

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
