"""Deterministic k-means over an embedding column — corpus clustering
for data curation (domain discovery, diversity sampling, semantic
mixture balancing).

Extension surface beyond the reference (which has no vector ops). The
loop is Lloyd's algorithm with every arbitrary choice pinned so the
result is engine-reproducible (the DuckDB oracle replays it bit-for-bit):

- init: the k vectors with the smallest ids (no random restarts);
- distances rounded to 6 dp before the argmin, ties broken by cluster id
  (ULP-level sum-order differences between engines can't flip an
  assignment);
- centroid coordinates rounded to 6 dp after every update (so iteration
  i+1 starts from identical constants in both engines).

Scale shape: per iteration, assignment is a broadcast of k centroids
(k·dim doubles — fixed by the caller, NOT corpus-scaled) against a pure
map over the corpus, then the update is ONE posexplode + two-level
aggregation (partial map-side combine on (cluster, pos)). No iteration
shuffles the corpus by anything other than the aggregation; the corpus
itself is never collected or broadcast. At 100 TB this is the standard
Spark k-means plan (MLlib's is the same broadcast-assign/agg-update
loop, RDD-based); `localCheckpoint` between iterations would truncate
the lineage for large iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans"]


def _dist(vec, cen):
    """Euclidean distance between two array<double> columns, rounded to
    6 dp: a sequential left fold (zip_with + aggregate), the same
    evaluation order DuckDB's list_distance uses."""
    d2 = F.aggregate(
        F.zip_with(vec, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(F.sqrt(d2), 6)


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns (id_col, cluster bigint,
    dist double) — the final assignment and its (rounded) distance.

    A cluster that loses all members simply disappears from the next
    round's centroid set (deterministic in both engines); callers that
    need exactly k clusters re-seed, which is a policy choice left out
    of the operator.
    """
    pts = embeddings.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )

    # deterministic init: the k smallest ids, coordinates rounded like
    # every later centroid so iteration 1 sees 6-dp constants
    centroids = (
        pts.orderBy("__id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("__id")).cast("long").alias("__cid"),
            F.transform("__v", lambda x: F.round(x, 6)).alias("__c"),
        )
    )

    assigned = None
    for _ in range(iters):
        scored = pts.crossJoin(F.broadcast(centroids)).select(
            "__id", "__v", "__cid", _dist(F.col("__v"), F.col("__c")).alias("__d")
        )
        # argmin over (rounded distance, cluster id): min_by on the pair
        # struct — one aggregation, no window over the corpus
        assigned = scored.groupBy("__id").agg(
            F.min_by("__cid", F.struct("__d", "__cid")).alias("__cid"),
            F.min(F.struct("__d", "__cid")).getField("__d").alias("__d"),
            F.first("__v").alias("__v"),
        )
        # update: element-wise mean per cluster via posexplode + two-level
        # agg, rebuilt into an array ordered by position
        centroids = (
            assigned.select("__cid", F.posexplode("__v").alias("__pos", "__x"))
            .groupBy("__cid", "__pos")
            .agg(F.round(F.avg("__x"), 6).alias("__m"))
            .groupBy("__cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                    lambda s: s.getField("__m"),
                ).alias("__c")
            )
        )

    # final assignment against the last update's centroids
    final = (
        pts.crossJoin(F.broadcast(centroids))
        .select("__id", "__cid", _dist(F.col("__v"), F.col("__c")).alias("__d"))
        .groupBy("__id")
        .agg(
            F.min_by("__cid", F.struct("__d", "__cid")).alias("cluster"),
            F.min(F.struct("__d", "__cid")).getField("__d").alias("dist"),
        )
    )
    return final.select(
        F.col("__id").alias(id_col), F.col("cluster").cast("long"), "dist"
    )
