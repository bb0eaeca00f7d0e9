"""CDC changelog apply, Bloom semi-join, Z-order clustering."""

from pyspark.sql import functions as F

from bun_csv_spark.operators.maintenance import (
    apply_changelog,
    bloom_semi_join,
    cluster_by_zorder,
    zorder_value,
)


def test_apply_changelog_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 2, "U"),   # update
            (2, "stale", 1, "U"),  # older version must lose
            (3, "c", 2, "D"),    # delete
            (4, "d", 1, "U"),    # insert
        ],
        "id long, val string, version long, op string",
    )
    out = {r.id: r.val for r in apply_changelog(snap, changes, "id").collect()}
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_apply_changelog_delete_then_reinsert_latest_wins(spark):
    snap = spark.createDataFrame([(1, "a")], "id long, val string")
    changes = spark.createDataFrame(
        [(1, "x", 2, "D"), (1, "re", 3, "U")],
        "id long, val string, version long, op string",
    )
    out = {r.id: r.val for r in apply_changelog(snap, changes, "id").collect()}
    assert out == {1: "re"}


def test_bloom_semi_join_no_false_negatives_and_deterministic(spark):
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.range(0, 2000, 7).select(F.col("id").alias("k"))  # ~286 keys
    out1 = {r.k for r in bloom_semi_join(probe, build, "k").collect()}
    out2 = {r.k for r in bloom_semi_join(probe, build, "k").collect()}
    true_keys = set(range(0, 2000, 7))
    assert true_keys <= out1          # a Bloom filter NEVER drops a member
    assert out1 == out2               # FP set is md5-deterministic
    # 64 Kbit / k=3 / 286 keys -> expected FP rate ~1e-5; anything beyond
    # a small handful of extras means the bitmap is broken
    assert len(out1 - true_keys) < 50


def test_bloom_semi_join_plan_is_broadcast_only(spark):
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    build = spark.range(0, 10).select(F.col("id").alias("k"))
    out = bloom_semi_join(probe, build, "k")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # 1-row bitmap map broadcast (bounds-broadcast crossJoin pattern)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # probe side must never shuffle-join


def test_zorder_value_interleave():
    import itertools

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    rows = [(a, b) for a, b in itertools.product([0, 85, 170, 255], repeat=2)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_value("a", "b", 0, 255, 0, 255, bits=8).alias("z")
        ).collect()
    }

    def interleave(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == interleave(a, b), (a, b)


def test_cluster_by_zorder_narrows_file_ranges(spark):
    import random

    rng = random.Random(11)
    rows = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "x long, y long")
    clustered = cluster_by_zorder(df, "x", "y", 0, 1000, 0, 1000, bits=8, n_files=8)

    def mean_area(frame):
        stats = (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("x") - F.min("x")).alias("rx"),
                (F.max("y") - F.min("y")).alias("ry"),
            )
            .collect()
        )
        return sum(r.rx * r.ry for r in stats) / len(stats)

    # random layout: every partition spans ~the whole 1000x1000 square;
    # z-ordered partitions cover compact sub-regions
    assert mean_area(clustered) < mean_area(df.repartition(8)) * 0.5
