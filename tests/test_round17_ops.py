"""Round-17: the plan linter at the user surface.

  * broadcast-fanout-budget — the info-tier cluster advisory (VERDICT
    r16 #4): a broadcast that measures as a wash on one box still ships
    build-size x executor-count on a real cluster, so any adopted
    non-aggregate broadcast whose build pipeline reads >= the budget in
    raw scan bytes gets an advisory, even when every trap rule is
    silent. Info severity: it never gates (the single-box wash
    adjudications in tools/lint_registry.py stay rc=0), it makes the
    recorded caveat CHECKABLE.
  * global-sort — previously dead in formatted mode (the rule matched
    simple-mode text, but plan_text uses formatted mode, where the
    global flag lives in the node's Arguments detail block). Found
    while building the CLI command; pinned here.
  * bcsv lint — the CLI command exposing plans.lint.lint_plan to the
    reference's own persona (VERDICT r16 #2): lints a CSV/parquet scan
    (plus the CLI pipeline flags) or a user .py pipeline file, renders
    findings through the standard table/csv/json renderers, exits 1 on
    any warn/error finding and 0 on clean-or-info-only.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from bun_csv_spark.cli.main import main
from bun_csv_spark.plans.lint import FANOUT_BUDGET, lint_plan

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


@contextlib.contextmanager
def _threshold(spark, value):
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _fanout(df, budget=None):
    return [
        f
        for f in lint_plan(df, fanout_budget=budget)
        if f.code == "broadcast-fanout-budget"
    ]


# --- broadcast-fanout-budget -------------------------------------------


def test_fanout_budget_fires_on_big_adopted_broadcast(spark):
    """An explicit F.broadcast of a non-aggregate build whose scans
    total >= the budget gets the info advisory — the set_ops /
    join_size_estimate single-box-wash shape, miniaturized."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, "orders").select("o_orderkey")
    j = li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
    found = _fanout(j, budget=1024)
    assert len(found) == 1
    f = found[0]
    assert f.severity == "info"
    assert "EVERY executor" in f.message and "KB" in f.message


def test_fanout_budget_exempts_bounded_aggregate(spark):
    """An aggregate below the exchange bounds the build by group count
    — static bytes cannot price it, so the advisory stays silent
    (same posture as the fact-broadcast exemption)."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    agg = (
        _t(spark, "orders")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = li.join(F.broadcast(agg), F.col("l_orderkey") == F.col("o_orderkey"))
    assert _fanout(j, budget=1024) == []


def test_fanout_budget_zero_disables_and_default_is_100mb(spark):
    li = _t(spark, "lineitem").select("l_orderkey")
    o = _t(spark, "orders").select("o_orderkey")
    j = li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
    assert _fanout(j, budget=0) == []
    # default budget: sf0.001's 36 KB orders is far under 100 MB
    assert FANOUT_BUDGET == 100 * (1 << 20)
    assert _fanout(j) == []


def test_fanout_budget_one_finding_per_tree(spark):
    """Two breaching broadcasts in one tree report ONCE (the largest)
    — repeated subquery prints stay readable."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, "orders").select("o_orderkey")
    p = _t(spark, "part").select("p_partkey")
    j = li.join(
        F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    assert len(_fanout(j, budget=512)) == 1


def test_fanout_budget_is_info_tier_never_gates(spark):
    """The advisory must not flip a clean plan into a gating one: CLI
    rc and the registry sweep key off warn/error only."""
    li = _t(spark, "lineitem").select("l_orderkey")
    o = _t(spark, "orders").select("o_orderkey")
    j = li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
    findings = lint_plan(j, fanout_budget=1024)
    assert all(
        f.severity == "info"
        for f in findings
        if f.code == "broadcast-fanout-budget"
    )
    assert not [f for f in findings if f.severity in ("error", "warn")]


# --- unpruned-partitioned-scan ------------------------------------------


@pytest.fixture(scope="module")
def day_partitioned(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lint17") / "part_tbl")
    (
        spark.range(100)
        .withColumn("day", (F.col("id") % 4).cast("string"))
        .withColumn("v", F.col("id") * 2)
        .write.partitionBy("day")
        .parquet(d)
    )
    return d


def test_unpruned_partitioned_scan_fires(spark, day_partitioned):
    """A full read of a hive-partitioned layout gets the info advisory
    (at datalake scale partition pruning is the biggest single lever)."""
    full = spark.read.parquet(day_partitioned).groupBy().agg(
        F.sum("v").alias("s")
    )
    found = [
        f for f in lint_plan(full) if f.code == "unpruned-partitioned-scan"
    ]
    assert len(found) == 1
    assert found[0].severity == "info" and "['day']" in found[0].message


def test_pruned_partitioned_scan_silent(spark, day_partitioned):
    """A literal partition predicate prunes (PartitionFilters carries
    it) — silent. So does DPP via an equi-join on the partition key
    (the dynamicpruning expression IS a partition filter)."""
    pruned = (
        spark.read.parquet(day_partitioned)
        .filter(F.col("day") == "2")
        .agg(F.sum("v").alias("s"))
    )
    assert "unpruned-partitioned-scan" not in {
        f.code for f in lint_plan(pruned)
    }
    dim = (
        spark.range(2)
        .withColumn("day", F.col("id").cast("string"))
        .select("day")
    )
    dpp = spark.read.parquet(day_partitioned).join(dim, "day")
    assert "unpruned-partitioned-scan" not in {
        f.code for f in lint_plan(dpp)
    }


def test_unpartitioned_scan_silent(spark):
    plain = _t(spark, "lineitem").agg(F.sum("l_extendedprice").alias("s"))
    assert "unpruned-partitioned-scan" not in {
        f.code for f in lint_plan(plain)
    }


# --- r17 review fixes: the blunt whole-text rules made precise ---------


def test_global_window_not_fired_by_unrelated_global_agg(spark):
    """A healthy KEYED window plus an unrelated global aggregate used
    to co-occur into a false error (the old rule searched the whole
    text for SinglePartition + Window); now the first Exchange on the
    window's own input chain decides."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    df = (
        _t(spark, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .groupBy()
        .agg(F.sum("rn").alias("s"))
    )
    assert "global-window" not in {f.code for f in lint_plan(df)}
    # the genuinely-global window still errors
    from pyspark.sql import Window as W

    g = _t(spark, "lineitem").withColumn(
        "rs", F.sum("l_linenumber").over(W.orderBy("l_orderkey"))
    )
    assert "global-window" in {f.code for f in lint_plan(g)}


def test_unpruned_rule_sees_single_node_csv_tree(spark, tmp_path):
    """A bare spark.read.csv of a partitioned layout prints a ONE-node
    plan tree, which _all_trees used to drop — the CLI's primary input
    shape was invisible to the partitioned-scan rule."""
    d = str(tmp_path / "csv_by_day")
    (
        spark.range(40)
        .withColumn("day", (F.col("id") % 2).cast("string"))
        .write.partitionBy("day")
        .option("header", True)
        .csv(d)
    )
    df = spark.read.option("header", True).csv(d)
    assert "unpruned-partitioned-scan" in {f.code for f in lint_plan(df)}


def test_nested_loop_join_benign_bounds_table(spark):
    """A BNLJ against a createDataFrame 1-row bounds table (prints
    'Scan ExistingRDD' on the Arrow path, not 'LocalTableScan') is the
    rule's own blessed shape — silent; a file-scan-vs-file-scan BNLJ
    still warns."""
    big = _t(spark, "lineitem").select("l_orderkey")
    bounds = spark.createDataFrame([(0, 500)], ["lo", "hi"])
    ok = big.join(
        bounds, (big.l_orderkey >= bounds.lo) & (big.l_orderkey <= bounds.hi)
    )
    assert "nested-loop-join" not in {f.code for f in lint_plan(ok)}
    o = _t(spark, "orders").select("o_orderkey", "o_totalprice")
    bad = big.join(
        F.broadcast(o), big.l_orderkey >= o.o_orderkey - o.o_orderkey
    )
    codes = {f.code for f in lint_plan(bad)}
    assert "nested-loop-join" in codes or "cartesian-product" in codes


def test_fact_broadcast_agg_exemption_is_per_branch(spark):
    """An aggregate bounds only ITS OWN branch: a broadcast build that
    joins an aggregated dim branch with a RAW fact scan is still the
    q9 trap — the old any-agg-in-subtree test silenced it."""
    li = _t(spark, "lineitem").select("l_suppkey", "l_orderkey")
    sup_stats = (
        _t(spark, "supplier")
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    build = li.join(
        sup_stats, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_orderkey", "n")
    probe = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    with _threshold(spark, "1k"):
        j = probe.join(F.broadcast(build), "l_orderkey")
        codes = [f.code for f in lint_plan(j)]
    assert "fact-broadcast" in codes
    # and the fully-aggregated build stays exempt (the r16 law)
    bounded = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    with _threshold(spark, "1k"):
        j2 = probe.join(F.broadcast(bounded), "l_orderkey")
        assert "fact-broadcast" not in {f.code for f in lint_plan(j2)}


def test_dim_cut_unknown_tiny_scan_now_classifies(spark, tmp_path):
    """r18 semantics change, pinned: a build-side scan the vocabulary
    cannot name is no longer a blanket silencer — size-class inference
    reads its raw bytes, and a scan comfortably under the dim floor
    (thr * DIM_CLASS_FRACTION) is dim-class, so the rule FIRES where
    the r17 unknown-guard stayed silent. The conservative posture
    survives in the ambiguous middle band (test_round18_ops
    test_foreign_middle_band_stays_silent)."""
    d = str(tmp_path / "mystery.parquet")
    spark.range(50).withColumn(
        "n_nationkey", F.col("id") % 25
    ).write.parquet(d)
    o = _t(spark, "orders").select("o_orderkey", "o_custkey")
    build = (
        _t(spark, "customer")
        .join(
            spark.read.parquet(d),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    with _threshold(spark, "-1"):
        j = o.join(build, F.col("o_custkey") == F.col("c_custkey"))
        assert "dim-cut-not-broadcast" in {
            f.code for f in lint_plan(j)
        }


def test_global_sort_not_hidden_by_unrelated_topk(spark):
    """An unlimited global sort must fire even when a TOP-K
    (TakeOrderedAndProject) exists elsewhere in the plan text — the
    old whole-text suppression swallowed it."""
    _t(spark, "lineitem").createOrReplaceTempView("r17_li")
    _t(spark, "orders").createOrReplaceTempView("r17_o")
    q = spark.sql(
        """
        SELECT l_orderkey, l_extendedprice FROM r17_li
        WHERE l_extendedprice > (
          SELECT o_totalprice FROM r17_o ORDER BY o_totalprice DESC LIMIT 1
        ) * 0.5
        ORDER BY l_extendedprice
        """
    )
    from bun_csv_spark.plans.lint import plan_text

    p = plan_text(q)
    assert "TakeOrderedAndProject" in p  # the subquery's top-1
    assert "global-sort" in {f.code for f in lint_plan(q)}


def test_wide_scan_checks_every_scan(spark, tmp_path):
    """The wide fact behind a narrow dim must still flag — the old
    rule read only the FIRST ReadSchema in the text."""
    d = str(tmp_path / "wide.parquet")
    wide = spark.range(100)
    for i in range(26):
        wide = wide.withColumn(f"c{i}", F.col("id") + i)
    wide.write.parquet(d)
    w = spark.read.parquet(d)
    nar = _t(spark, "nation").select("n_nationkey")
    j = nar.join(w, nar.n_nationkey == w.id)
    assert "wide-scan" in {f.code for f in lint_plan(j)}


def test_unpushed_filter_per_scan_not_whole_text(spark):
    """A Filter directly above a scan with nothing pushed fires — even
    when ANOTHER scan in the same plan did push (the old all()-scans
    check let one pushed scan hide the miss). Inner joins infer
    IsNotNull onto every key scan, so the non-inferring shapes are a
    standalone scan and the preserved side of a left join. A
    legitimate post-join cross-column filter stays silent."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    # coalesce() wrapping defeats pushdown AND null-inference, so the
    # scan's PushedFilters is truly empty with a Filter directly above
    miss = li.filter(F.coalesce(F.col("l_extendedprice"), F.lit(0.0)) > 5)
    assert "unpushed-filter" in {f.code for f in lint_plan(miss)}
    # preserved left of a LEFT join (no IsNotNull inference onto li)
    # joined against a side whose own predicate DID push
    o = _t(spark, "orders").filter(F.col("o_totalprice") > 0).select(
        "o_orderkey"
    )
    j = miss.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left")
    assert "unpushed-filter" in {f.code for f in lint_plan(j)}
    # post-join cross-column filter: not a pushdown miss
    a = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    b = _t(spark, "orders").select("o_orderkey", "o_totalprice")
    pj = a.join(
        b, F.col("l_orderkey") == F.col("o_orderkey"), "left"
    ).filter(F.col("l_extendedprice") > F.col("o_totalprice") * 0.1)
    assert "unpushed-filter" not in {f.code for f in lint_plan(pj)}
    # a plainly-pushed filter stays silent
    ok = li.filter(F.col("l_extendedprice") > 5)
    assert "unpushed-filter" not in {f.code for f in lint_plan(ok)}


# --- global-sort (formatted-mode detection) ----------------------------


def test_global_sort_fires_in_formatted_mode(spark):
    """plan_text is formatted mode, where Sort's global flag is in the
    detail block ('Arguments: [...], true, 0') — the old inline regex
    never matched, so the rule was dead until r17."""
    df = (
        _t(spark, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc())
    )
    codes = {f.code for f in lint_plan(df)}
    assert "global-sort" in codes


def test_global_sort_silent_with_limit(spark):
    df = (
        _t(spark, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc())
        .limit(5)
    )
    assert "global-sort" not in {f.code for f in lint_plan(df)}


def test_partitioned_window_sort_not_flagged_as_global(spark):
    """A window's partition-local sort (global=false) must not fire."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    df = _t(spark, "lineitem").select(
        "l_orderkey", F.row_number().over(w).alias("rn")
    )
    assert "global-sort" not in {f.code for f in lint_plan(df)}


# --- bcsv lint ----------------------------------------------------------


def run_cli(capsys, spark, argv):
    rc = main(argv, spark=spark)
    out = capsys.readouterr()
    return rc, out.out, out.err


@pytest.fixture()
def people_csv(write_csv_file):
    return write_csv_file(
        "name,age,city\nAlice,30,NYC\nBob,25,LA\nCarol,35,SF\n"
    )


def test_cli_lint_clean_scan(capsys, spark, people_csv):
    rc, out, _ = run_cli(capsys, spark, ["lint", people_csv])
    assert rc == 0 and "clean: no findings" in out


def test_cli_lint_global_sort_gates(capsys, spark, people_csv):
    rc, out, err = run_cli(
        capsys, spark, ["-f", "csv", "lint", "--sort", "age", people_csv]
    )
    assert rc == 1
    assert "global-sort" in out
    assert "1 gating" in err
    # top-k shape: --limit turns it into TakeOrderedAndProject -> clean
    rc2, out2, _ = run_cli(
        capsys,
        spark,
        ["lint", "--sort", "age", "--limit", "2", people_csv],
    )
    assert rc2 == 0 and "clean" in out2


def test_cli_lint_parquet_path(capsys, spark):
    rc, out, _ = run_cli(
        capsys,
        spark,
        ["lint", f"{SF}/lineitem.parquet", "--select", "l_orderkey"],
    )
    assert rc == 0 and "clean: no findings" in out


def test_cli_lint_pipeline_file_trap(capsys, spark, tmp_path):
    """A .py pipeline that trips fact-broadcast exits 1 and renders the
    finding through the standard renderer."""
    pipe = tmp_path / "pipe.py"
    pipe.write_text(
        "from pyspark.sql import functions as F\n"
        "def build(spark):\n"
        f"    li = spark.read.parquet('{SF}/lineitem.parquet')"
        ".select('l_orderkey', 'l_extendedprice')\n"
        f"    o = spark.read.parquet('{SF}/orders.parquet')"
        ".select('o_orderkey', F.year('o_orderdate').alias('yr'))\n"
        "    return li.join(o, F.col('l_orderkey') == F.col('o_orderkey'))\n"
    )
    with _threshold(spark, "24k"):
        rc, out, err = run_cli(
            capsys, spark, ["-f", "csv", "lint", str(pipe)]
        )
    assert rc == 1
    assert "fact-broadcast" in out
    # the guarded form is clean
    pipe2 = tmp_path / "pipe2.py"
    pipe2.write_text(
        pipe.read_text().replace(
            "li.join(o,", "li.join(o.hint('merge'),"
        )
    )
    with _threshold(spark, "24k"):
        rc2, out2, _ = run_cli(capsys, spark, ["lint", str(pipe2)])
    assert rc2 == 0 and "clean" in out2


def test_cli_lint_pipeline_file_top_level_df(capsys, spark, tmp_path):
    pipe = tmp_path / "df_pipe.py"
    pipe.write_text(
        f"df = spark.read.parquet('{SF}/nation.parquet')"
        ".select('n_name')\n"
    )
    rc, out, _ = run_cli(capsys, spark, ["lint", str(pipe)])
    assert rc == 0 and "clean" in out


def test_cli_lint_usage_errors(capsys, spark, tmp_path, people_csv):
    # pipeline file with neither build() nor df
    bad = tmp_path / "bad.py"
    bad.write_text("x = 1\n")
    rc, _, err = run_cli(capsys, spark, ["lint", str(bad)])
    assert rc == 2 and "build(spark)" in err
    # pipeline file that raises
    boom = tmp_path / "boom.py"
    boom.write_text("raise RuntimeError('nope')\n")
    rc, _, err = run_cli(capsys, spark, ["lint", str(boom)])
    assert rc == 2 and "RuntimeError" in err
    # bad filter grammar / unknown column reuse the CLI's rc=2 contract
    rc, _, err = run_cli(
        capsys, spark, ["lint", "--filter", "age >", people_csv]
    )
    assert rc == 2 and "error:" in err
    rc, _, err = run_cli(
        capsys, spark, ["lint", "--select", "nope", people_csv]
    )
    assert rc == 2 and "nope" in err


def test_cli_lint_budget_info_does_not_gate(capsys, spark, tmp_path):
    """--budget breaches render but stay rc=0 (info tier)."""
    pipe = tmp_path / "bcast.py"
    pipe.write_text(
        "from pyspark.sql import functions as F\n"
        "def build(spark):\n"
        f"    li = spark.read.parquet('{SF}/lineitem.parquet')"
        ".select('l_orderkey')\n"
        f"    o = spark.read.parquet('{SF}/orders.parquet')"
        ".select('o_orderkey')\n"
        "    return li.join(F.broadcast(o), "
        "F.col('l_orderkey') == F.col('o_orderkey'))\n"
    )
    rc, out, err = run_cli(
        capsys, spark, ["-f", "csv", "lint", "--budget", "0.001", str(pipe)]
    )
    assert rc == 0
    assert "broadcast-fanout-budget" in out
    assert "0 gating" in err


def test_cli_lint_explain_prints_plan(capsys, spark, people_csv):
    rc, out, _ = run_cli(capsys, spark, ["lint", "--explain", people_csv])
    assert rc == 0 and "== Physical Plan ==" in out


def test_cli_lint_partitioned_parquet_dir(capsys, spark, day_partitioned):
    """A hive-partitioned parquet DIR (files only under k=v subdirs)
    must route to the parquet reader — and the unpruned advisory
    renders, staying non-gating."""
    rc, out, err = run_cli(
        capsys, spark, ["-f", "csv", "lint", day_partitioned]
    )
    assert rc == 0
    assert "unpruned-partitioned-scan" in out
    assert "0 gating" in err


def test_cli_lint_build_raising_is_usage_error(capsys, spark, tmp_path):
    """An exception from build(spark) itself (not just module exec)
    keeps the rc=2 contract."""
    pipe = tmp_path / "raise_in_build.py"
    pipe.write_text(
        "def build(spark):\n"
        "    return spark.read.parquet('/no/such/path_r17')\n"
    )
    rc, _, err = run_cli(capsys, spark, ["lint", str(pipe)])
    assert rc == 2 and "error: pipeline file raised" in err


def test_lint_blank_table_names_ignored(spark):
    """Blank entries in fact/dim vocabularies (a trailing comma at the
    CLI) must not become an empty regex alternation that matches every
    path."""
    o = _t(spark, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, "customer").select("c_custkey")
    with _threshold(spark, "-1"):
        j = o.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        base = [
            f.code
            for f in lint_plan(
                j,
                fact_tables=["orders"],
                dim_tables=["customer"],
            )
        ]
        padded = [
            f.code
            for f in lint_plan(
                j,
                fact_tables=["orders", "", "  ".strip()],
                dim_tables=["customer", ""],
            )
        ]
    assert padded == base
    # fully-blank vocabularies -> no table-classified findings at all
    with _threshold(spark, "-1"):
        none = [
            f.code
            for f in lint_plan(j, fact_tables=[""], dim_tables=[""])
            if f.code == "dim-cut-not-broadcast"
        ]
    assert none == []


def test_cli_lint_partitioned_csv_dir(capsys, spark, tmp_path):
    """A hive-partitioned CSV layout through the CLI: the reference
    reader's header probe cannot see the k=v columns (partition
    discovery adds them), so the CLI routes to the plain Spark csv
    reader — and the unpruned advisory renders instead of the
    ASSIGNMENT_ARITY_MISMATCH crash this pinned."""
    d = str(tmp_path / "csv_by_day")
    (
        spark.range(40)
        .withColumn("day", (F.col("id") % 2).cast("string"))
        .write.partitionBy("day")
        .option("header", True)
        .csv(d)
    )
    rc, out, err = run_cli(capsys, spark, ["-f", "csv", "lint", d])
    assert rc == 0
    assert "unpruned-partitioned-scan" in out


def test_cli_lint_read_failures_are_usage_errors(capsys, spark, tmp_path):
    """Missing pipeline file, missing data path, unknown --filter
    column: all rc=2 with a clean message — never a traceback, never
    the rc=1 findings code."""
    rc, _, err = run_cli(
        capsys, spark, ["lint", str(tmp_path / "typo_name.py")]
    )
    assert rc == 2 and "error: pipeline file raised" in err
    rc, _, err = run_cli(
        capsys, spark, ["lint", str(tmp_path / "no_such_data.parquet")]
    )
    assert rc == 2 and "error: cannot read" in err
    csv = tmp_path / "p.csv"
    csv.write_text("name,age\nann,31\n")
    rc, _, err = run_cli(
        capsys, spark, ["lint", "--filter", "salary > 10", str(csv)]
    )
    assert rc == 2 and "error:" in err


def test_cli_lint_select_supports_indices(capsys, spark, people_csv):
    """lint --select shares the select command's resolution: numeric
    0-based indices resolve through the header."""
    rc, out, _ = run_cli(
        capsys, spark, ["lint", "--select", "0,2", people_csv]
    )
    assert rc == 0 and "clean" in out
    rc, _, err = run_cli(
        capsys, spark, ["lint", "--select", "nope", people_csv]
    )
    assert rc == 2 and "available:" in err


def test_global_window_fires_on_windowinpandas(spark):
    """A pandas grouped-agg window over SinglePartition plans as
    WindowInPandas — the same all-rows-to-one-task shape, caught since
    r17 (the node-name rewrite had narrowed the rule to 'Window')."""
    from pyspark.sql import Window
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit eval type: the module's `from __future__ import
    # annotations` stringifies hints, which pandas_udf cannot resolve
    # for locally-imported names
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def pmean(v):
        return float(v.mean())

    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    g = li.withColumn(
        "m",
        pmean("l_extendedprice").over(
            Window.orderBy("l_orderkey").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    assert "global-window" in {f.code for f in lint_plan(g)}
    keyed = li.withColumn(
        "m",
        pmean("l_extendedprice").over(
            Window.partitionBy("l_orderkey")
            .orderBy("l_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert "global-window" not in {f.code for f in lint_plan(keyed)}


def test_global_window_ignores_sibling_branch_exchange(spark):
    """A keyed window over a crossJoin whose BUILD branch carries a
    global-agg Exchange SinglePartition must not fire — only the
    window's own input spine decides (the pre-order walk hit the
    sibling build branch first)."""
    from pyspark.sql import Window

    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    keyed = li.groupBy("l_orderkey").agg(
        F.sum("l_extendedprice").alias("tot")
    )
    gstat = li.groupBy().agg(F.avg("l_extendedprice").alias("gavg"))
    out = gstat.crossJoin(keyed).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("tot")
        ),
    )
    assert "global-window" not in {f.code for f in lint_plan(out)}


def test_nested_loop_benign_keyless_agg_build(spark):
    """crossJoin against a KEYLESS aggregate (provably 1 row — the
    attach-the-global-stat shape the global-window message itself
    recommends) must not warn; and a local scan on the STREAM side
    must not bless a file-vs-file BNLJ build."""
    li = _t(spark, "lineitem").select("l_orderkey", "l_extendedprice")
    gstat = li.groupBy().agg(F.avg("l_extendedprice").alias("gavg"))
    ok = li.crossJoin(gstat)
    codes = {f.code for f in lint_plan(ok)}
    assert "nested-loop-join" not in codes
    # stream side carries a local relation; build is a FILE scan
    local = spark.createDataFrame([(1, 2)], ["a", "b"])
    stream = li.unionByName(
        local.select(
            F.col("a").alias("l_orderkey"),
            F.col("b").cast("double").alias("l_extendedprice"),
        )
    )
    o = _t(spark, "orders").select("o_orderkey")
    bad = stream.join(F.broadcast(o), stream.l_orderkey > o.o_orderkey + 9e9)
    assert "nested-loop-join" in {f.code for f in lint_plan(bad)}


def test_cli_select_negative_index_is_usage_error(capsys, spark, people_csv):
    """A negative index spec errors cleanly (0-based contract) instead
    of wrapping around or crashing out of range."""
    rc, _, err = run_cli(capsys, spark, ["select", "-5", people_csv])
    assert rc == 2 and "unknown column" in err
    rc2, _, err2 = run_cli(capsys, spark, ["select", "-1", people_csv])
    assert rc2 == 2 and "unknown column" in err2


def test_cli_lint_partitioned_csv_keeps_delimiter(capsys, spark, tmp_path):
    """A semicolon-delimited partitioned CSV layout: the delimiter
    (explicit or auto-detected) reaches the partition-discovery
    reader, so --select resolves real columns."""
    root = tmp_path / "semi" / "day=0"
    root.mkdir(parents=True)
    (root / "part.csv").write_text("name;age\nann;31\nbob;17\n")
    rc, out, _ = run_cli(
        capsys,
        spark,
        ["-d", ";", "lint", "--select", "age,day", str(tmp_path / "semi")],
    )
    assert rc == 0
    rc2, out2, _ = run_cli(  # auto-detection path
        capsys, spark, ["lint", "--select", "age", str(tmp_path / "semi")]
    )
    assert rc2 == 0


def test_turboframe_lint_method(spark):
    """TurboFrame.lint() is the library-frame face of the same linter —
    kwargs pass through."""
    from bun_csv_spark.operators.frame import TurboFrame

    li = _t(spark, "lineitem").select("l_orderkey")
    o = _t(spark, "orders").select("o_orderkey")
    tf = TurboFrame(
        li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    codes = {f.code for f in tf.lint(fanout_budget=1024)}
    assert "broadcast-fanout-budget" in codes
    assert "broadcast-fanout-budget" not in {f.code for f in tf.lint()}


def test_cli_completions_include_lint(capsys, spark):
    rc, out, _ = run_cli(capsys, spark, ["completions", "bash"])
    assert rc == 0 and "lint" in out
