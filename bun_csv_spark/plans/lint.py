"""Plan linter — an EXPLAIN advisor for scale antipatterns.

``lint_plan(df)`` inspects the optimized physical plan of ANY DataFrame
and returns structured findings for the shapes that kill 100 TB jobs:
cartesian products, filters that never reached the parquet scan,
global-sort / single-partition windows, row-at-a-time Python UDFs, scans
that read every column for a narrow projection. It is the reusable
library form of the repo's own plan audit (tools/audit_plans.py asserts
per-gate expectations; this lints arbitrary user queries).

Reference parity note: the reference engine has no planner surface at
all (queries are imperative TS/Zig loops); this is a Spark-native
extension of its developer-experience goals (README's "fast by
default") to declarative plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    code: str
    severity: str  # "error" | "warn" | "info"
    message: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"[{self.severity}] {self.code}: {self.message}"


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (same accessor the audit uses)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint the DataFrame's physical plan; returns findings worst-first.

    Driver-side plan-string inspection only — nothing is executed."""
    p = plan_text(df)
    findings: list[Finding] = []

    if "CartesianProduct" in p:
        findings.append(Finding(
            "cartesian-product", "error",
            "CartesianProduct in plan: cost is |left| x |right|. Add an "
            "equi-join key, or bucket/LSH the similarity condition "
            "(see operators.dedup / operators.temporal for shapes)."))
    if "BroadcastNestedLoopJoin" in p and "LocalTableScan" not in p:
        findings.append(Finding(
            "nested-loop-join", "warn",
            "BroadcastNestedLoopJoin: fine for a broadcast 1-row bounds "
            "table, quadratic for anything else. Check the build side "
            "is O(1)-sized."))
    # formatted mode splits the node name and its arguments across lines:
    # "(2) Exchange" ... "Arguments: SinglePartition, ..." — match both
    if re.search(r"SinglePartition", p) and re.search(r"\(\d+\) Window", p):
        findings.append(Finding(
            "global-window", "error",
            "Window over Exchange SinglePartition: ALL rows move to one "
            "task. partitionBy an entity key, or restate as running sums "
            "over a bounded aggregate (see SCALE.md token_budget note)."))
    if re.search(r"\bSort \[[^\]]*\], true,", p) and "TakeOrderedAndProject" not in p:
        findings.append(Finding(
            "global-sort", "warn",
            "Global sort without a limit: a full range-partitioned sort. "
            "If only the top k matter, orderBy(...).limit(k) becomes "
            "TakeOrderedAndProject (per-partition heaps)."))
    if "BatchEvalPython" in p:
        findings.append(Finding(
            "python-udf", "error",
            "Row-at-a-time Python UDF (BatchEvalPython): 10-100x slower "
            "than Arrow. Use built-in Column functions, or pandas_udf / "
            "mapInPandas if Python is unavoidable."))
    if "ArrowEvalPython" in p or "MapInPandas" in p:
        findings.append(Finding(
            "arrow-python", "info",
            "Arrow-batched Python stage present: acceptable off the hot "
            "path; prefer JVM Column expressions where one exists."))

    # unpushed filter: a Filter node above a scan whose PushedFilters is
    # empty while the plan filters a plain attribute
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    if scans and all(not s.strip() for s in scans) and re.search(r"\(\d+\) Filter", p):
        findings.append(Finding(
            "unpushed-filter", "warn",
            "Filter node present but no PushedFilters reached any scan: "
            "the predicate may wrap the column in a non-pushable "
            "expression (cast/UDF). Filter on raw columns first."))

    # wide scan: ReadSchema lists many columns but the plan projects few
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    if m:
        n_read = len([c for c in m.group(1).split(",") if ":" in c])
        if n_read > 24:
            findings.append(Finding(
                "wide-scan", "info",
                f"Scan reads {n_read} columns — if the query needs few, "
                "select() early so column pruning reaches the reader."))

    order = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: order[f.severity])
    return findings
