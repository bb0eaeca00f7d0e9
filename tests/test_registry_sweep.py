"""Full-registry analysis sweep as a standing test.

Round-5 postmortem: a testdata type change (events ``ts`` micros vs nanos)
broke 16 registry queries while the driver's rotating oracle gate showed
stale green. This test builds EVERY ``queries()`` entry against real
testdata and forces Catalyst analysis, plus EXPLAINs every ``oracle_sql()``
twin in DuckDB — so schema drift in either engine fails the suite the same
session it lands. Streaming entries execute their (small) sf0.001 replay;
everything else is analysis-only.
"""

from __future__ import annotations

import os

import pytest

from tools.sweep_registry import sweep

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_every_registry_query_analyzes_and_every_oracle_parses():
    failures = sweep(SF_DIR)
    assert not failures, "registry sweep failures: " + ", ".join(
        name for name, _ in failures
    ) + "\n\n" + "\n".join(err for _, err in failures[:3])
