"""Registry/doc consistency: the gate count printed in COVERAGE.md and
README.md must equal the live ``queries()`` registry (round-3 verdict asked
for an automated drift check after the docs oscillated), and every gate
must have an oracle twin."""

import pathlib
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_gate_count_matches_docs():
    n = len(entry_mod.queries())
    cov = (REPO / "COVERAGE.md").read_text()
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) gate queries", cov)
    assert m and int(m.group(1)) == n, f"COVERAGE.md says {m and m.group(1)}, registry has {n}"
    for claim in re.findall(r"(\d+) (?:gate )?quer", readme):
        assert int(claim) == n, f"README.md says {claim}, registry has {n}"


# gates that intentionally have NO SQL oracle (not SQL-expressible; the
# driver records a weaker rows-only check for these, by design)
ROWS_ONLY_GATES = {"compression_ratio"}  # zlib: not SQL (pca value-hashed since r11)


def test_every_gate_has_oracle():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(qs) - set(osql) == ROWS_ONLY_GATES, (
        sorted((set(qs) - set(osql)) ^ ROWS_ONLY_GATES)
    )
    assert not set(osql) - set(qs), sorted(set(osql) - set(qs))


def test_registry_keys_unique_and_callable():
    qs = entry_mod.queries()
    assert all(callable(v) for v in qs.values())
