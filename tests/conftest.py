from __future__ import annotations

import pytest

from bun_csv_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def write_csv_file(tmp_path):
    def _write(text: str, name: str = "data.csv") -> str:
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    return _write
