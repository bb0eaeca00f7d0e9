"""Typed schema enforcement, custom aggregates, step/chunk consumption,
plus a hypothesis round-trip property for the CSV layer."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bun_csv_spark.functions.schema import (
    Field,
    SchemaError,
    apply_schema,
    validate_schema,
)
from bun_csv_spark.operators.frame import TurboFrame, with_row_index
from bun_csv_spark.streaming.consume import consume, iterate_rows


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        ("1", "$5,000", "yes", "2024-01-05"),
        ("2", "(300)", "no", "bad-date"),
        ("x", None, "maybe", None),
    ]
    return spark.createDataFrame(rows, "id string, bal string, ok string, d string")


SCHEMA = {
    "id": Field("integer", nullable=False),
    "bal": Field("currency", default=0.0),
    "ok": Field("boolean"),
    "d": Field("date"),
}


def test_apply_schema_permissive(raw):
    out = {r.id: r for r in apply_schema(raw, SCHEMA, mode="permissive").collect()}
    assert out[1].bal == 5000.0 and out[1].ok is True
    assert out[2].bal == -300.0 and out[2].ok is False and out[2].d is None
    assert None in out  # 'x' failed integer parse -> null id
    assert out[None].bal == 0.0  # default fills the null currency


def test_apply_schema_strict_raises(raw):
    with pytest.raises(SchemaError) as e:
        apply_schema(raw, SCHEMA, mode="strict")
    assert "id" in str(e.value)


def test_apply_schema_strict_ok(spark):
    clean = spark.createDataFrame([("1", "2.5")], "a string, b string")
    out = apply_schema(
        clean, {"a": Field("integer", nullable=False), "b": Field("number")}
    )
    assert out.collect()[0].a == 1


def test_validate_schema_reports(raw):
    issues = {(r.column, r.issue) for r in validate_schema(raw, SCHEMA).collect()}
    assert ("id", "InvalidCast") in issues
    assert ("ok", "InvalidCast") in issues  # 'maybe'
    assert ("d", "InvalidCast") in issues  # 'bad-date'
    assert not any(c == "bal" for c, _ in issues)  # default absorbs the null


def test_custom_aggregate(spark):
    df = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 1), ("a", 3, 2), ("b", 10, 3)],
        "g string, v int, ord int",
    )
    out = (
        TurboFrame(df)
        .group_by("g")
        .aggregate(
            {
                "rng": ("v", lambda vals: max(vals) - min(vals), "int"),
                "joined": ("v", lambda vals: "|".join(str(v) for v in vals), "string"),
                "n": ("v", "count"),
            },
            order_col="ord",
        )
        .df
    )
    rows = {r.g: r for r in out.collect()}
    assert rows["a"].rng == 2
    assert rows["a"].joined == "1|2|3"  # encounter order preserved
    assert rows["b"].joined == "10" and rows["b"].n == 1


def test_consume_step_chunk_abort(spark):
    df = with_row_index(spark.range(100).selectExpr("id AS v"))
    seen = []

    def step(row, handle):
        seen.append(row["v"])
        if len(seen) >= 25:
            handle.abort()

    h = consume(df.orderBy("__row_idx"), step=step)
    assert h.aborted and h.rows_emitted == 25

    got_chunks = []
    h2 = consume(df, chunk=lambda c, _h: got_chunks.append(len(c)), chunk_size=30)
    assert h2.rows_emitted == 100
    assert got_chunks == [30, 30, 30, 10]


def test_iterate_rows_streams(spark):
    df = spark.range(10).selectExpr("id AS v")
    assert sum(r["v"] for r in iterate_rows(df)) == 45


# -- property: unparse -> read_csv round trip ---------------------------------

_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\r\x00"
        ),
        max_size=20,
    ),
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(_cell, _cell), min_size=1, max_size=8))
def test_unparse_read_roundtrip(spark, tmp_path_factory, rows):
    """Whatever unparse writes, read_csv reads back — for arbitrary text
    incl. quotes, commas, newlines, unicode. None and "" both serialize to
    an empty unquoted field (the reference writes null as ""), so both read
    back as NULL; non-empty strings round-trip exactly."""
    from bun_csv_spark.sources.csv_reader import CSVOptions, read_csv
    from bun_csv_spark.sources.csv_writer import unparse

    data = [{"a": a, "b": b} for a, b in rows]
    text = unparse(data, columns=["a", "b"], newline="\n")
    p = tmp_path_factory.mktemp("prop") / "t.csv"
    p.write_text(text, newline="")
    df = read_csv(spark, str(p), CSVOptions(multiline=True))
    got = [(r["a"], r["b"]) for r in df.collect()]

    def norm(v):
        return None if v in (None, "") else v

    assert sorted(map(str, got)) == sorted(
        str((norm(a), norm(b))) for a, b in rows
    )
