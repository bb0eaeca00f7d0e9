"""Filter-expression compiler tests — grammar parity with the reference CLI
(reference: src/cli/commands/filter.ts:26-123; test model: SURVEY §5.1)."""

import pytest

from bun_csv_spark.plans.expr import ExprError, compile_filter


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "Alice", 25, "NYC", "alice@x.com"),
        (2, "bob", 19, "LA", "bob@y.org"),
        (3, "Ann", 30, "SF", "ann@x.com"),
        (4, "Carol", None, "NYC", None),
        (5, "dave", 42, "Boston", "dave@z.net"),
    ]
    return spark.createDataFrame(
        rows, "id int, name string, age int, city string, email string"
    )


def ids(df, expr):
    return sorted(r.id for r in df.filter(compile_filter(expr)).collect())


def test_numeric_ops(people):
    assert ids(people, "age > 21") == [1, 3, 5]
    assert ids(people, "age >= 25") == [1, 3, 5]
    assert ids(people, "age < 25") == [2]
    assert ids(people, "age <= 19") == [2]


def test_null_numeric_is_false(people):
    # NaN-safe-false: Carol's null age matches no numeric comparison
    assert 4 not in ids(people, "age > 0")
    assert 4 not in ids(people, "age < 100")


def test_string_equality(people):
    assert ids(people, "city == NYC") == [1, 4]
    assert ids(people, "city == 'NYC'") == [1, 4]
    assert ids(people, 'city != "NYC"') == [2, 3, 5]


def test_string_predicates(people):
    assert ids(people, "email contains x.com") == [1, 3]
    assert ids(people, "name startsWith A") == [1, 3]
    # keyword case-insensitive, value case-sensitive
    assert ids(people, "name STARTSWITH a") == []
    assert ids(people, "name startswith 'a'") == []  # 'Alice'/'Ann' are capital
    assert ids(people, "email endsWith .org") == [2]


def test_matches_regex(people):
    # `matches` is documented-but-unimplemented in the reference; we
    # implement the documented intent as rlike (README.md:213)
    assert ids(people, "name matches '^[AB]'") == [1, 3]
    assert ids(people, "email matches '@[xy]\\.'") == [1, 2, 3]


def test_compound(people):
    assert ids(people, "age > 20 && city == NYC") == [1]
    assert ids(people, "age > 40 || city == LA") == [2, 5]
    assert ids(people, "(age > 20 && city == NYC) || name == dave") == [1, 5]
    assert ids(people, "age > 20 and city == NYC") == [1]
    assert ids(people, "! (city == NYC)") == [2, 3, 5]


def test_parse_errors():
    for bad in ["", "age >", "age > abc", "name ~= 'x'", "(a == b", "a == b c"]:
        with pytest.raises(ExprError):
            compile_filter(bad)


def test_no_eval_fallback():
    # raw JS-ish payloads must be rejected, never evaluated
    with pytest.raises(ExprError):
        compile_filter("process.exit(1)")
