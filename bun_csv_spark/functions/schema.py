"""Typed Schema<T> enforcement — the reference's getTyped surface.

Reference: src/ts/types.ts:6-31 (ColumnType, SchemaField {col, type,
nullable, default}) and src/ts/row.ts:386-411 (getTyped): a NULL field is
returned as null when nullable, replaced by the default when one is
declared, and is otherwise a TypeError; a non-null field that fails the
type coercion is a TypeError.

Spark mapping: per-row exceptions don't exist in a columnar engine, so the
same contract is exposed two ways:

- ``apply_schema(df, schema, mode="permissive")`` — typed columns;
  violations become NULL (after defaults), and ``validate_schema`` reports
  them as data;
- ``mode="strict"`` — one validation pass; ANY violation raises
  ``SchemaError`` naming columns and counts (the collective form of the
  reference's per-row TypeError).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bun_csv_spark.functions.coercion import (
    parse_boolean,
    parse_currency,
    parse_date,
    parse_integer,
    parse_number,
    parse_percent,
)

COLUMN_TYPES = (
    "string",
    "number",
    "integer",
    "float",
    "boolean",
    "date",
    "currency",
    "percent",
)

# reference Validation codes (errors.ts:35-37)
ISSUE_NULL = "ConstraintViolation"
ISSUE_PARSE = "InvalidCast"


@dataclass
class Field:
    """SchemaField parity (types.ts:17-27); addressed by column name
    (Spark columns are named, not positional)."""

    type: str = "string"
    nullable: bool = True
    default: Any = None


class SchemaError(TypeError):
    pass


def _parser(type_name: str):
    return {
        "string": lambda c: c.cast("string"),
        "number": parse_number,
        "float": parse_number,
        "integer": parse_integer,
        "boolean": parse_boolean,
        "date": parse_date,
        "currency": parse_currency,
        "percent": parse_percent,
    }[type_name]


def _checked(df: DataFrame, schema: dict[str, Field]) -> DataFrame:
    """Per schema column c: replace with the typed value and add an issue
    column ``__issue_c`` (NULL = fine, else the violation kind)."""
    out = df
    for name, field in schema.items():
        if field.type not in COLUMN_TYPES:
            raise ValueError(f"unknown column type {field.type!r} for {name!r}")
        raw = F.col(name)
        parsed = _parser(field.type)(raw)
        parse_failed = (
            raw.isNotNull() & parsed.isNull()
            if field.type != "string"
            else F.lit(False)
        )
        if field.default is not None:
            value = F.when(raw.isNull(), F.lit(field.default)).otherwise(parsed)
            issue = F.when(parse_failed, ISSUE_PARSE)
        elif field.nullable:
            value = parsed
            issue = F.when(parse_failed, ISSUE_PARSE)
        else:
            value = parsed
            issue = F.when(raw.isNull(), ISSUE_NULL).when(parse_failed, ISSUE_PARSE)
        out = out.withColumn(f"__issue_{name}", issue).withColumn(name, value)
    return out


def apply_schema(
    df: DataFrame, schema: dict[str, Field], mode: str = "strict"
) -> DataFrame:
    """Coerce columns per the schema.

    strict: raise SchemaError if any row violates (getTyped's TypeError,
    collectively). permissive: violations coerce to NULL/default and flow
    on."""
    if mode not in ("strict", "permissive"):
        raise ValueError(f"unknown mode {mode!r}")
    checked = _checked(df, schema)
    issue_cols = [f"__issue_{c}" for c in schema]
    if mode == "strict":
        counts = checked.agg(
            *[
                F.sum(F.col(v).isNotNull().cast("int")).alias(v)
                for v in issue_cols
            ]
        ).first()
        bad = {
            c: counts[f"__issue_{c}"]
            for c in schema
            if counts[f"__issue_{c}"]
        }
        if bad:
            detail = ", ".join(f"{c}: {n} row(s)" for c, n in bad.items())
            raise SchemaError(f"schema violations — {detail}")
    return checked.drop(*issue_cols)


def validate_schema(
    df: DataFrame, schema: dict[str, Field], row_col: str | None = None
) -> DataFrame:
    """Violations as data: (row?, column, issue) — the error-array analog
    (errors.ts:6-53) for schema checking."""
    checked = _checked(df, schema)
    parts = []
    for name in schema:
        sel = [
            F.lit(name).alias("column"),
            F.col(f"__issue_{name}").alias("issue"),
        ]
        if row_col:
            sel.insert(0, F.col(row_col).alias("row"))
        parts.append(
            checked.filter(F.col(f"__issue_{name}").isNotNull()).select(*sel)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
