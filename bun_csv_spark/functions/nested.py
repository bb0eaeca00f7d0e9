"""Dot-notation nested-object helpers — reference nested.ts parity.

Driver-side dict forms (flatten / unflatten / flatten_objects —
nested.ts:27-118) plus the Spark-side equivalents: struct columns flatten
to dot-named columns and back. The Spark forms are pure projections
(no UDFs, no shuffles).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(obj: Mapping[str, Any], separator: str = ".", prefix: str = "") -> dict:
    """{"user": {"name": "A"}} -> {"user.name": "A"} (nested.ts:27-53)."""
    out: dict[str, Any] = {}
    for key, value in obj.items():
        full = f"{prefix}{separator}{key}" if prefix else key
        if isinstance(value, Mapping):
            out.update(flatten(value, separator, full))
        else:
            out[full] = value
    return out


def unflatten(obj: Mapping[str, Any], separator: str = ".") -> dict:
    """{"user.name": "A"} -> {"user": {"name": "A"}} (nested.ts:68-90)."""
    out: dict[str, Any] = {}
    for key, value in obj.items():
        parts = key.split(separator)
        cur = out
        for part in parts[:-1]:
            if part not in cur or not isinstance(cur[part], dict):
                cur[part] = {}
            cur = cur[part]
        cur[parts[-1]] = value
    return out


def flatten_objects(objects: list[Mapping[str, Any]], separator: str = ".") -> tuple[list[str], list[list]]:
    """Union of dot-keys across records, first-seen order; missing -> None
    (nested.ts:100-118). Returns (headers, rows)."""
    flats = [flatten(o, separator) for o in objects]
    headers = list(dict.fromkeys(k for f in flats for k in f))
    rows = [[f.get(h) for h in headers] for f in flats]
    return headers, rows


def flatten_struct_columns(df: DataFrame, separator: str = ".") -> DataFrame:
    """Spark-side flatten: every StructType column expands (recursively)
    into dot-named top-level columns. Pure projection."""
    cols = []

    def expand(prefix: str, dtype: T.DataType, path: str):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                expand(f"{prefix}{separator}{f.name}", f.dataType, f"{path}.{f.name}")
        else:
            cols.append(F.col(path).alias(prefix))

    for field in df.schema.fields:
        expand(field.name, field.dataType, f"`{field.name}`")
    return df.select(*cols)


def nest_columns(df: DataFrame, separator: str = ".") -> DataFrame:
    """Spark-side unflatten: dot-named columns reassemble into structs."""
    tree: dict = {}
    for name in df.columns:
        parts = name.split(separator)
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = name

    def build(node, prefix: str):
        if isinstance(node, str):
            return F.col(f"`{node}`")
        return F.struct(
            *[build(child, key).alias(key) for key, child in node.items()]
        )

    return df.select(*[build(child, key).alias(key) for key, child in tree.items()])
