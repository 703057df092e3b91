"""Local replica of the driver's correctness gate: run each Spark query
and its DuckDB oracle on the same parquet tables, compare row count,
column names, and values (order-insensitive, exact)."""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v)
    except ImportError:
        pass
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _spark_type_class(dt: str) -> str:
    """Spark simpleString dtype -> canonical type class."""
    dt = dt.lower()
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("array<"):
        return "list<" + _spark_type_class(dt[6:-1]) + ">"
    return {
        "tinyint": "int8", "smallint": "int16", "int": "int32",
        "bigint": "int64", "float": "float32", "double": "float64",
        "string": "string", "boolean": "bool", "date": "date",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp",
        "binary": "binary",
    }.get(dt, dt)


def _duck_type_class(tn: str) -> str:
    """DuckDB type name -> canonical type class."""
    tn = str(tn).upper()
    if tn.startswith("DECIMAL"):
        return tn.lower().replace(" ", "")
    if tn.endswith("[]"):
        return "list<" + _duck_type_class(tn[:-2]) + ">"
    return {
        "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
        "BIGINT": "int64", "HUGEINT": "hugeint", "UBIGINT": "uint64",
        "FLOAT": "float32", "DOUBLE": "float64", "VARCHAR": "string",
        "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
        "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
        "TIMESTAMP_NS": "timestamp",
    }.get(tn, tn.lower())


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    Type-strict: the driver's value hash is serialization-sensitive
    (CORRECTNESS_r01 q40: DuckDB HUGEINT vs Spark BIGINT hashed apart with
    identical values), so canonical type classes must match per column too.
    """
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    spark_types = {n.lower(): _spark_type_class(t) for n, t in spark_df.dtypes}

    duck_rel = con.sql(sql)
    duck_cols = list(duck_rel.columns)
    duck_types = {
        n.lower(): _duck_type_class(t)
        for n, t in zip(duck_rel.columns, duck_rel.types)
    }
    duck_rows = [tuple(r) for r in duck_rel.fetchall()]

    for name in sorted(set(spark_types) & set(duck_types)):
        if spark_types[name] != duck_types[name]:
            problems.append(
                f"type class differs for {name}: "
                f"spark={spark_types[name]} duck={duck_types[name]}"
            )

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    # align columns by (lowercased) name, like the driver does
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_vals = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=_sort_key
    )
    d_vals = sorted(
        (tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=_sort_key
    )
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_vals, d_vals)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a!r} duck={b!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
