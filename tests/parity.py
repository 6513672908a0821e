"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + sorted
values exactly (stricter than the driver's hash — if this passes, the
driver's order-insensitive value-hash passes).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from binance_etl_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("ts", _dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("null",)
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed)


def compare(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted = _sorted_rows(s_cols, s_rows)
    d_sorted = _sorted_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"{name}: first value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
