"""Local mirror of the driver's correctness gate: run each named query on
Spark AND its DuckDB oracle on the same parquet tables, compare
row-count + column names + (order-insensitive) values.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from big_data_analysis_diseases_outbreaks_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent at comparable precision
        return round(v, 9) + 0.0
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return sorted(columns), out


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        oracle_cols = [d[0] for d in res.description]
        oracle_rows = res.fetchall()
    finally:
        con.close()

    s_cols, s_rows = _normalize(spark_rows, spark_cols)
    o_cols, o_rows = _normalize(oracle_rows, oracle_cols)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(f"first differing row #{i}: spark={sr} oracle={orow}")
            break
    return problems
