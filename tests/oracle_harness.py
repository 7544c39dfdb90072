"""Local mirror of the driver's correctness gate: run each named query on
Spark AND its DuckDB oracle on the same parquet tables, compare
row-count + column names + (order-insensitive) values.

Fidelity note (round 5): the driver consumes BOTH result sets through
pandas/arrow and hashes the rendered values, so a DuckDB HUGEINT (e.g. an
uncast windowed ``SUM(BIGINT)``) reaches it as float64 and hashes as
``4994.0`` against Spark's ``4994`` — a mismatch Python's ``4994.0 == 4994``
would silently absorb.  This harness therefore (a) pulls the oracle result
via Arrow (``con.execute(sql).arrow().to_pandas()``) and the Spark result
via ``toPandas()``, exactly like the driver — on that path DuckDB DATE
stays ``datetime.date`` (matching Spark) while HUGEINT becomes
decimal128 → float — and (b) compares cells TYPE-STRICTLY: an int and a
float never compare equal here, whatever their numeric values.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

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
    """Normalize one cell to a hashable, TYPE-TAGGED representation.

    The tag (first tuple element) makes int-vs-float a mismatch, mirroring
    the driver's string-render hash where ``4994`` != ``4994.0``.
    """
    if v is None:
        return None
    # numpy scalars → python scalars, keeping the kind
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # collapse -0.0 and represent at comparable precision
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, pd.Timestamp):
        return ("d", v.isoformat())
    if isinstance(v, datetime):
        return ("d", v.isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _pdf_rows(pdf: pd.DataFrame):
    """Column-name-sorted, type-tagged, order-insensitive row tuples.

    Cells are pulled per-column with ``Series.tolist()`` so each column's
    dtype survives (``.values`` would upcast mixed frames to object/float).
    pandas nulls (NaN in float columns, NaT, pd.NA, None) all normalize to
    None — but an int column that pandas upcast to float64 *because of*
    nulls keeps its non-null cells tagged float, exactly as the driver
    hashes them.
    """
    cols = sorted(pdf.columns)
    col_values = []
    for c in cols:
        series = pdf[c]
        vals = []
        for v in series.tolist():
            if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            elif v is getattr(pd, "NA", object()):
                vals.append(None)
            else:
                vals.append(_norm_cell(v))
        col_values.append(vals)
    rows = [tuple(col[i] for col in col_values) for i in range(len(pdf))]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).arrow().to_pandas()
    finally:
        con.close()

    s_cols, s_rows = _pdf_rows(spark_pdf)
    o_cols, o_rows = _pdf_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(
            f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
        )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(f"first differing row #{i}: spark={sr} oracle={orow}")
            break
    return problems
