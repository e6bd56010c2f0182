"""Differential-oracle test harness: Spark vs DuckDB on the same parquet.

Re-expresses the reference's H2-based differential testing
(``presto-tests/.../QueryAssertions.java:97-122`` + ``H2QueryRunner.java``)
with DuckDB as the oracle, including the same canonicalization classes
H2QueryRunner works around (row order, float drift, timestamp units).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sensql_presto_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with every testdata table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell types, sort rows."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            ts = pd.to_datetime(s)
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[col] = ts.astype("datetime64[us]")
        elif s.dtype == object:
            # Decimal (duckdb quantile_cont etc.) and date objects → uniform
            pdf[col] = s.map(_norm_cell)
        elif pd.api.types.is_float_dtype(s):
            pdf[col] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[col] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[col] = s.astype("boolean")
    sort_key = pdf.apply(lambda s: s.map(_sort_token))
    order = sort_key.sort_values(by=list(sort_key.columns), kind="mergesort").index
    return pdf.loc[order].reset_index(drop=True)


def _norm_cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).tz_localize(None) if v.tzinfo else pd.Timestamp(v)
    if isinstance(v, datetime.date):
        return pd.Timestamp(v)
    if isinstance(v, (list, np.ndarray, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_token(v):
    # One token format per value class, shared by BOTH frames: if Spark
    # yields int64 and DuckDB float64 for the same column, per-dtype tokens
    # would sort the frames differently and misalign the row-wise compare.
    if isinstance(v, tuple):
        return "t" + ",".join(str(_sort_token(x)) for x in v)
    if v is None or (not isinstance(v, (str, bytes, tuple)) and pd.isna(v)):
        return ""
    if isinstance(v, (bool, np.bool_)):
        return f"b{v}"
    if isinstance(v, (int, float, np.integer, np.floating)):
        return f"f{float(v):+.12e}"
    return str(v)


def assert_frames_match(
    actual: pd.DataFrame, expected: pd.DataFrame, rtol: float = 1e-6, atol: float = 1e-9
) -> None:
    a, e = _canonicalize(actual), _canonicalize(expected)
    assert list(a.columns) == list(e.columns), f"columns differ: {list(a.columns)} vs {list(e.columns)}"
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    for col in a.columns:
        av, ev = a[col], e[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            af = av.astype("float64").to_numpy()
            ef = ev.astype("float64").to_numpy()
            ok = np.isclose(af, ef, rtol=rtol, atol=atol, equal_nan=True)
            ok |= np.isnan(af) & np.isnan(ef)
            assert ok.all(), f"column {col!r} differs (float): {af[~ok][:5]} vs {ef[~ok][:5]}"
        else:
            mism = ~((av == ev) | (av.isna() & ev.isna()))
            assert not mism.any(), (
                f"column {col!r} differs: {av[mism].head(5).tolist()} vs {ev[mism].head(5).tolist()}"
            )


def check_query_against_oracle(
    spark_df: DataFrame, oracle_sql: str, sf_dir: str, rtol: float = 1e-6
) -> None:
    actual = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        expected = con.sql(oracle_sql).df()
    finally:
        con.close()
    assert_frames_match(actual, expected, rtol=rtol)


# --- golden-output corpus (reference §5.3:
#     presto-product-tests/src/main/resources/sql-tests/testcases/) ----------


def parse_golden_case(sql_path: str) -> dict:
    """Parse a `.sql` + `.result` golden pair (reference header convention).

    .sql:    `-- database: spark; tables: nation; groups: group-by;` + SQL
    .result: `-- delimiter: |; types: BIGINT|VARCHAR` + delimited rows
    (see e.g. `sql-tests/testcases/group-by/runAggrWithoutGroupBy.sql`).
    """
    import os
    import re

    with open(sql_path) as f:
        sql_text = f.read()
    header = {}
    m = re.match(r"\s*--\s*(.*)", sql_text)
    if m:
        for kv in m.group(1).split(";"):
            if ":" in kv:
                k, v = kv.split(":", 1)
                header[k.strip()] = v.strip()
    sql = "\n".join(l for l in sql_text.splitlines() if not l.strip().startswith("--")).strip()

    result_path = os.path.splitext(sql_path)[0] + ".result"
    with open(result_path) as f:
        lines = [l.rstrip("\n") for l in f.read().splitlines()]
    delim, types = "|", []
    rows = []
    for line in lines:
        if line.startswith("--"):
            for kv in line[2:].split(";"):
                if ":" in kv:
                    k, v = kv.split(":", 1)
                    if k.strip() == "delimiter":
                        delim = v.strip() or "|"
                    elif k.strip() == "types":
                        types = [t.strip().upper() for t in v.strip().split("|")]
        elif line.strip():
            rows.append(line.split(delim))
    return {"header": header, "sql": sql, "types": types, "rows": rows}


def _parse_golden_value(text: str, typ: str):
    if text == "NULL":
        return None
    if typ in ("INTEGER", "BIGINT", "SMALLINT", "TINYINT"):
        return int(text)
    if typ in ("DOUBLE", "REAL", "DECIMAL", "FLOAT"):
        return float(text)
    if typ == "BOOLEAN":
        return text.lower() == "true"
    if typ in ("TIMESTAMP", "DATE"):
        return pd.Timestamp(text)
    return text  # CHAR / VARCHAR


def run_golden_case(spark, sf_dir: str, sql_path: str, rtol: float = 1e-6) -> None:
    """Run a golden case on Spark and compare to the stored .result rows.

    Mirrors the reference's comparison contract: ordered only when the
    query has a top-level ORDER BY, otherwise row-set equality.
    """
    from sensql_presto_spark import catalog as _catalog

    case = parse_golden_case(sql_path)
    # Mutable-table cases (reference testcases/insert/) are written as
    # semicolon-separated statements: every statement but the last is
    # setup DDL/DML, the last is the SELECT compared against .result.
    statements = [s.strip() for s in case["sql"].split(";") if s.strip()]
    for setup in statements[:-1]:
        try:
            _catalog.sql(spark, sf_dir, setup).collect()
        except Exception as exc:  # noqa: BLE001 — retried once below
            # A fresh session's catalog does not know a prior run's managed
            # table, so DROP TABLE IF EXISTS no-ops while the warehouse
            # directory persists and CREATE fails with
            # LOCATION_ALREADY_EXISTS; clear the stale location and retry.
            import re as _re
            import shutil as _shutil

            m = _re.search(r"location 'file:([^']+)' already exists", str(exc))
            if not m:
                raise
            _shutil.rmtree(m.group(1), ignore_errors=True)
            _catalog.sql(spark, sf_dir, setup).collect()
    actual = _catalog.sql(spark, sf_dir, statements[-1]).toPandas()
    types = case["types"] or ["VARCHAR"] * len(actual.columns)
    expected = pd.DataFrame(
        [
            [_parse_golden_value(cell, typ) for cell, typ in zip(row, types)]
            for row in case["rows"]
        ],
        columns=list(actual.columns),
    )
    for col, typ in zip(expected.columns, types):
        if typ in ("DOUBLE", "REAL", "DECIMAL", "FLOAT"):
            expected[col] = expected[col].astype("float64")
    assert_frames_match(actual, expected, rtol=rtol)
