"""Differential-oracle test harness: Spark vs DuckDB on the same parquet.

Re-expresses the reference's H2-based differential testing
(``presto-tests/.../QueryAssertions.java:97-122`` + ``H2QueryRunner.java``)
with DuckDB as the oracle, including the same canonicalization classes
H2QueryRunner works around (row order, float drift, timestamp units).
"""

from __future__ import annotations

import math

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
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ""
    if isinstance(v, float):
        return f"f{v:+.6e}"
    if isinstance(v, tuple):
        return "t" + ",".join(str(_sort_token(x)) for x in v)
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
