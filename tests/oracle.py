"""Local replica of the driver's DuckDB-oracle comparison.

For each suite entry: run the Spark plan and the oracle SQL on the
same parquet files, then compare row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by all
columns). Floats compare to 1e-9 relative tolerance — close enough to
flag any real semantic drift while tolerating summation-order ulps.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from industrial_data_pipeline_spark.suite import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]) or pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & w.isna()
            close = pd.Series(
                [True if bn else _isclose(a, b)
                 for a, b, bn in zip(g, w, both_nan)])
            bad = (~close).sum()
            assert bad == 0, (
                f"{name}.{c}: {bad} value mismatches, e.g. "
                f"{list(zip(g[~close][:3], w[~close][:3]))}")
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"{name}.{c}: mismatch e.g. {list(zip(g[~eq][:3], w[~eq][:3]))}")


def _isclose(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if pd.isna(a) or pd.isna(b):
        return False
    return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
