"""Local replica of the driver's DuckDB-oracle comparison.

For each suite entry: run the Spark plan and the oracle SQL on the
same parquet files, then compare row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by all
columns). Floats compare BYTE-exactly (uint64 view: NaN==NaN but
-0.0 != 0.0 and one ulp is a mismatch) — the driver's verdict is a
value hash, so anything weaker here lets order-sensitive summation
slip through to a red CORRECTNESS row (the round-2 q43/q66/q67
lesson).
"""

from __future__ import annotations

import duckdb
import numpy as np
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
            gv = g.astype("float64").to_numpy()
            wv = w.astype("float64").to_numpy()
            eq = pd.Series((gv.view("uint64") == wv.view("uint64"))
                           | (np.isnan(gv) & np.isnan(wv)))
            bad = int((~eq).sum())
            assert bad == 0, (
                f"{name}.{c}: {bad} byte-exact mismatches, e.g. "
                f"{list(zip(g[~eq][:3], w[~eq][:3]))}")
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"{name}.{c}: mismatch e.g. {list(zip(g[~eq][:3], w[~eq][:3]))}")
