"""Driver simulation: plain session, import contract, run at sf0.01.

The compare helpers (`canon`, `col_exact`) are module-level so tests
can pin the harness's own semantics — notably the dtype-strict rule
(int-vs-float = MISMATCH, the r3 blind spot that let the q43/q66/q108
HUGEINT promotions read as green locally while the driver hashed red).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d[sorted(d.columns)].copy()
    for c in d.columns:
        if pd.api.types.is_datetime64_any_dtype(d[c]):
            d[c] = d[c].astype("datetime64[us]")
    return d.sort_values(by=list(d.columns),
                         kind="mergesort").reset_index(drop=True)


def col_exact(a: pd.Series, b: pd.Series) -> bool:
    # byte-exact float compare, mirroring the driver's value hash:
    # NaN==NaN, but -0.0 != 0.0 and 1 ulp is a mismatch.
    # The driver's hash is dtype-sensitive: an int64 Spark column
    # vs a float64 oracle column (DuckDB HUGEINT via fetchdf —
    # the q43/q66/q108 class) is a MISMATCH, never promoted.
    a_int = pd.api.types.is_integer_dtype(a)
    b_int = pd.api.types.is_integer_dtype(b)
    a_flt = pd.api.types.is_float_dtype(a)
    b_flt = pd.api.types.is_float_dtype(b)
    if (a_int and b_flt) or (a_flt and b_int):
        return False
    if a_flt or b_flt:
        av = a.astype("float64").to_numpy().view("uint64")
        bv = b.astype("float64").to_numpy().view("uint64")
        nan = np.isnan(a.astype("float64").to_numpy()) \
            & np.isnan(b.astype("float64").to_numpy())
        return bool(((av == bv) | nan).all())
    return bool(((a == b) | (a.isna() & b.isna())).all())


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    g, w = canon(sdf), canon(odf)
    ok_cols = list(g.columns) == list(w.columns)
    ok_rows = len(g) == len(w)
    ok_vals = ok_cols and ok_rows and all(
        col_exact(g[c], w[c]) for c in g.columns)
    return {"rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": bool(ok_vals),
            "spark_rows": len(g), "oracle_rows": len(w)}


def main() -> None:
    from pyspark.sql import SparkSession

    # deliberately NOT our session factory — the driver builds its own.
    # local[32] to match the driver's parallelism: partition-merge-order
    # float effects (the q43 class) only reproduce at the same width.
    cpus = os.environ.get("DC_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    import __spark_entry__ as e

    qfilter = os.environ.get("QF")  # comma-separated name substrings
    if not qfilter:
        df = e.entry(spark)
        rows = df.collect()
        print("entry(): rows =", len(rows), "cols =", len(df.columns))
        print("schema:", [f"{f.name}:{f.dataType.simpleString()}"
                          for f in df.schema.fields][:4], "...")
    sf = os.environ.get("SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    if qfilter:
        keys = [k.strip() for k in qfilter.split(",")]
        qs = {n: f for n, f in qs.items() if any(k in n for k in keys)}
    results = {}  # name → verdict dict (written to $OUT if set)
    for name, fn in qs.items():
        sdf = fn(spark, sf).toPandas()
        if name not in osql:
            print(f"{name}: rows-only, {len(sdf)} rows")
            results[name] = {"rows_only": True, "spark_rows": len(sdf)}
            continue
        odf = con.execute(osql[name]).fetchdf()
        verdict = compare(sdf, odf)
        ok = verdict["hash_match"]
        print(f"{name}: cols={verdict['schema_match']} "
              f"rowcount={verdict['rows_match']} "
              f"({verdict['spark_rows']}) "
              f"values={'MATCH' if ok else 'MISMATCH'}")
        results[name] = verdict

    out_path = os.environ.get("OUT")
    if out_path:
        import json
        merged = results
        if qfilter and os.path.exists(out_path):
            # filtered run: update just the re-verified entries in the
            # existing full-suite artifact instead of truncating it
            with open(out_path) as fh:
                prior = json.load(fh).get("results", {})
            merged = {**prior, **results}
        with open(out_path, "w") as fh:
            json.dump({"sf_dir": sf, "byte_exact": True,
                       "results": merged}, fh, indent=1, sort_keys=True)
        print(f"wrote {out_path} ({len(merged)} queries, "
              f"{len(results)} this run)")


if __name__ == "__main__":
    main()
