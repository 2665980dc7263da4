"""Dump .explain("formatted") for the round-14 optimization targets.

Writes plans/r15/<query>_<tag>.txt for each named query — run with
tag=before prior to touching a query and tag=after when done (the
judge checks OPTIMIZATION_r15.md's plan claims against these files).

Lifecycle queries return an eager localCheckpoint, so the returned
frame's plan is a bare ExistingRDD scan — the interesting plans are
INTERNAL. This tool therefore also captures, in call order:

* the plan of every DataFrame the query localCheckpoints (the probe /
  fusion plans, BEFORE they collapse into an RDD scan), and
* the plan of every DataFrame written via DataFrameWriter.parquet /
  .save (the build/append/rewrite write plans — where the exchange
  shape of the asset writers shows).

Usage::

    python tools/plan_dump_r15.py before q304_tenant_asof_hybrid ...
    PD_SF_DIR=/root/testdata/sf0.1 python tools/plan_dump_r15.py after qXX
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r15")

SECTIONS: list[tuple[str, str]] = []


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    if len(sys.argv) < 3:
        print("usage: plan_dump_r15.py <tag> <query> [...]",
              file=sys.stderr)
        sys.exit(2)
    tag, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("PD_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)

    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    orig_lc = DataFrame.localCheckpoint
    orig_pq = DataFrameWriter.parquet
    orig_save = DataFrameWriter.save

    def lc(self, eager=True):
        SECTIONS.append(("localCheckpoint", _fmt(self)))
        return orig_lc(self, eager)

    def pq(self, path, **kw):
        SECTIONS.append((f"write.parquet {os.path.basename(path)}",
                         _fmt(self._df)))
        return orig_pq(self, path, **kw)

    def save(self, path=None, **kw):
        SECTIONS.append(("write.save", _fmt(self._df)))
        return orig_save(self, path, **kw)

    DataFrame.localCheckpoint = lc
    DataFrameWriter.parquet = pq
    DataFrameWriter.save = save

    spark = get_spark("idp-plan-dump")
    for name in names:
        fn, _ = REGISTRY[name]
        SECTIONS.clear()
        df = fn(spark, sf_dir)
        final = _fmt(df)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} (sf_dir={sf_dir})\n")
            for i, (kind, text) in enumerate(SECTIONS):
                fh.write(f"\n## internal plan {i} — {kind}\n\n")
                fh.write(text)
            fh.write("\n## returned frame\n\n")
            fh.write(final)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
