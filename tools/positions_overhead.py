"""Measure the positional-postings trade (q301): positions add
storage to the postings asset but must cost BM25 probes ZERO extra
bytes (column pruning drops `pos` from the scoring scan; only
phrase_probe reads it). Builds the stored index over a 16× documents
corpus, then reads every postings parquet footer and reports
per-column compressed bytes — the storage overhead is
bytes(pos) / bytes(all columns), and the probe-read fraction is
bytes(columns a BM25 probe reads) / bytes(all), which together with
the ReadSchema plan assert (tests/test_bm25_index.py) pins the
"phrase capability is storage-only" claim with a measured number.

Writes tools/positions_overhead_result.json.
Run: python tools/positions_overhead.py
"""

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

XL_FACTOR = 16
N_BUCKETS = 32


def main() -> None:
    import pyarrow.parquet as pq

    from industrial_data_pipeline_spark.operators.bm25_index import (
        StoredBm25Index)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    docs = (spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
            .select("doc_id", "text"))
    n_docs = docs.count()
    xl = docs
    for i in range(1, XL_FACTOR):
        xl = xl.unionAll(docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text"))

    root = tempfile.mkdtemp(prefix="idp_posmeter_")
    try:
        idx = StoredBm25Index(spark, root, n_buckets=N_BUCKETS)
        idx.build(xl)
        per_col: dict[str, int] = {}
        n_files = 0
        for path in glob.glob(os.path.join(root, "postings",
                                           "**", "*.parquet"),
                              recursive=True):
            n_files += 1
            meta = pq.ParquetFile(path).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema.split(".")[0]
                    per_col[name] = (per_col.get(name, 0)
                                     + c.total_compressed_size)
        total = sum(per_col.values())
        pos_b = per_col.get("pos", 0)
        probe_cols = ("term", "doc_id", "tf", "dl")
        probe_b = sum(per_col.get(c, 0) for c in probe_cols)
        result = {
            "corpus_docs": n_docs * XL_FACTOR,
            "n_buckets": N_BUCKETS,
            "n_postings_files": n_files,
            "bytes_per_column": dict(sorted(per_col.items())),
            "bytes_total": total,
            "bytes_pos": pos_b,
            "bytes_probe_columns": probe_b,
            "pos_storage_overhead": round(pos_b / total, 4),
            "probe_read_fraction": round(probe_b / total, 4),
            "note": ("positions cost pos_storage_overhead of the "
                     "postings asset on disk and 0 extra probe "
                     "bytes: BM25 scoring reads only "
                     "term/doc_id/tf/dl (ReadSchema plan-asserted "
                     "in tests/test_bm25_index.py); only "
                     "phrase_probe decodes pos"),
        }
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "positions_overhead_result.json")
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
