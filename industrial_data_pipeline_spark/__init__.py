"""industrial_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference plant-monitoring pipeline (steviee-usyd2906/
Industrial-Data-Pipeline, surveyed in SURVEY.md): a hierarchical asset
catalog over a long-format time-series fact table, wide-format export,
formula-defined derived attributes with backfill + incremental
maintenance, plus large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, broadcast joins for the small dimension tables, Parquet
storage partitioned for 100 TB scale, Structured Streaming for the
incremental paths. No row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"
