"""Generic table export — the reference's legacy routes.py surface.

/root/reference/database/routes.py:32-96 sketches a generic any-table
CSV export with three filter modes (none / time_range BETWEEN / exact)
and a streaming CSV HTTP response. Its backing functions don't exist
in the reference (dead code, SURVEY.md §2.9 note at §2.11), but the
semantics are trivially supportable, so we support them:

- :func:`export_table` — table + optional filter → DataFrame (P4/P5)
- :func:`stream_csv` — S9: CSV text chunks from ``toLocalIterator``
  (constant driver memory: one partition in flight, never the full
  result set — the Spark analog of the reference's row-generator
  Response)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def export_table(df: DataFrame, filter_type: str = "none",
                 column: str | None = None,
                 start=None, end=None, value=None) -> DataFrame:
    """Reference filter modes (routes.py:53-67): ``none``,
    ``time_range`` (BETWEEN, inclusive), ``exact``."""
    if filter_type == "none":
        return df
    if filter_type == "time_range":
        return df.where(F.col(column).between(F.lit(start), F.lit(end)))
    if filter_type == "exact":
        return df.where(F.col(column) == F.lit(value))
    raise ValueError(f"unknown filter_type: {filter_type}")


def stream_csv(df: DataFrame, chunk_rows: int = 1000) -> Iterator[str]:
    """S9: yield CSV text chunks (header first) without materializing
    the result on the driver — rows stream partition-by-partition via
    ``toLocalIterator``. Feed this to any web layer."""

    def esc(v) -> str:
        if v is None:
            return ""
        s = str(v)
        if any(c in s for c in (",", '"', "\n")):
            s = '"' + s.replace('"', '""') + '"'
        return s

    yield ",".join(df.columns) + "\n"
    buf: list[str] = []
    for row in df.toLocalIterator():
        buf.append(",".join(esc(v) for v in row) + "\n")
        if len(buf) >= chunk_rows:
            yield "".join(buf)
            buf = []
    if buf:
        yield "".join(buf)
