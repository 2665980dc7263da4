"""Legacy generic-export surface (routes.py semantics) + CSV streaming."""

from datetime import datetime

import pytest

from industrial_data_pipeline_spark.operators.table_export import (
    export_table,
    stream_csv,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, datetime(2025, 1, 1), "a,b"), (2, datetime(2025, 1, 2), 'q"x'),
         (3, datetime(2025, 1, 3), None)],
        "id long, ts timestamp, s string")


def test_filter_modes(df):
    assert export_table(df).count() == 3
    tr = export_table(df, "time_range", "ts",
                      datetime(2025, 1, 1), datetime(2025, 1, 2))
    assert tr.count() == 2  # BETWEEN inclusive both ends
    ex = export_table(df, "exact", "id", value=2)
    assert ex.count() == 1
    with pytest.raises(ValueError, match="unknown filter_type"):
        export_table(df, "bogus")


def test_stream_csv_chunks_and_escaping(df):
    chunks = list(stream_csv(df.orderBy("id"), chunk_rows=2))
    text = "".join(chunks)
    lines = text.splitlines()
    assert lines[0] == "id,ts,s"
    assert lines[1].endswith('"a,b"')       # comma quoted
    assert '"q""x"' in lines[2]             # quote doubled
    assert lines[3].endswith(",")           # NULL → empty
    assert len(chunks) >= 2                 # header + >=1 data chunk
