"""Pin the local driver-simulation harness's own compare semantics
(tools/drive_contract.py) — VERDICT r4 item 6: the r3 blind spot
(pandas promoting int64-vs-float64 to a passing compare) must never
return. No SparkSession needed; these exercise the pandas layer."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from drive_contract import canon, col_exact, compare  # noqa: E402


def test_int_vs_float_is_mismatch():
    """The q43/q66/q108 class: DuckDB HUGEINT arrives as float64 via
    fetchdf; Spark emits int64. Equal VALUES must still be a
    MISMATCH — the real driver hashes dtype-sensitively."""
    a = pd.Series([1, 2, 3], dtype="int64")
    b = pd.Series([1.0, 2.0, 3.0], dtype="float64")
    assert not col_exact(a, b)
    assert not col_exact(b, a)
    v = compare(pd.DataFrame({"x": a}), pd.DataFrame({"x": b}))
    assert v["rows_match"] and v["schema_match"]
    assert not v["hash_match"]


def test_float_compare_is_byte_exact():
    one_ulp = np.nextafter(1.0, 2.0)
    assert not col_exact(pd.Series([1.0]), pd.Series([one_ulp]))
    assert not col_exact(pd.Series([0.0]), pd.Series([-0.0]))
    assert col_exact(pd.Series([float("nan")]),
                     pd.Series([float("nan")]))
    assert col_exact(pd.Series([1.5, 2.5]), pd.Series([1.5, 2.5]))


def test_int32_vs_int64_ok():
    """Width differences within the integer family are NOT the bug —
    the driver compares values after a lossless widening."""
    assert col_exact(pd.Series([1, 2], dtype="int32"),
                     pd.Series([1, 2], dtype="int64"))


def test_canon_sorts_rows_and_columns():
    d = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    c = canon(d)
    assert list(c.columns) == ["a", "b"]
    assert c["a"].tolist() == ["x", "y"]


def test_compare_row_count_and_schema_gates():
    g = pd.DataFrame({"x": [1, 2]})
    assert not compare(g, pd.DataFrame({"x": [1]}))["rows_match"]
    assert not compare(g, pd.DataFrame({"y": [1, 2]}))["schema_match"]


def test_merge_bench_minima_fold():
    """tools/merge_bench.py: elementwise min, carry-through for
    queries new to either side, value re-derived as the sum, and a
    hard error on sf mismatch (cross-SF minima are meaningless)."""
    import pytest
    from tools.merge_bench import merge
    minima = {"sf": 0.1, "unit": "sec",
              "queries": {"a": 1.0, "b": 2.0, "gone": 9.0}}
    run = {"sf": 0.1, "unit": "sec",
           "queries": {"a": 0.5, "b": 3.0, "new": 4.0}}
    out, rep = merge(minima, run)
    assert out["queries"] == {"a": 0.5, "b": 2.0, "gone": 9.0,
                              "new": 4.0}
    assert out["value"] == 15.5
    assert rep["n_improved"] == 1 and rep["added"] == ["new"]
    with pytest.raises(SystemExit):
        merge({"sf": 0.1, "unit": "sec", "queries": {}},
              {"sf": 0.01, "unit": "sec", "queries": {}})


def test_merge_bench_drift_report(tmp_path):
    """tools/merge_bench.py (VERDICT r7 item 6): the fold emits
    run-vs-minima ratios, flags only >2x entries, treats added
    queries as new minima (no ratio), and write_drift_report
    persists BENCH_DRIFT.json next to the minima file."""
    import json
    import os

    from tools.merge_bench import merge, write_drift_report

    minima = {"sf": 0.1, "unit": "sec",
              "queries": {"q1": 1.0, "q2": 2.0, "q3": 0.5}}
    run = {"sf": 0.1, "unit": "sec",
           "queries": {"q1": 1.5, "q2": 5.0, "q3": 0.4, "q4": 9.9}}
    folded, rep = merge(minima, run)
    assert folded["queries"] == {"q1": 1.0, "q2": 2.0, "q3": 0.4,
                                 "q4": 9.9}
    assert rep["ratios"] == {"q1": 1.5, "q2": 2.5, "q3": 1.0}
    assert rep["outliers"] == {"q2": 2.5}  # only the >2x entry
    assert rep["added"] == ["q4"] and "q4" not in rep["ratios"]
    minima_path = str(tmp_path / "BENCH_DETAIL.json")
    with open(minima_path, "w") as fh:
        json.dump(folded, fh)
    drift_path = write_drift_report(rep, minima_path)
    assert os.path.basename(drift_path) == "BENCH_DRIFT.json"
    with open(drift_path) as fh:
        drift = json.load(fh)
    assert drift["n_outliers"] == 1 and drift["outliers"] == {"q2": 2.5}

    import pytest

    with pytest.raises(SystemExit):  # sf mismatch refuses to fold
        merge({"sf": 0.01, "unit": "sec", "queries": {}}, run)
