"""Property-based formula DSL checks (SURVEY.md §5 plan item c):
random well-formed formulas must evaluate identically in Spark and in
a reference Python evaluator, including NULL propagation and the
div-by-zero → NULL rule."""

import math

from hypothesis import given, settings, strategies as st

from industrial_data_pipeline_spark.functions.formula import (
    compile_formula,
    emit_sql,
    referenced_ids,
)

IDS = [1, 2, 3]


@st.composite
def formulas(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        if draw(st.booleans()):
            return f"${draw(st.sampled_from(IDS))}"
        return str(draw(st.integers(min_value=0, max_value=9)))
    left = draw(formulas(depth=depth + 1))
    right = draw(formulas(depth=depth + 1))
    op = draw(st.sampled_from(["+", "-", "*", "/"]))
    return f"({left} {op} {right})"


def py_eval(formula: str, env: dict[int, float | None]):
    """Reference evaluator mirroring the DSL semantics."""
    import re

    def sub(m):
        return f"__v{m.group(1)}"

    expr = re.sub(r"\$(\d+)", sub, formula)

    names = {f"__v{i}": v for i, v in env.items()}
    if any(names[f"__v{i}"] is None for i in referenced_ids(formula)):
        return None
    try:
        val = eval(expr, {"__builtins__": {}}, names)  # noqa: S307 (test)
    except ZeroDivisionError:
        return None
    return float(val)


@settings(max_examples=30, deadline=None)
@given(formulas(),
       st.tuples(*[st.one_of(st.none(),
                             st.floats(min_value=-100, max_value=100,
                                       allow_nan=False))
                   for _ in IDS]))
def test_formula_matches_python_semantics(spark, formula, values):
    env = dict(zip(IDS, values))
    df = spark.createDataFrame(
        [tuple(values)], "c1 double, c2 double, c3 double")
    col = compile_formula(formula, lambda i: f"c{i}")
    got = df.select(col.cast("double").alias("v")).first()["v"]
    want = py_eval(formula, env)
    # Python eval of nested division can produce NULL-by-zero at any
    # depth; our DSL turns /0 into NULL which then propagates
    if want is None:
        assert got is None or got != got  # NULL (or NaN from 0/0)
    elif math.isnan(want):
        assert got is None or got != got
    elif math.isinf(want):
        assert got is None or math.isinf(got)
    else:
        assert got is not None
        assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=50, deadline=None)
@given(formulas())
def test_emitted_sql_parses_in_duckdb(formula):
    import duckdb

    sql = emit_sql(formula, lambda i: f"c{i}")
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1.0 c1, 2.0 c2, 3.0 c3")
    con.execute(f"SELECT {sql} FROM t").fetchone()
