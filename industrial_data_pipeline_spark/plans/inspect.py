"""Helpers over ``df.explain("formatted")`` output.

These parse the human-readable formatted plan rather than walking the
JVM plan tree: the formatted text is the stable, documented surface
(it is what .explain prints for users), and string assertions keep the
checks version-tolerant across Spark minor releases.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of ``df.explain('formatted')``."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` list in the plan, flattened —
    the predicates that actually reached a parquet scan."""
    out: list[str] = []
    # greedy to the line's LAST bracket: an In(col, [v1,v2,...]) filter
    # contains a `]` of its own, and a non-greedy/negated-class match
    # would truncate the list there, silently dropping every filter
    # after the IN-list
    for m in re.finditer(r"PushedFilters: \[(.*)\]",
                         formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            # split on top-level commas (filter exprs contain none
            # nested except inside In(...) value lists, which is fine
            # for membership checks)
            out += [p.strip() for p in re.split(r",(?![^(]*\))", body)]
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def has_nested_loop_join(df: DataFrame) -> bool:
    """True if ANY BroadcastNestedLoopJoin appears. Note: a 1-row
    scalar broadcast cross join also reports as BNLJ and is fine —
    callers asserting absence should structure scalars via joins on a
    literal key, or assert on the specific join they care about."""
    return "BroadcastNestedLoopJoin" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen subtrees the plan compiles, from
    ``explain('codegen')`` ("Found N WholeStageCodegen subtrees") —
    the formatted mode hides codegen ids under AdaptiveSparkPlan.
    CAVEAT: with AQE enabled (our default) pre-execution plans report
    0 because stages are compiled adaptively at run time — use this
    on sessions/plans with adaptive disabled, or treat 0 as
    "unknown", not "interpreted"."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                  buf.getvalue())
    return int(m.group(1)) if m else 0
