"""Catalog lookup operators: exact / LIKE search, leaf-element listing.

Reference surface (SURVEY.md §2.2, §2.11): the web app's lookup
endpoint dispatches on the presence of ``%`` in the user string —
exact match otherwise (/root/reference/database/web_app.py:423-488);
element/attribute search is case-insensitive LIKE
(/root/reference/database/database.py:256-306); "leaf" elements use
the reference's heuristic ``parent_id IS NULL OR level = MAX(level)``
(/root/reference/database/database.py:92-97), which mislabels ragged
trees — we implement both the compat heuristic and true leaf-ness
(SURVEY.md §2.12.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def search_by_name(df: DataFrame, pattern: str) -> DataFrame:
    """Case-insensitive LIKE with user-supplied % wildcards (P6).
    Reference: WHERE LOWER(name) LIKE LOWER(%s), database.py:256-262."""
    return df.where(F.lower(F.col("name")).like(pattern.lower()))


def exact_first(df: DataFrame, name: str, order_col: str) -> DataFrame:
    """Exact-match, first row (P5+W2). Reference: WHERE name=%s LIMIT 1
    (database.py:120-125) — PostgreSQL's "first" is arbitrary; we order
    by the key column so the result is deterministic."""
    return df.where(F.col("name") == name).orderBy(order_col).limit(1)


def lookup_dispatch(df: DataFrame, text: str, order_col: str) -> DataFrame:
    """The /api/lookup dispatch: '%' present → pattern, else exact
    (web_app.py:423-488)."""
    if "%" in text:
        return search_by_name(df, text)
    return exact_first(df, text, order_col)


def leaf_elements_heuristic(element: DataFrame) -> DataFrame:
    """Reference 'leaf' heuristic (P7+A3): roots OR deepest level.
    The scalar subquery MAX(level) becomes a 1-row broadcast cross
    join — no shuffle of the main table."""
    max_level = element.agg(F.max("level").alias("_max_level"))
    return (
        element.crossJoin(F.broadcast(max_level))
        .where(F.col("parent_id").isNull()
               | (F.col("level") == F.col("_max_level")))
        .drop("_max_level")
    )


def leaf_elements_true(element: DataFrame) -> DataFrame:
    """True leaves: elements that no other element claims as parent —
    a left_anti self-join (the correct semantics, SURVEY.md §2.12.4)."""
    parents = element.select(F.col("parent_id").alias("element_id")).where(
        F.col("element_id").isNotNull()).distinct()
    return element.join(parents, "element_id", "left_anti")
