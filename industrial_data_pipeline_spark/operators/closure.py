"""Hierarchy transitive closure: full path per element (J4).

Reference: four near-identical ``WITH RECURSIVE element_paths`` CTEs
(/root/reference/src/database/populate.py:200-231 et al.) plus a
Python parent-pointer walk (/root/reference/database/database.py:811-839).

Spark shape: iterate level-by-level joins, accumulating a path string.
The loop runs depth(tree) times — plant hierarchies are ≤ ~6 deep — and
each iteration joins the (tiny, broadcast) resolved frontier to the
element dim, so there is no O(n²) blowup and no driver-side recursion
over rows. Lineage is truncated with localCheckpoint so the plan does
not grow with depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hierarchy_paths(element: DataFrame, sep: str = "|",
                    max_depth: int = 64) -> DataFrame:
    """element(level, element_id, name, parent_id) →
    + ``path`` = root.name ⟨sep⟩ ... ⟨sep⟩ self.name.

    Cycle-safe: stops after ``max_depth`` iterations (the reference has
    no cycle guard at all; its data can't cycle because ids are
    insertion-ordered).

    Caveat (documented behavior, matching the reference's recursive
    CTE): an element whose ``parent_id`` dangles (missing parent) or
    that sits inside a cycle never joins the resolved frontier, so
    it is OMITTED from the result — and attribute_paths consequently
    omits its attributes. Callers that must surface such rows should
    anti-join the input against this function's output.
    """
    elem = element.select("level", "element_id", "name", "parent_id")
    resolved = (
        elem.where(F.col("parent_id").isNull())
        .withColumn("path", F.col("name"))
    )
    frontier = resolved
    for _ in range(max_depth):
        children = (
            elem.alias("c")
            .join(F.broadcast(frontier.select(
                F.col("element_id").alias("parent_id"),
                F.col("path").alias("_parent_path"))), "parent_id")
            .select("c.level", "c.element_id", "c.name", "c.parent_id",
                    F.concat_ws(sep, "_parent_path", "c.name").alias("path"))
        )
        children = children.localCheckpoint(eager=True)
        if children.isEmpty():
            break
        resolved = resolved.unionByName(children)
        frontier = children
    return resolved


def attribute_paths(element: DataFrame, attribute: DataFrame,
                    sep: str = "|", attr_sep: str = "|",
                    prefix: str = "") -> DataFrame:
    """Full attribute path ``{prefix}elem⟨sep⟩...⟨sep⟩elem⟨attr_sep⟩attr``.

    Two reference key formats (D9):
    - DB form ``Root|Child|Leaf|Attr`` (database.py:819-838):
      sep="|", attr_sep="|"
    - PI form ``\\\\SERVER\\Root\\Child|Attr`` (populate.py:683-699):
      sep="\\\\", attr_sep="|", prefix="\\\\\\\\SERVER\\\\"
    """
    paths = hierarchy_paths(element, sep=sep).select("element_id", "path")
    return (
        attribute.join(F.broadcast(paths), "element_id")
        .select(
            "attribute_id",
            F.concat(F.lit(prefix), F.col("path"), F.lit(attr_sep),
                     F.col("name")).alias("attribute_path"),
        )
    )
