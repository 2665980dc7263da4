"""Audit: which registry queries carry an UNPARTITIONED WindowExec
(the 'Moving all data to a single partition' class)?  Builds every
query at sf0.001 and parses the executed plan; a window whose
windowspecdefinition holds only sort specs (every top-level element
before the frame carries ASC/DESC) has an empty partitionSpec.

Usage:  python tools/window_audit.py [qfilter-substrings,comma-sep]
Exit: prints one line per offending query: name, count, first spec.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from industrial_data_pipeline_spark.suite import REGISTRY  # noqa: E402

SF = os.environ.get("SF", "/root/testdata/sf0.001")


def split_top(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def unpartitioned_specs(plan: str) -> list[str]:
    bad = []
    i = 0
    while True:
        i = plan.find("windowspecdefinition(", i)
        if i < 0:
            break
        j, depth = i + len("windowspecdefinition("), 1
        k = j
        while depth and k < len(plan):
            depth += plan[k] == "("
            depth -= plan[k] == ")"
            k += 1
        inner = plan[j:k - 1]
        parts = [p for p in split_top(inner)
                 if not p.startswith("specifiedwindowframe")]
        if parts and all((" ASC" in p or " DESC" in p) for p in parts):
            bad.append(inner[:90])
        i = k
    return bad


qfilter = (sys.argv[1].split(",") if len(sys.argv) > 1 else None)
flagged = 0
for name, (fn, _sql) in sorted(REGISTRY.items()):
    if qfilter and not any(q in name for q in qfilter):
        continue
    try:
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: BUILD-ERROR {type(exc).__name__}: {exc}"[:160])
        continue
    bad = unpartitioned_specs(plan)
    if bad:
        flagged += 1
        print(f"{name}: {len(bad)} unpartitioned window(s); "
              f"e.g. {bad[0]}")
print(f"-- audit done: {flagged} flagged queries --")
