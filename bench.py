"""Benchmark harness: run the suite's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed end-to-end (plan + execute) with a noop sink so
every output column is computed but nothing is shipped to the driver.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    spark = get_spark("idp-bench", cores=cpus)

    # warm the JVM/codegen once with the flagship so q01 doesn't pay
    # session startup.
    REGISTRY["q01_export_long"][0](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, (fn, _sql) in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            # one broken query must not void the whole suite's
            # numbers — record it and keep the JSON line parseable
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[bench] {name} FAILED: {errors[name]}",
                  file=sys.stderr)

    total = round(sum(timings.values()), 4)
    result = {
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
