"""Subset re-runner with bench.py's exact methodology (noop sink,
same session factory, same warmup), repeated N times, reporting
per-query minima — the only comparable signal under this sandbox's
co-tenancy noise (BENCH_DETAIL discipline applied to an A/B loop).

Usage::

    python tools/mini_bench.py q304_tenant_asof_hybrid q298_...
    MB_RUNS=3 python tools/mini_bench.py ...         # default 3
    MB_OUT=/tmp/after.json python tools/mini_bench.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: mini_bench.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    runs = int(os.environ.get("MB_RUNS", "3"))
    out_path = os.environ.get("MB_OUT", "/tmp/mini_bench.json")

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    spark = get_spark("idp-mini-bench")
    REGISTRY["q01_export_long"][0](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    all_runs: dict[str, list[float]] = {n: [] for n in names}
    for r in range(runs):
        for name in names:
            fn, _ = REGISTRY[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            secs = round(time.perf_counter() - t0, 3)
            all_runs[name].append(secs)
            print(f"[run {r}] {name}: {secs}s", flush=True)
    result = {n: {"min": min(v), "runs": v}
              for n, v in all_runs.items()}
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({n: r["min"] for n, r in result.items()}))


if __name__ == "__main__":
    main()
