"""Quiet-window isolated re-measure of BENCH_DRIFT outliers.

The drift gate flags queries whose last full-suite run exceeded 2× the
folded minima — under this container's documented ±2× noise band most
flags are co-tenancy noise, so the protocol (rounds 7/8) is: re-run
each flagged query ALONE (N isolated timings, take min) with nothing
else on the machine, fold the results into BENCH_DETAIL.json via
tools/merge_bench.py, and record a per-query verdict.

    python tools/drift_remeasure.py            # flags from BENCH_DRIFT
    QF=q26,q27 python tools/drift_remeasure.py # explicit list
    DRIFT_RUNS=3 ... (default 3)
    REBASE=q248 ...                            # re-baseline (see below)

Prints one JSON object: per-query {minimum, isolated, ratio, verdict}
where verdict = "noise" (isolated ≤ 1.5× minimum), "watch" (≤ 2×),
"regression" (> 2× even isolated). Folds the isolated minima in (an
improving measurement lowers the floor; a noisy one changes nothing).

``REBASE`` (comma-separated substrings) REPLACES the stored minimum
with the fresh isolated minimum even when it is HIGHER — the verdict
r9 item-4 case: a root-caused STRUCTURAL trade (q248's
production-shaped asset layout costs ~2.3 s of one-time in-query
build at toy scale) leaves the old floor unreachable by design, and a
fold-only merge would flag the query every round forever. Use only
for triaged, documented regressions; the rebase is recorded in the
printed verdict ("rebased": true).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_RUNS = int(os.environ.get("DRIFT_RUNS", "3"))
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    with open(os.path.join(HERE, "BENCH_DETAIL.json")) as fh:
        minima = json.load(fh)
    qf = os.environ.get("QF")
    if qf:
        targets = [q for q in minima["queries"]
                   if any(s in q for s in qf.split(","))]
    else:
        with open(os.path.join(HERE, "BENCH_DRIFT.json")) as fh:
            targets = sorted(json.load(fh)["outliers"])
    if not targets:
        print(json.dumps({"note": "no outliers to re-measure"}))
        return

    from industrial_data_pipeline_spark.session import get_spark
    from industrial_data_pipeline_spark.suite import REGISTRY

    spark = get_spark("idp-drift", cores=cpus)
    # warm startup paths so the first target doesn't absorb them
    REGISTRY["q01_export_long"][0](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()

    isolated: dict[str, float] = {}
    for name in targets:
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            REGISTRY[name][0](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        isolated[name] = round(best, 4)

    from tools.merge_bench import merge
    run = {"sf": minima.get("sf"), "unit": minima.get("unit", "sec"),
           "queries": isolated}
    folded, _ = merge(minima, run)
    rebase = [q for q in targets
              if any(s in q for s in
                     os.environ.get("REBASE", "").split(",") if s)]
    for q in rebase:
        folded["queries"][q] = isolated[q]
    with open(os.path.join(HERE, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(folded, fh, indent=1, sort_keys=False)
        fh.write("\n")

    out = {}
    for name in targets:
        floor = folded["queries"][name]
        ratio = round(isolated[name] / floor, 2) if floor else 1.0
        out[name] = {
            "minimum": floor, "isolated": isolated[name],
            "ratio": ratio,
            "verdict": ("noise" if ratio <= 1.5 else
                        "watch" if ratio <= 2.0 else "regression"),
        }
        if name in rebase:
            out[name]["rebased"] = True
    print(json.dumps({"n_runs": N_RUNS, "results": out}, indent=1))


if __name__ == "__main__":
    main()
