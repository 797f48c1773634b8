"""A/B floor probe for the STAGED sf1/sf10 bench tiers (companion to
tools/ab_floor.py, which covers the sf0.1 headline lanes).

Usage: python tools/ab_sf.py <repo_root> --sf1|--sf10 lane [lane ...]

``repo_root`` may be a git worktree of a historical commit — the probe
imports THAT tree's ``bench.py`` and package, so the same protocol
times the same staged tables under old and new code on the SAME box.
Protocol per lane: build the plan once, 2 untimed warm-up executions
(C2 JIT is a multi-x effect on sub-minute shuffle jobs), then
best-of-3 timed noop-sink executions. Interleave invocations of the
two roots (A B A B) to cancel slow box drift.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    args = sys.argv[2:]
    tier = "sf1"
    if "--sf10" in args:
        tier = "sf10"
    lanes = [a for a in args if not a.startswith("--")]
    sys.path.insert(0, root)
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    spark = bench.get_spark(
        "ab-sf",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._stage_sf1(spark, bench.SF_DIR)
    if tier == "sf10":
        bench._stage_sf10(spark)
        qs = bench.sf10_queries(spark)
    else:
        qs = bench.sf1_queries(spark)
    missing = [n for n in lanes if n not in qs]
    if missing:
        print(json.dumps({"error": f"unknown lanes: {missing}"}))
        sys.exit(2)

    out: dict[str, list] = {}
    for name in lanes:
        spark.sparkContext.setJobDescription(f"ab_sf {tier} {name}")
        df = qs[name]()
        for _ in range(2):  # untimed warm-up
            df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
    print(json.dumps({"root": root, "tier": tier, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
