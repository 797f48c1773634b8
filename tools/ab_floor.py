"""A/B floor re-anchoring probe (r13, verdict #1 / the repo's own r9
dedup_semantic rule): run a SUBSET of bench lanes in ISOLATION from an
arbitrary checkout of this repo, with explicit JIT warm-up, and print
one JSON line of per-lane floor seconds.

Usage:
    python tools/ab_floor.py <repo_root> lane [lane ...]

``repo_root`` may be a git worktree of a historical commit — the probe
imports THAT tree's ``bench.py`` and package (sys.path is rooted
there), so the same protocol times the same lanes under old and new
code on the SAME box. Protocol per lane: build the plan once, 3
untimed executions (C2 JIT warm-up is a 5-6x effect on sub-minute
shuffle jobs — SCALE.md), then best-of-5 timed noop-sink executions.
Floors measured this way are comparable ONLY to other ab_floor runs,
which is the point: when a historical commit cannot reproduce its own
recorded floor on the current box but matches HEAD within noise, the
recorded floor is box-state history and BENCH_BASELINE.json is
re-anchored to the A/B value.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    lanes = sys.argv[2:]
    sys.path.insert(0, root)
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    # bench.py module-level code self-roots sys.path and reads
    # SPARK_GRAFT_SF_DIR; executing it does NOT run main()
    spec.loader.exec_module(bench)

    spark = bench.get_spark(
        "ab-floor",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench.bench_queries(spark, bench.SF_DIR)
    missing = [n for n in lanes if n not in qs]
    if missing:
        print(json.dumps({"error": f"unknown lanes: {missing}"}))
        sys.exit(2)

    out: dict[str, float] = {}
    for name in lanes:
        df = qs[name]()
        for _ in range(3):  # untimed: C2 + shuffle-service warm-up
            df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"root": root, "floors": out}))


if __name__ == "__main__":
    main()
