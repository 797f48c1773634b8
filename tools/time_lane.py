"""Time CONTRACT lanes (registry entries, not bench lanes) in
isolation: build the plan once, warm up, then best-of-N noop-sink
executions. Comparable only to other time_lane runs on the same box.

Usage: python tools/time_lane.py [--sf DIR] [--warm W] [--runs N] lane [lane ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    warm, runs = 2, 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--warm" in args:
        i = args.index("--warm")
        warm = int(args[i + 1])
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    lanes = args

    import __spark_entry__ as entry_mod
    from geniepool_etl_spark.session import get_spark

    spark = get_spark("time-lane")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for lane in lanes:
        build = qs[lane]
        walls = []
        for i in range(warm + runs):
            df = build(spark, sf_dir)  # fresh build: re-invocability
            spark.sparkContext.setJobDescription(f"{lane} run {i}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        timed = walls[warm:]
        print(
            f"{lane}: all={walls} best={min(timed)} "
            f"median={sorted(timed)[len(timed) // 2]}"
        )


if __name__ == "__main__":
    main()
