"""Profile ONE bench lane: run it with the Spark UI enabled and dump
per-stage wall time, task time, shuffle read/write bytes and records
from the UI REST API — the guide's "empirical loop" (§1.1/§7.1)
without a browser.

Usage: python tools/profile_lane.py <lane> [--sf1|--sf10] [--runs N]

Lane names are bench.bench_queries / sf1_queries / sf10_queries keys.
The lane is built once, executed ``runs`` times against the noop sink
(first run includes JIT warm-up; per-run wall seconds printed), then
the stage table of the LAST run's job group is printed sorted by task
time. Job descriptions are set per run so stages map to runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    lane = sys.argv[1]
    tier = "sf0.1"
    runs = 2
    args = sys.argv[2:]
    if "--sf1" in args:
        tier = "sf1"
    if "--sf10" in args:
        tier = "sf10"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    spark = bench.get_spark(
        "profile-lane",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if tier == "sf0.1":
        qs = bench.bench_queries(spark, bench.SF_DIR)
    elif tier == "sf1":
        bench._stage_sf1(spark, bench.SF_DIR)
        qs = bench.sf1_queries(spark)
    else:
        bench._stage_sf1(spark, bench.SF_DIR)
        bench._stage_sf10(spark)
        qs = bench.sf10_queries(spark)
    df = qs[lane]()

    wall = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{lane} run{i}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall.append(round(time.perf_counter() - t0, 3))
    print(f"wall seconds per run: {wall}")

    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    # stages of the LAST run only: submissionTime >= last run start.
    # Simpler: take the most recent len-proportional slice by stageId —
    # print everything with per-stage metrics and let the reader slice.
    rows = []
    for s in stages:
        rows.append(
            (
                s["stageId"],
                s.get("executorRunTime", 0) / 1000.0,
                (s.get("executorDeserializeTime", 0)) / 1000.0,
                s.get("shuffleReadBytes", 0) / 1e6,
                s.get("shuffleWriteBytes", 0) / 1e6,
                s.get("shuffleReadRecords", 0),
                s.get("shuffleWriteRecords", 0),
                s.get("inputBytes", 0) / 1e6,
                s.get("outputBytes", 0) / 1e6,
                s.get("numTasks", 0),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(key=lambda r: -r[1])
    print(
        f"{'stage':>5} {'taskSec':>8} {'deser':>6} {'shRdMB':>8} "
        f"{'shWrMB':>8} {'shRdRec':>10} {'shWrRec':>10} {'inMB':>8} "
        f"{'tasks':>5}  name"
    )
    for r in rows[:40]:
        print(
            f"{r[0]:>5} {r[1]:>8.2f} {r[2]:>6.2f} {r[3]:>8.1f} "
            f"{r[4]:>8.1f} {r[5]:>10} {r[6]:>10} {r[7]:>8.1f} "
            f"{r[9]:>5}  {r[10]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
