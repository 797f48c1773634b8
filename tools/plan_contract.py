"""Dump .explain('formatted') for CONTRACT lanes into plans/r17/ (current round).

Usage: python tools/plan_contract.py <suffix> [--sf DIR] lane [lane ...]

Companion to tools/plan_r16.py (which covers bench lanes): the r16
evidence artifact for registry lanes touched by the optimization
round. Plans are captured at sf0.1 by default.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r17",
)


def main() -> None:
    args = sys.argv[1:]
    suffix = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    lanes = args

    import __spark_entry__ as entry_mod
    from geniepool_etl_spark.session import get_spark

    spark = get_spark("plan-contract")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for lane in lanes:
        df = qs[lane](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{lane}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
