"""Registry-wide plan audit: count Scan/Exchange/Python-eval nodes in
every contract entry's formatted plan and rank the repeated-pass
offenders.

Usage: python tools/audit_plans.py [sf_dir] [min_scans]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __spark_entry__ as entry_mod
    from geniepool_etl_spark.session import get_spark

    spark = get_spark("audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, build in entry_mod.queries().items():
        try:
            df = build(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, f"explain failed: {exc}"))
            continue
        scans = len(re.findall(r"Scan parquet|Scan text|Scan csv|Scan json", txt))
        exch = len(re.findall(r"\bExchange\b", txt))
        pyev = len(re.findall(r"BatchEvalPython|ArrowEvalPython", txt))
        rows.append((name, scans, exch, pyev, ""))

    rows.sort(key=lambda r: (-r[1], -r[2]))
    print(f"{'lane':44s} {'scans':>5s} {'exch':>5s} {'pyev':>4s}")
    for name, scans, exch, pyev, err in rows:
        if err:
            print(f"{name:44s} ERR {err[:80]}")
        elif scans >= min_scans or exch >= 10:
            print(f"{name:44s} {scans:5d} {exch:5d} {pyev:4d}")


if __name__ == "__main__":
    main()
