"""Driver-posture sweep: run contract entries under a VANILLA
SparkSession with ANSI ON (the Spark 4 default the external driver
uses — tools/selfcheck.py runs the tuned session with ANSI off, so
ANSI regressions only surface here).

For each entry: execute twice (re-invocability in one session), count
rows, and reject array/map/struct/binary output columns (the driver's
pandas canonicalizer crashes on those).

Usage: python tools/ansi_sweep.py [sf_dir] [query ...]   (default: all
entries at /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BAD_PREFIXES = ("array", "map", "struct", "binary")


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    qs = m.queries()
    fails: list[tuple[str, str]] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            n = 0
            for _ in (1, 2):  # re-invocable in one session
                df = fn(spark, sf_dir)
                n = df.count()
                bad = [t for _, t in df.dtypes if t.startswith(BAD_PREFIXES)]
                if bad:
                    raise ValueError(f"complex output dtypes: {bad}")
            print(f"ansi-ok {name} ({n} rows)")
        except Exception as exc:  # noqa: BLE001 — harness boundary
            msg = f"{type(exc).__name__}: {str(exc).strip()[:160]}"
            fails.append((name, msg))
            print(f"ANSI-FAIL {name}: {msg}")
    total = len(only) if only else len(qs)
    print(f"\n{total - len(fails)} ok, {len(fails)} fail")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
