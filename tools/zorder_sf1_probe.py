"""Measured cost-model probe for snaptable.compact(zorder_by=...)
(r15): the sf1 lineitem (~6M rows) lands hash-scattered into a
snaptable, then ONE z-order compaction pass re-clusters it on the
Morton key of (za, zb). Records, for a 64/1024-wide range probe on
EACH axis: files scanned pre/post, rows read pre/post (the pruned
read's real cost), and the compaction's own wall time — the numbers
the "when does the maintenance pass pay for itself" cost model in
SCALE.md cites.

Run isolated (nothing else on the box): python tools/zorder_sf1_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark import snaptable as T  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata", "sf1",
)
FILES = 64


def main() -> None:
    spark = get_spark("zorder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber", "l_quantity",
        (F.col("l_orderkey") % 1024).cast("long").alias("za"),
        (F.col("l_partkey") % 1024).cast("long").alias("zb"),
    )
    out = os.path.join(tempfile.mkdtemp(prefix="gp_zorder_probe_"), "t")
    t0 = time.perf_counter()
    T.write_table(li.repartition(FILES), out, "create",
                  stats_cols=("za", "zb"))
    t_create = time.perf_counter() - t0

    def probe(tag: str) -> dict:
        res = {}
        for col in ("za", "zb"):
            total, scanned = T.scan_stats(spark, out, col, 100, 163)
            t0 = time.perf_counter()
            n = T.read_range(spark, out, col, 100, 163).count()
            dt = time.perf_counter() - t0
            res[col] = {
                "files_total": total, "files_scanned": scanned,
                "rows": n, "read_sec": round(dt, 3),
            }
        return res

    pre = probe("pre")
    t0 = time.perf_counter()
    T.compact(spark, out, target_files=FILES, zorder_by=("za", "zb"))
    t_compact = time.perf_counter() - t0
    post = probe("post")
    print(json.dumps({
        "rows_total": int(li.count()),
        "files": FILES,
        "create_sec": round(t_create, 3),
        "compact_sec": round(t_compact, 3),
        "pre": pre,
        "post": post,
    }, indent=2))
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
