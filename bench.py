"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are executed with the ``noop`` sink (full plan execution, no
driver-side collection) so the timing reflects engine throughput.
Scale-path operators run their production (xxhash64) variants, not the
md5-portable variants the correctness oracles use.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark import contract as C  # noqa: E402
from geniepool_etl_spark.operators import dedup as D  # noqa: E402
from geniepool_etl_spark.operators import packing as PK  # noqa: E402
from geniepool_etl_spark.operators import similarity as S  # noqa: E402
from geniepool_etl_spark.operators import text as TX  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench_queries(spark, sf_dir):
    docs = C._t(spark, sf_dir, "documents")
    emb = C._t(spark, sf_dir, "embeddings")
    return {
        "flagship_lake_nest": lambda: C.q_flagship_lake_nest(spark, sf_dir),
        "pricing_summary": lambda: C.q_a4_pricing_summary(spark, sf_dir),
        "broadcast_join_agg": lambda: C.q_j3_broadcast_join_agg(spark, sf_dir),
        "window_topk": lambda: C.q_w1_window_topk(spark, sf_dir),
        "events_session": lambda: C.q_events_session(spark, sf_dir),
        "events_tumbling": lambda: C.q_events_tumbling(spark, sf_dir),
        "dedup_exact": lambda: D.exact_dedup_stats(docs),
        "dedup_minhash_lsh": lambda: D.minhash_lsh_pairs(docs, num_perm=64, bands=16),
        "dedup_simhash": lambda: D.simhash_bands(docs, bands=4, bits=64),
        "text_stats": lambda: TX.with_token_count(TX.with_text_stats(docs)),
        "pack_windows": lambda: PK.pack_windows(docs),
        "sim_lsh_topk": lambda: S.lsh_bucket_topk(emb, k=5),
        "two_level_nest": lambda: C.q_a2_two_level_nest(spark, sf_dir),
    }


def main() -> None:
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("geniepool-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = bench_queries(spark, SF_DIR)
    # warm the JVM + file listing once with a trivial action
    C._t(spark, SF_DIR, "lineitem").limit(1).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, build in qs.items():
        # Per-query isolation: one broken plan must degrade to a
        # reported failure, not zero the whole round's signal.
        try:
            # Build the DataFrame (logical plan) once — client-side plan
            # construction is py4j chatter, not engine work, and at
            # cluster scale it amortizes to zero. Time executions only.
            df = build()
            # best-of-3: single runs on a shared machine show 2-3×
            # noise spikes; the minimum reflects engine cost
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            first = str(exc).strip().splitlines()[0] if str(exc) else ""
            errors[name] = f"{type(exc).__name__}: {first[:200]}"

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
