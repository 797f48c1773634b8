"""Events-family third-decade probe (r13, verdict #6): stage the
events table at sf10 (100x sf0.1) and sf100 (1000x sf0.1) and measure
`events_interval_join` and `events_session` across the decade.

Staging follows the bench's replication conventions: 10 copies per
decade with DISJOINT user/event-id ranges and the SAME timestamps, so
per-user streams keep their real temporal shape while keyed shuffles
see 10x/100x the users — the candidate volume of the bucketed range
join and the session windows must grow ~linearly with the copies (a
superlinear step between decades is the O(N^2) trap this probe
exists to catch).

Methodology per SCALE.md's r12 lesson: ONE session, ONE family,
3 untimed sf1 warm-ups per query (C2/JIT state is a 5-6x effect),
best-of-2 at sf10, single run at sf100, noop sink. Run on a quiet
box; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark import contract as C  # noqa: E402
from geniepool_etl_spark.functions import enable_nanos_as_long  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402

SF1_DIR = os.path.join(_HERE, ".benchdata", "sf1")
SF10_DIR = os.path.join(_HERE, ".benchdata", "sf10")
SF100_DIR = os.path.join(_HERE, ".benchdata", "sf100")


def _stage_events(spark, src_dir: str, dst_dir: str, copies: int = 10):
    dst = os.path.join(dst_dir, "events.parquet")
    if os.path.exists(dst):
        return
    ev = C._t(spark, src_dir, "events")
    ev_step = int(ev.agg(F.max("event_id")).first()[0]) + 1
    user_step = int(ev.agg(F.max("user_id")).first()[0]) + 1
    parts = []
    for i in range(copies):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * ev_step))
            .withColumn("user_id", F.col("user_id") + F.lit(i * user_step))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    os.makedirs(dst_dir, exist_ok=True)
    out.write.mode("overwrite").parquet(dst)


def main() -> None:
    spark = get_spark(
        "events-sf100-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    enable_nanos_as_long(spark)
    if not os.path.exists(os.path.join(SF1_DIR, "events.parquet")):
        raise SystemExit("stage sf1 first (run bench.py once)")
    _stage_events(spark, SF1_DIR, SF10_DIR)
    _stage_events(spark, SF10_DIR, SF100_DIR)

    queries = {
        "events_interval_join": C.q_events_interval_join,
        "events_session": C.q_events_session,
    }
    out: dict = {}
    for name, q in queries.items():
        for _ in range(3):  # warm at sf1, untimed
            q(spark, SF1_DIR).write.format("noop").mode("overwrite").save()
        best10 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q(spark, SF10_DIR).write.format("noop").mode("overwrite").save()
            best10 = min(best10, time.perf_counter() - t0)
        t0 = time.perf_counter()
        q(spark, SF100_DIR).write.format("noop").mode("overwrite").save()
        t100 = time.perf_counter() - t0
        out[name] = {
            "sf10_best2_sec": round(best10, 3),
            "sf100_sec": round(t100, 3),
            "decade_step": round(t100 / best10, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
