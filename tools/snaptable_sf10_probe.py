"""Snaptable-family decade probe (r14, verdict #5): stage a
10M-row / O(100)-file snaptable from the sf10 events staging and
measure the three costs the family's 100 TB story rests on:

(a) merge-on-read DV reads — at zero vectors, at ~0.93M accumulated
    vectors (broadcast anti-join regime), and at ~1.24M vectors PAST
    the 1M broadcast budget, where ``_read_files`` degrades to the
    shuffle anti-join (r13 hardening). The public API refuses to
    grow past the cap (needle-delete convention) and raises on
    commit races, so the over-cap manifest is authored directly by
    this probe with the module's own staging/commit helpers — the
    exact "manifest raced past the cap" artifact the fallback
    exists for. Row counts are asserted exact in every regime.
(b) compact() materializing the standing vectors (full rewrite),
    then the DV-free read.
(c) change-feed replay across every delete commit.

Methodology per SCALE.md: ONE heavy family per session, explicit
warm-up reads, quiet box. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from geniepool_etl_spark import snaptable as ST  # noqa: E402
from geniepool_etl_spark.functions import enable_nanos_as_long  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402

SF10 = os.path.join(_HERE, ".benchdata", "sf10", "events.parquet")
TBL = os.path.join(_HERE, ".benchdata", "snap_sf10_probe")


def main() -> None:
    spark = get_spark(
        "snaptable-sf10-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    enable_nanos_as_long(spark)
    out: dict = {"rows": 10_000_000, "files": 128}
    if os.path.exists(TBL):
        shutil.rmtree(TBL)

    ev = spark.read.parquet(SF10)
    t0 = time.time()
    ST.write_table(ev, TBL, mode="create", target_files=128)
    out["stage_write_sec"] = round(time.time() - t0, 2)
    total = ev.count()

    def timed_read(expected: int, label: str) -> None:
        # warm once (file listing / JIT), then time
        ST.read_table(spark, TBL).write.format("noop").mode(
            "overwrite"
        ).save()
        t = time.time()
        n = ST.read_table(spark, TBL).count()
        out[label] = round(time.time() - t, 2)
        assert n == expected, (label, n, expected)

    timed_read(total, "read_dv0_sec")

    # (a) legit DV deletes: 9 needle groups, ~103k rows each —
    # accumulates to ~0.93M vectors, inside the broadcast budget
    deleted = 0
    t0 = time.time()
    for k in range(9):
        ST.delete_where(
            spark, TBL, f"event_id % 97 = {k}", mode="dv"
        )
    out["dv_delete9_sec"] = round(time.time() - t0, 2)
    deleted = ev.where("event_id % 97 < 9").count()
    out["dv_rows_broadcast"] = deleted
    timed_read(total - deleted, "read_dv_broadcast_sec")

    # author the OVER-CAP manifest the way a raced pair of deletes
    # would have left it: stage three more needle groups' vectors
    # and commit a manifest whose dv_files total ~1.24M (> 1M cap),
    # using the module's own helpers minus the API's growth refusal
    fs, P = ST._hadoop_fs(spark, TBL)
    m = ST._resolve(spark, fs, P, TBL, None)
    matched = ST._read_files(
        spark, TBL, m, m["files"], with_meta=True
    ).where("event_id % 97 in (9, 10, 11)")
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    per_file = {
        unquote(r["_dvf"]): int(r["n"])
        for r in matched.groupBy("_dvf")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    dv_new = ST._stage_dv_data(spark, matched, TBL)
    new_files = []
    for f in m["files"]:
        key = f["path"]
        if key.startswith(ST._DATA_DIR + "/"):
            key = key[len(ST._DATA_DIR) + 1:]
        hit = per_file.get(key, 0)
        if hit:
            f = dict(f)
            f["dv_rows"] = int(f.get("dv_rows", 0)) + hit
        new_files.append(f)
    version = m["version"] + 1
    manifest = ST._carry_contracts(m, {
        "version": version,
        "action": "delete",
        "schema": m["schema"],
        "stats_cols": m.get("stats_cols", []),
        "files": new_files,
        "change_files": [],
    })
    manifest["dv_files"] = m.get("dv_files", []) + dv_new
    assert ST._try_commit(spark, TBL, version, manifest)
    deleted2 = ev.where("event_id % 97 < 12").count()
    out["dv_rows_overcap"] = deleted2
    timed_read(total - deleted2, "read_dv_shuffle_sec")

    # (b) compaction materializes the vectors
    t0 = time.time()
    ST.compact(spark, TBL, target_files=128)
    out["compact_sec"] = round(time.time() - t0, 2)
    timed_read(total - deleted2, "read_postcompact_sec")

    # (c) change-feed replay across the 9 delete commits
    # (from_version is EXCLUSIVE — "strictly after"; 0 covers v1..v9)
    t0 = time.time()
    ch = ST.read_changes(spark, TBL, from_version=0, to_version=9)
    n_ch = ch.where("_change_type = 'delete'").count()
    out["changefeed_sec"] = round(time.time() - t0, 2)
    out["changefeed_delete_rows"] = n_ch
    assert n_ch == deleted, (n_ch, deleted)

    shutil.rmtree(TBL)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
