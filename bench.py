"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line LAST:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver captures only the final ~2000 characters of stdout and
parses the LAST JSON line from that tail (round 6's line overflowed
it → ``parsed: null``), so the printed line carries ONLY the headline
per-query seconds plus counts — the full regression-gate detail
(``micro``, ``ratio_vs_best``, ``regressions``, ``errors``) goes to
``BENCH_DETAIL.json`` next to this script, and the bench session
disables Spark's console progress bar so stage-progress ``\\r`` spam
cannot eat the tail window.

The regression gate compares per-query ``ratio_vs_best`` against the
best time ever recorded for that query (``BENCH_BASELINE.json``,
updated only on improvement), with anything >1.5x listed under
``regressions`` in BENCH_DETAIL.json — the round produces its own
drift signal instead of relying on a judge diffing two JSON files.
``n_queries``/``n_expected`` make totals from different rounds
comparable like-for-like: a round where a query errored (excluded
from the sum) is visibly not the same denominator as a clean round.

Queries are executed with the ``noop`` sink (full plan execution, no
driver-side collection) so the timing reflects engine throughput.
Scale-path operators run their production (xxhash64) variants, not the
md5-portable variants the correctness oracles use.

``micro_event_us_{long,ntz}`` time the SAME event-time normalization
(scan -> event_micros -> one agg) over the two parquet encodings the
driver's testdata has shipped (nanos-as-long INT64 vs TIMESTAMP_NTZ),
staged side-by-side from the current events table — so an encoding
change between rounds shows up as a delta in ONE pair of numbers, not
as mystery drift across every event query. Micro entries are excluded
from the headline total (kept like-for-like with earlier rounds).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark import contract as C  # noqa: E402
from geniepool_etl_spark.operators import dedup as D  # noqa: E402
from geniepool_etl_spark.operators import events as E  # noqa: E402
from geniepool_etl_spark.operators import packing as PK  # noqa: E402
from geniepool_etl_spark.operators import similarity as S  # noqa: E402
from geniepool_etl_spark.operators import text as TX  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)
REGRESSION_RATIO = 1.5


def _stage_event_encodings(spark, sf_dir: str) -> dict[str, str]:
    """Write the events table twice — ts as raw nanos INT64 and as
    TIMESTAMP_NTZ — so the micro benchmark compares the two
    normalization branches on identical data. Staging happens once,
    before any timing."""
    ev = C._t(spark, sf_dir, "events")
    us = E.with_event_time(ev).withColumn("_us", F.col("ts_us"))
    base = tempfile.mkdtemp(prefix="gp_bench_enc_")
    cols = [c for c in ev.columns if c != "ts"]
    out = {}
    for enc, ts_col in (
        ("long", (F.col("_us") * 1000).cast("long")),
        ("ntz", F.timestamp_micros(F.col("_us")).cast("timestamp_ntz")),
    ):
        path = os.path.join(base, enc)
        us.select(ts_col.alias("ts"), *cols).write.parquet(path)
        out[enc] = path
    return out


def bench_queries(spark, sf_dir):
    docs = C._t(spark, sf_dir, "documents")
    emb = C._t(spark, sf_dir, "embeddings")
    # auto-sizing hints, computed once in setup (not part of any
    # timing): the operators must not fire implicit pre-jobs
    n_emb = emb.count()
    doc_tokens = int(
        docs.select(
            F.coalesce(
                F.sum(F.size(TX.words_col(F.col("text")))), F.lit(0)
            )
        ).first()[0]
    )
    enc_dirs = _stage_event_encodings(spark, sf_dir)

    def micro_event_us(path):
        df = spark.read.parquet(path)
        return E.with_event_time(df).groupBy().agg(
            F.sum("ts_us").alias("sum_us"), F.count("*").alias("n")
        )

    # SCD2 maintenance evidence pair: the incremental path's claim is
    # O(batch) vs the full rebuild's O(history) — measure both. The
    # standing history is staged to parquet once (in production it IS
    # a stored table); only the merge/rebuild is timed.
    from geniepool_etl_spark.operators.upsert import (
        scd2_apply_batch, scd2_from_changelog,
    )

    e_all = E.with_event_time(C._t(spark, sf_dir, "events"))
    split_us = C._SCD2_SPLIT_US
    standing_dir = tempfile.mkdtemp(prefix="gp_bench_scd2_")
    scd2_from_changelog(
        e_all.where(F.col("ts_us") < split_us),
        key="user_id", ts_col="ts_us", attr="event_type",
        id_col="event_id",
    ).write.mode("overwrite").parquet(standing_dir)
    scd2_standing = spark.read.parquet(standing_dir)
    scd2_batch = e_all.where(F.col("ts_us") >= split_us).select(
        "user_id", "ts_us", "event_type", "event_id"
    )

    def micro_scd2_full():
        return scd2_from_changelog(
            e_all, key="user_id", ts_col="ts_us", attr="event_type",
            id_col="event_id",
        )

    def micro_scd2_apply():
        return scd2_apply_batch(
            scd2_standing, scd2_batch, key="user_id", ts_col="ts_us",
            attr="event_type", id_col="event_id",
        )

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
        "pack_windows": lambda: PK.pack_windows(docs, total_tokens=doc_tokens),
        "sim_lsh_topk": lambda: S.lsh_bucket_topk(emb, k=5, n_rows=n_emb),
        "two_level_nest": lambda: C.q_a2_two_level_nest(spark, sf_dir),
        # round-6 additions (production xxhash64 variants)
        "dedup_repeated_spans": lambda: D.repeated_ngram_spans(docs, n=5),
        "text_pii": lambda: TX.with_pii_counts(docs),
        "events_interval_join": lambda: C.q_events_interval_join(spark, sf_dir),
        "rollup_incremental": lambda: C.q_rollup_incremental(spark, sf_dir),
        "pipeline_corpus_build": lambda: C.q_pipeline_corpus_build(spark, sf_dir),
        # round-6 second wave
        "scd2_point_in_time": lambda: C.q_scd2_point_in_time(spark, sf_dir),
        "table_diff": lambda: C.q_table_diff(spark, sf_dir),
        "text_bm25": lambda: C.q_text_bm25(spark, sf_dir),
        "pipeline_user_features": lambda: C.q_pipeline_user_features(
            spark, sf_dir
        ),
        # round-7 additions: the deepest new TPC-H shapes
        "tpch_q9": lambda: C.q_sql_tpch_q9(spark, sf_dir),
        "tpch_q21": lambda: C.q_sql_tpch_q21(spark, sf_dir),
        # round-7 second wave: LLM-pipeline additions
        "text_perplexity": lambda: C.q_text_perplexity(spark, sf_dir),
        "dedup_semantic": lambda: C.q_dedup_semantic(spark, sf_dir),
        "text_bpe_encode": lambda: C.q_text_bpe_encode(spark, sf_dir),
        "micro_event_us_long": lambda: micro_event_us(enc_dirs["long"]),
        "micro_event_us_ntz": lambda: micro_event_us(enc_dirs["ntz"]),
        "micro_scd2_full_rebuild": micro_scd2_full,
        "micro_scd2_apply_batch": micro_scd2_apply,
    }


def _load_baseline(sf: float) -> dict[str, float]:
    try:
        with open(BASELINE_PATH) as fh:
            d = json.load(fh)
        if d.get("sf") == sf:
            return dict(d.get("best_sec") or {})
    except (OSError, ValueError):
        pass
    return {}


def _save_baseline(sf: float, best: dict[str, float]) -> None:
    with open(BASELINE_PATH, "w") as fh:
        json.dump(
            {"sf": sf, "best_sec": best}, fh, indent=2, sort_keys=True
        )
        fh.write("\n")


def main() -> None:
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(
        "geniepool-bench",
        # stage-progress \r output would land inside the driver's
        # 2000-char stdout tail and could cut off the final JSON line
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
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

    headline = {k: v for k, v in timings.items() if not k.startswith("micro_")}
    micro = {k: v for k, v in timings.items() if k.startswith("micro_")}
    n_expected = sum(1 for k in qs if not k.startswith("micro_"))

    # Regression gate: ratio vs the best time ever recorded per query;
    # the baseline file only ever improves, so a ratio > 1 is real
    # history, not this run grading its own homework.
    baseline = _load_baseline(sf)
    ratios = {
        k: round(v / baseline[k], 2)
        for k, v in timings.items()
        if baseline.get(k)
    }
    regressions = {k: r for k, r in ratios.items() if r > REGRESSION_RATIO}
    improved = False
    for k, v in timings.items():
        if v < baseline.get(k, float("inf")):
            baseline[k] = v
            improved = True
    if improved:
        _save_baseline(sf, baseline)

    total = round(sum(headline.values()), 3)
    detail = {
        "sf": sf,
        "total_sec": total,
        "micro": micro,
        "ratio_vs_best": ratios,
        "regressions": regressions,
        "errors": errors,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=2, sort_keys=True)
        fh.write("\n")

    # The compact line: headline seconds + counts only. Everything
    # else lives in BENCH_DETAIL.json — the driver's 2000-char tail
    # capture must see this whole line (r6 lesson).
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "sf": sf,
        # like-for-like guard: totals are only comparable when the
        # covered-query count matches (an errored query is excluded
        # from the sum and would otherwise masquerade as a speedup)
        "n_queries": len(headline),
        "n_expected": n_expected,
        "n_regressions": len(regressions),
        "n_errors": len(errors),
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1500:  # belt-and-braces: never overflow the tail
        out.pop("queries")
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
