"""Structured Streaming: the streaming tumbling aggregation must equal
the batch answer, and the watermarked variant must run in append mode.
"""

from __future__ import annotations

import glob
import shutil

from geniepool_etl_spark.operators import events as E
from geniepool_etl_spark.streaming import (
    read_event_stream,
    run_tumbling_stream,
    tumbling_counts_stream,
)
from tests.conftest import SF_SMALL


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch(spark):
    from geniepool_etl_spark.functions import enable_nanos_as_long

    enable_nanos_as_long(spark)
    batch = E.tumbling_agg(spark.read.parquet(f"{SF_SMALL}/events.parquet"))
    stream_result = run_tumbling_stream(spark, SF_SMALL, name="t_stream_eq")
    assert _rowset(stream_result) == _rowset(batch)


def test_watermarked_append_mode(spark, tmp_path):
    """The watermarked aggregation is append-mode legal (state bounded
    by the watermark) — the 100 TB/day shape."""
    src = tmp_path / "src"
    src.mkdir()
    for f in glob.glob(f"{SF_SMALL}/events.parquet"):
        shutil.copy(f, src)
    stream = read_event_stream(spark, str(src))
    out = tumbling_counts_stream(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("t_stream_append")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode emits only windows the watermark has closed; with a
    # single batch the final (open) windows are withheld — emitted rows
    # must be a subset of the batch answer.
    got = _rowset(spark.table("t_stream_append"))
    full = _rowset(
        E.tumbling_agg(spark.read.parquet(f"{SF_SMALL}/events.parquet"))
    )
    assert set(got) <= set(full)


def test_stream_to_lake_ingest(spark, tmp_path):
    """foreachBatch incremental ingest: all rows land partitioned by
    day; a re-run against the same checkpoint ingests nothing new."""
    from geniepool_etl_spark.streaming import stream_events_to_lake

    src = tmp_path / "src"
    src.mkdir()
    for f in glob.glob(f"{SF_SMALL}/events.parquet"):
        shutil.copy(f, src)
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    stream_events_to_lake(spark, str(src), lake, ckpt)
    n_src = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    out = spark.read.parquet(lake)
    assert out.count() == n_src
    assert "day_bucket" in out.columns

    # idempotent resume: same checkpoint, no new files → no new rows
    stream_events_to_lake(spark, str(src), lake, ckpt)
    assert spark.read.parquet(lake).count() == n_src


def test_stateful_running_counts(spark, tmp_path):
    """applyInPandasWithState: after one micro-batch the per-user state
    equals the batch groupBy answer."""
    from pyspark.sql import functions as F

    from geniepool_etl_spark.streaming.stateful import running_user_counts

    src = tmp_path / "src"
    src.mkdir()
    for f in glob.glob(f"{SF_SMALL}/events.parquet"):
        shutil.copy(f, src)
    stream = read_event_stream(spark, str(src))
    out = running_user_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("t_stateful").collect()
    }
    batch = {
        r.user_id: (r.n, r.s)
        for r in spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()
    }
    assert got == batch
