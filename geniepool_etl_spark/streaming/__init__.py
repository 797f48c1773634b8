"""Structured Streaming operators over the events stream.

The batch operators in ``operators/events.py`` are written
streaming-compatible (keyed by window × entity, event-time only), so
the same aggregation expressions run under ``readStream`` unchanged —
this module supplies the stream wiring: file source with explicit
schema, watermarking, and sinks.

Scale notes: file-source streaming lists new files per micro-batch
(maxFilesPerTrigger bounds batch size); stateful window aggs keep
per-window state in the state store, bounded by the watermark — at
100 TB/day the watermark delay is the knob that caps state size.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from geniepool_etl_spark.functions import enable_nanos_as_long
from geniepool_etl_spark.operators import events as E

# Fallback DDL schema for an empty source directory (streaming sources
# cannot infer with no files). The current driver testdata writes `ts`
# as parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ.
EVENTS_DDL = (
    "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream with the schema taken from the files
    actually present (one batch-reader footer peek — a driver-side
    metadata read, no data scan). Declaring a schema that disagrees
    with the physical type is the classic silent-corruption trap: a
    micros TIMESTAMP column declared LONG loads as plain micros longs,
    and a downstream nanos→micros divide compresses the timeline
    1000×. Reading the real footer type and routing through the
    dtype-adaptive ``event_micros`` makes the pipeline correct for
    nanos-long, TIMESTAMP, and TIMESTAMP_NTZ alike."""
    from pyspark.errors import AnalysisException

    enable_nanos_as_long(spark)
    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException:
        # Empty or not-yet-created source dir (UNABLE_TO_INFER_SCHEMA /
        # PATH_NOT_FOUND): fall back to the current DDL. ONLY this
        # narrow case — a transient IO/permission error must propagate,
        # because silently substituting a declared schema that later
        # disagrees with the physical type is exactly the
        # 1000×-compression trap this function exists to prevent.
        schema = EVENTS_DDL
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts_stream(
    stream: DataFrame, width_us: int = E.US_PER_HOUR, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling aggregation — append-mode capable (state
    for a window is dropped once the watermark passes its end)."""
    e = E.with_event_time(stream).withWatermark("event_time", watermark)
    return _tumbling(e, width_us)


def _tumbling(e: DataFrame, width_us: int) -> DataFrame:
    from pyspark.sql import functions as F

    win = F.window(F.col("event_time"), f"{width_us} microseconds")
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _write_ingest_batch(
    batch_df: DataFrame, batch_id: int, lake_path: str
) -> None:
    """Idempotent micro-batch write: every batch lands under its own
    ``ingest_batch=<id>`` sub-partition via dynamic partition
    overwrite. ``foreachBatch`` is at-least-once — after a failure the
    same batch_id is re-delivered, and a plain append would duplicate
    any rows the interrupted attempt already committed; overwriting
    exactly this batch's (day_bucket, ingest_batch) directories makes
    the retry replace, not duplicate."""
    from pyspark.sql import functions as F

    (
        batch_df.drop("event_time")
        .withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day_bucket", "ingest_batch")
        .parquet(lake_path)
    )


def stream_events_to_lake(
    spark: SparkSession,
    src_dir: str,
    lake_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 16,
) -> None:
    """Incremental ingest: stream event files into a Hive-partitioned
    parquet lake via ``foreachBatch`` — the streaming counterpart of
    the reference's batch-append lake build. The checkpoint makes
    re-runs resume instead of re-ingest, and each micro-batch writes
    idempotently (see :func:`_write_ingest_batch`), so the lake holds
    exactly-once contents despite foreachBatch's at-least-once calls.

    Scale notes: ``max_files_per_trigger`` bounds micro-batch size (an
    unbounded first batch on a backlogged source is the classic
    streaming OOM); partitioning by event-time day keeps files per
    partition proportional to batches-per-day — run
    :func:`compact_day_partition` over closed days to collapse the
    per-batch files.
    """
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, src_dir, max_files_per_trigger)
    enriched = E.with_event_time(stream).withColumn(
        "day_bucket", F.expr("ts_us div 86400000000")
    )

    query = (
        enriched.writeStream.foreachBatch(
            lambda df, bid: _write_ingest_batch(df, bid, lake_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()


def compact_day_partition(
    spark: SparkSession, lake_path: str, day_bucket: int, target_files: int = 1
) -> None:
    """Collapse a closed day's per-batch files into ``target_files``
    parquet files under a single ``ingest_batch=-1`` sub-partition
    (keeping the partition-directory depth uniform so discovery over
    the whole lake still works). Compacted data is staged to a sibling
    temp directory and atomically swapped in — never read-and-overwrite
    in place."""
    import shutil as _sh

    part_dir = os.path.join(lake_path, f"day_bucket={day_bucket}")
    if not os.path.isdir(part_dir):
        return
    tmp = part_dir + "._compact_tmp"
    (
        spark.read.parquet(part_dir)
        .drop("ingest_batch")
        .coalesce(target_files)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "ingest_batch=-1"))
    )
    _sh.rmtree(part_dir)
    os.rename(tmp, part_dir)


def sessionized_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization: native ``session_window`` keyed by
    user — the streaming twin of the batch ``operators/events.py``
    session aggregation. State per (user, open session) is bounded by
    the watermark: a session closes (and its state drops) once the
    watermark passes its end + gap."""
    from pyspark.sql import functions as F

    e = E.with_event_time(stream).withWatermark("event_time", watermark)
    return (
        e.groupBy(
            F.session_window(F.col("event_time"), gap).alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "user_id",
            "n_events",
            "max_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once dedup on an id key:
    ``dropDuplicatesWithinWatermark`` keeps the dedup state bounded by
    the watermark (a plain streaming dropDuplicates grows state
    forever — the classic 100 TB/day OOM), so a replayed/duplicated
    event inside the watermark window is dropped and state for old
    keys is reclaimed."""
    e = E.with_event_time(stream).withWatermark("event_time", watermark)
    return e.dropDuplicatesWithinWatermark(keys or ["event_id"])


def clicks_to_purchases_stream(
    stream: DataFrame, within_us: int = 2 * E.US_PER_HOUR
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the SAME
    user's click events at most ``within_us`` earlier — the streaming
    attribution join. Both sides carry watermarks and the join
    condition bounds event-time distance, so the state store retains
    each side only for the join window (the unbounded-state trap is a
    time-unbounded stream-stream join).

    The range bound MUST be expressed on the watermarked event-time
    columns themselves (``click_time``/``purchase_time``): Spark
    derives the state-cleanup watermark for each join side only from
    conditions on watermarked event-time attributes, so a bound on the
    derived ``*_us`` long columns — while semantically identical —
    would never evict state (unbounded growth). The ``*_us`` columns
    are output-only."""
    from pyspark.sql import functions as F

    e = E.with_event_time(stream)
    clicks = (
        e.where("event_type = 'click'")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts_us").alias("click_us"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", "2 hours")
    )
    purchases = (
        e.where("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts_us").alias("purchase_us"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", "2 hours")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (
            F.col("click_time")
            >= F.col("purchase_time")
            - F.expr(f"INTERVAL {int(within_us)} MICROSECOND")
        ),
        "inner",
    ).select("p_user", "purchase_id", "click_id", "purchase_us", "click_us")


def _stage_events_src(sf_dir: str, copies: int = 1) -> str:
    """Copy the events parquet into a fresh streaming source dir
    (``copies`` > 1 simulates an upstream replay of the same data)."""
    src = tempfile.mkdtemp(prefix="gp_stream_src_")
    for f in glob.glob(os.path.join(sf_dir, "events.parquet")):
        for i in range(copies):
            shutil.copy(f, os.path.join(src, f"copy{i}.parquet"))
    return src


def run_session_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Execute the session aggregation as a real micro-batch stream
    over the events parquet and return the closed sessions.

    ``session_window`` streams in APPEND mode only — a session is
    emitted once the watermark passes its end + gap — so after the
    real data a far-future flush event (user_id = -1, written in the
    source's own ts encoding) advances the watermark and closes every
    real session; flush rows are filtered from the result. This is the
    production pattern for draining a bounded replay through a
    streaming topology."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from geniepool_etl_spark.functions import event_micros

    src = _stage_events_src(sf_dir)
    out = sessionized_stream(read_event_stream(spark, src))
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        src_df = spark.read.parquet(src)
        max_us = src_df.select(
            F.max(event_micros(src_df, "ts")).alias("m")
        ).collect()[0]["m"]
        flush_us = max_us + 24 * 3600 * 1_000_000
        if isinstance(src_df.schema["ts"].dataType, T.LongType):
            flush_ts: object = flush_us * 1000
        elif isinstance(src_df.schema["ts"].dataType, T.TimestampType):
            # tz-aware column: a NAIVE datetime would be read through
            # the Python process's local timezone (time.mktime); pin
            # the instant with an explicit UTC tzinfo.
            flush_ts = datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc
            ) + datetime.timedelta(microseconds=flush_us)
        else:  # TIMESTAMP_NTZ: wall-clock value, naive by definition
            flush_ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=flush_us
            )
        spark.createDataFrame(
            [(10**9, flush_ts, -1, "flush", 0.0, "{}")],
            schema=src_df.schema,
        ).write.mode("append").parquet(src)
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name).where("user_id >= 0")


def run_dedup_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Execute the watermarked streaming dedup over a source that
    replays the events file TWICE (the at-least-once upstream shape):
    the output must be exactly one row per event_id — the original
    table."""
    src = _stage_events_src(sf_dir, copies=2)
    out = dedup_stream(read_event_stream(spark, src)).select(
        "event_id", "user_id", "event_type", "value"
    )
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name)


def run_stateful_counts_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Execute the applyInPandasWithState running per-user accumulator
    (streaming.stateful.running_user_counts) over a bounded replay and
    return the final state rows. With the whole replay in one
    micro-batch, each user emits exactly one update row — the batch
    groupBy answer — which makes the custom-stateful lane
    oracle-checkable."""
    from geniepool_etl_spark.streaming.stateful import running_user_counts

    src = _stage_events_src(sf_dir)
    out = running_user_counts(read_event_stream(spark, src))
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name)


def run_attribution_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Execute the watermarked stream-stream attribution join
    (:func:`clicks_to_purchases_stream`) as a real micro-batch stream
    and return the joined result. Inner stream-stream joins emit a
    match as soon as both sides have arrived — no watermark flush
    needed for a bounded replay; the watermarks exist to bound state,
    not to gate output."""
    src = _stage_events_src(sf_dir)
    out = clicks_to_purchases_stream(read_event_stream(spark, src))
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name)


def run_tumbling_stream(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """Execute the tumbling aggregation as a real micro-batch stream
    over the events parquet (staged into its own source directory) and
    return the final result table (memory sink, complete mode — the
    batch-equivalent answer)."""
    src = _stage_events_src(sf_dir)
    stream = read_event_stream(spark, src)
    out = E.tumbling_agg(stream)
    query = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name)
