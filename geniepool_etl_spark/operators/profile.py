"""Column profiling: the data-quality summary every ingest pipeline
runs before/after a load (null rates, cardinalities, value ranges).

One pass over the table: ALL per-column aggregates run in a single
global aggregation (map-side partial), then the 1-row wide result is
melted to one row per column driver-side — melting a 1×(4·n_cols) row
is free; the data-size work is the single scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_v, max_v) per column.

    min/max are rendered as strings so mixed-type tables profile into
    one frame; n_distinct is exact (count_distinct — swap for
    approx_count_distinct at 100 TB if estimates suffice).
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_v"),
            F.col(f"__max_{c}").alias("max_v"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, parts)


def histogram_equiwidth(
    df: DataFrame,
    col: str,
    lo_cents: int,
    hi_cents: int,
    n_buckets: int,
    cents_col: bool = False,
) -> DataFrame:
    """Equi-width histogram of a money/measure column in EXACT integer
    arithmetic: the value is fixed to integer cents first, then
    bucketed with integer division — no float boundary can put the
    same row in different buckets on different engines (the classic
    ``floor((x-lo)/width)`` double formulation flips at representable
    boundaries).

    Returns (bucket, lo_cents, hi_cents, n_rows, min_cents, max_cents)
    for each non-empty bucket; values outside [lo, hi) clamp into the
    edge buckets (a histogram that silently drops out-of-range rows
    misreports the distribution). One map-side-partial aggregate on
    ``n_buckets`` keys — scan speed at any scale.
    """
    if n_buckets <= 0 or hi_cents <= lo_cents:
        raise ValueError(
            "histogram_equiwidth: need n_buckets > 0 and hi > lo"
        )
    width = (hi_cents - lo_cents + n_buckets - 1) // n_buckets
    cents = (
        F.col(col).cast("long")
        if cents_col
        else F.round(F.col(col) * 100).cast("long")
    )
    # `div` is true integral division on longs — no double rounding
    # at wide ranges, exactly DuckDB's integer `//`; the edge clamps
    # make trunc-vs-floor moot for below-range values
    bucket = F.least(
        F.greatest(
            F.expr(f"(_c - {lo_cents}) div {width}"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    return (
        df.select(cents.alias("_c"))
        .select("_c", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_c").alias("min_cents"),
            F.max("_c").alias("max_cents"),
        )
        .select(
            "bucket",
            (F.lit(lo_cents) + F.col("bucket") * width).alias("lo_cents"),
            (F.lit(lo_cents) + (F.col("bucket") + 1) * width).alias(
                "hi_cents"
            ),
            "n_rows",
            "min_cents",
            "max_cents",
        )
    )
