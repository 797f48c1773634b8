"""Deterministic sampling for dataset mixing.

Training-data pipelines re-weight domains (web vs books vs code) by
sampling each source at a target rate. RNG-based ``df.sample`` is
non-reproducible across runs/partitionings and cannot be recomputed by
another engine; hash-gated sampling is: a row is kept iff a content
hash of its key falls below the group's cutoff — stable under
repartitioning, task retries, and engine changes, and the same row set
is selected in every downstream job that repeats the predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geniepool_etl_spark.functions import portable_hash32

MOD = 10_000  # fraction resolution: 0.01%


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 11,
) -> DataFrame:
    """Keep ~``fractions[group]`` of each group's rows, selected by a
    deterministic per-key hash gate. Narrow (no shuffle, no RNG state):
    the cutoff is a literal CASE over the group column and the gate is
    one hash per row — runs at scan speed at any scale.
    """
    cutoff: Column = F.lit(int(default_fraction * MOD))
    for grp, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(group_col) == grp, F.lit(int(frac * MOD))
        ).otherwise(cutoff)
    gate = (
        portable_hash32(F.col(key_col).cast("string"), seed) % MOD < cutoff
    )
    return df.where(gate)
