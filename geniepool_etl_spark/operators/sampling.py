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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geniepool_etl_spark.functions import portable_hash32

MOD = 10_000  # fraction resolution: 0.01%


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Reproducible global reshuffle for training-data ordering:
    every row gets a (shard, pos) address — shard = content-hash %
    ``n_shards``, pos = rank of the hash within the shard — so the
    epoch order is pseudorandom w.r.t. the input layout yet identical
    across runs, task retries, and engines (no RNG state anywhere).

    The scale-correct formulation: a single GLOBAL row_number over the
    hash would funnel 100 TB through one sorting partition, so order
    is defined shard-locally instead — one hash exchange on the shard
    key, each shard sorts independently, and a training reader
    round-robins the shards. Changing ``seed`` is a fresh epoch
    permutation.
    """
    h = portable_hash32(F.col(key_col).cast("string"), seed)
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return out.withColumn(
        "pos", F.row_number().over(w).cast("int")
    ).drop("_h")


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


def mixture_plan(
    df: DataFrame,
    token_budget: int,
    shares: dict[str, float],
    group_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-source sampling fractions that hit a target token mixture.

    Given a total ``token_budget`` and target ``shares`` (fractions
    summing to ≤1: web 0.6, books 0.2, …), compute for each source the
    fraction of its rows to keep so its contribution approaches
    ``share·budget`` tokens, capped at 1.0 when the source is too
    small (a source cannot be upsampled by subsampling — the plan
    reports the shortfall instead of silently renormalizing).

    One tiny aggregate (|sources| rows): group-sum the token counts,
    then arithmetic. The output feeds
    :func:`stratified_hash_sample` as its ``fractions`` dict — the
    planner is a driver-side decision over KB-scale stats, the
    sampler stays a narrow scan-speed gate over the full corpus.

    Returns (source, available_tokens, target_tokens, fraction,
    shortfall_tokens), fraction rounded to 4 dp for cross-engine
    reproducibility.
    """
    target: Column = F.lit(None).cast("long")
    for grp, share in sorted(shares.items()):
        target = F.when(
            F.col(group_col) == grp, F.lit(int(share * token_budget))
        ).otherwise(target)
    per_source = (
        df.groupBy(group_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("available_tokens"))
        .withColumn("target_tokens", target)
        .where(F.col("target_tokens").isNotNull())
    )
    frac = F.round(
        F.least(
            F.lit(1.0),
            F.col("target_tokens") / F.col("available_tokens"),
        ),
        4,
    )
    return per_source.select(
        F.col(group_col).alias("source"),
        "available_tokens",
        "target_tokens",
        frac.alias("fraction"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("target_tokens") - F.col("available_tokens"),
        ).alias("shortfall_tokens"),
    )


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Per-ROW deterministic rejection sampling: keep a row iff its
    hash gate clears a row-dependent acceptance probability — the
    curriculum/quality-weighted generalization of
    :func:`stratified_hash_sample`'s per-group constants. ``weight``
    is any column expression in [0, 1] (clamped); a row with weight
    0.9 is ~9× likelier to survive than one at 0.1.

    Same scale properties as every sampling gate here: narrow (no
    shuffle, no RNG state), one hash per row at scan speed, identical
    keep set across runs, retries, partitionings, and engines. The
    weight must be a deterministic function of the row — upstream
    quality scores, length priors, domain multipliers.
    """
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    gate = (
        portable_hash32(F.col(key_col).cast("string"), seed) % MOD
        < (p * MOD).cast("long")
    )
    return df.where(gate)
