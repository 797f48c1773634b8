"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew automatically
(session.py enables it), but two cases need explicit salting at
100 TB:

- **aggregation skew**: a groupBy where one key holds a large share of
  all rows funnels that key's rows into a single reducer. AQE cannot
  split a single aggregation key. Two-phase salted aggregation splits
  the hot key across ``n_salts`` partial groups first.
- **explicit-repartition skew** (the lake write path): AQE does not
  rebalance an explicit ``repartition(cols)``; salting the partition
  key bounds the largest task.

Salting must never change the answer — each helper is a pure rewrite
of its unsalted equivalent (property-tested, and oracle-checked via
the driver contract: the oracle is the PLAIN aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, entropy: Column) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an entropy
    column (NOT rand() — resubmitted tasks must salt identically or
    shuffle retries corrupt results)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(entropy), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int,
    entropy: Column,
    sum_col: str,
) -> DataFrame:
    """Two-phase skew-proof sum/count: groupBy(keys + salt) partials →
    groupBy(keys) final. Algebraically identical to the direct
    aggregation (sum/count are associative-commutative); the hot key's
    rows spread over ``n_salts`` reducers in phase 1, and phase 2 only
    merges ``n_salts`` partial rows per key.

    Returns (keys..., n, sum_<col> rounded to 2).
    """
    partial = (
        with_salt(df, n_salts, entropy)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(sum_col).alias("_s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s"), 2).alias(f"sum_{sum_col}"),
    )


def salted_skew_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int,
    entropy: Column,
) -> DataFrame:
    """Skew-proof equi-join for a hot fact key against a
    non-broadcastable dim: facts get a deterministic salt, the dim is
    replicated ``n_salts``× with an exploded salt column, and the join
    runs on (key, salt) — the hot key's rows land on ``n_salts``
    different reducers instead of one.

    Replication costs n_salts × |dim| shuffle volume: use ONLY when
    the dim is too big to broadcast yet far smaller than the fact
    table, and AQE's skew splitting isn't available (e.g. the join
    feeds an explicit repartition).
    """
    salted_facts = with_salt(facts, n_salts, entropy)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_facts.join(salted_dim, [key, "_salt"], "left").drop("_salt")
