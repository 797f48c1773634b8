"""Nesting aggregations: relational rows → document-shaped lake records.

The lake's unit record is one row per ``(chrom, pos_bucket, pos)``
whose ``entries`` is an array of per-allele structs, each holding two
arrays (``hom``/``het``) of per-sample structs (SURVEY.md §1.1). Built
with two levels of ``groupBy + collect_set`` (reference M:64-76).

``collect_set`` skips nulls — that is the load-bearing interaction with
the null-gated ``hom_struct``/``het_struct`` columns from the VCF
reader — and produces *set* semantics: element order inside the arrays
is nondeterministic (SURVEY.md §4 delta 3). ``canonicalize_entries``
gives tests and oracles a deterministic view.

Physically both aggregations are ObjectHashAggregate with map-side
partial aggregation; they shuffle on their group keys. The second
grouping key set (chrom, pos_bucket, pos) is a strict coarsening of
the first's leading keys, so AQE/Catalyst can reuse the partitioning
when beneficial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geniepool_etl_spark.config import PARTITION_SIZE

# Allele-level grouping keys: variant identity + all annotations
# (reference M:65).
ALLELE_KEYS = [
    "chrom",
    "pos",
    "ref",
    "alt",
    "impact",
    "dbSNP",
    "gnomad_an",
    "gnomad_ac",
    "gnomad_nhomalt",
    "hg38_coordinate",
    "alphamissense",
]

# Fields of one ``entries`` element (reference M:69-71).
RESP_FIELDS = [
    "ref",
    "alt",
    "impact",
    "dbSNP",
    "gnomad_an",
    "gnomad_ac",
    "gnomad_nhomalt",
    "hg38_coordinate",
    "alphamissense",
    "hom",
    "het",
]


def with_pos_bucket(df: DataFrame, partition_size: int = PARTITION_SIZE) -> DataFrame:
    """``pos_bucket = floor(pos / partition_size)`` (reference M:75)."""
    return df.withColumn(
        "pos_bucket", F.floor(F.col("pos") / F.lit(partition_size))
    )


def nest_samples(df: DataFrame) -> DataFrame:
    """Collapse per-sample rows into ``hom``/``het`` arrays per allele
    (reference M:64-66 + M:68-72).

    Input: one row per (variant, sample) with null-gated
    ``hom_struct``/``het_struct``. Output: one row per annotated allele
    with a single ``resp`` struct.
    """
    nested = df.groupBy(*ALLELE_KEYS).agg(
        F.collect_set("hom_struct").alias("hom"),
        F.collect_set("het_struct").alias("het"),
    )
    return nested.withColumn("resp", F.struct(*RESP_FIELDS)).drop("hom", "het")


def nest_entries(df: DataFrame, partition_size: int = PARTITION_SIZE) -> DataFrame:
    """Collapse alleles at one position into the ``entries`` array,
    keyed by (chrom, pos_bucket, pos) (reference M:74-76).
    """
    return (
        with_pos_bucket(df, partition_size)
        .groupBy("chrom", "pos_bucket", "pos")
        .agg(F.collect_set("resp").alias("entries"))
    )


def canonicalize_entries(df: DataFrame) -> DataFrame:
    """Deterministic view of a lake DataFrame for testing/oracles:
    sorts ``entries`` and the nested ``hom``/``het`` arrays.

    ``collect_set`` output order is engine-internal; any value-level
    comparison must canonicalize first (SURVEY.md §5).
    """
    sorted_inner = F.transform(
        "entries",
        lambda e: e.withField("hom", F.sort_array(e.getField("hom"))).withField(
            "het", F.sort_array(e.getField("het"))
        ),
    )
    return df.withColumn("entries", F.sort_array(sorted_inner))
