"""End-to-end ETL plans: VCF batches → range-bucketed lake + status.

This composes the sources and operators into the reference's two entry
points (SURVEY.md §3): the lake-build dataflow
(``convert_vcfs_to_datalake`` ≙ reference M:43-79) and the job-level
status summary (``get_status`` ≙ M:140-153).

Everything here is lazy plan construction; actions happen in lake.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geniepool_etl_spark.config import PARTITION_SIZE
from geniepool_etl_spark.operators.annotate import (
    join_alpha,
    join_dbsnp,
    join_gnomad,
    join_impact,
)
from geniepool_etl_spark.operators.nest import nest_entries, nest_samples
from geniepool_etl_spark.sources.annotations import (
    read_alpha,
    read_dbsnp,
    read_gnomad,
    read_impact,
)
from geniepool_etl_spark.sources.vcf import read_mutations, read_vcf_raw


def convert_vcfs_to_datalake(
    spark: SparkSession,
    input_path: str,
    impact_path: str,
    dbsnp_path: str,
    t2t: bool,
    gnomad_path: str,
    alpha_path: str,
    partition_size: int = PARTITION_SIZE,
) -> DataFrame:
    """The core dataflow (reference M:43-79):

    VCF scan → hom/het structs → ⟕impact (dedup'd) → ⟕dbSNP → ⟕gnomAD
    → ⟕alpha (+CASE score) → allele-level nest → position-level nest
    with ``pos_bucket``.

    Returns the lake DataFrame: (chrom, pos_bucket, pos, entries).
    """
    variants = read_mutations(spark, input_path)

    annotated = join_impact(variants, read_impact(spark, impact_path))
    annotated = join_dbsnp(annotated, read_dbsnp(spark, dbsnp_path, t2t))
    annotated = join_gnomad(annotated, read_gnomad(spark, gnomad_path))
    annotated = join_alpha(annotated, read_alpha(spark, alpha_path))

    return nest_entries(nest_samples(annotated), partition_size)


def get_status(spark: SparkSession, input_path: str) -> DataFrame:
    """1-row job summary (reference M:140-153): distinct coordinates /
    mutations / input files + timestamp.

    The reference re-scans the raw input for this (M:142) *after* the
    main job already scanned it — with our single-pass explicit-schema
    reader that second scan costs one pass instead of the reference's
    two (its CSV inference pass re-read everything again, SURVEY.md §3).

    Physical shape: Expand-based multi-distinct global aggregate; the
    partial aggregation is map-side so the single reducer only sees
    pre-aggregated partials.
    """
    raw = read_vcf_raw(spark, input_path).withColumn(
        "file_name", F.input_file_name()
    )
    return (
        raw.groupBy()
        .agg(
            F.count_distinct("chrom", "pos").alias("coordinates_num"),
            F.count_distinct("chrom", "pos", "ref", "alt").alias("mutations_num"),
            F.count_distinct("file_name").alias("samples_num"),
        )
        .withColumn("update_date", F.current_timestamp().cast("string"))
    )
