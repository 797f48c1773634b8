"""Annotation-table sources: Impact, dbSNP (TSV + T2T parquet), gnomAD,
AlphaMissense.

All four are dimension tables left-joined onto variants (SURVEY.md
§2.3). Readers normalize join-key dtypes up front (``pos`` → int,
``chrom`` → ``chr``-prefixed upper) instead of relying on Spark 2.4-era
implicit string↔int join coercion (SURVEY.md §4 delta 2) — explicit
key dtypes also keep the join keys pushdown- and broadcast-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from geniepool_etl_spark.sources.filename import (
    chrom_from_c_prefixed_filename,
    chrom_from_plain_filename,
    normalize_chrom,
)

# dbSNP T2T parquet schema (reference M:163-168). Deliberately omits the
# files' CHROM column: its physical type is inconsistent across fixture
# files (int64 vs string — SURVEY.md §1.3) and chrom is re-derived from
# the file name instead. An explicit schema prunes unlisted columns.
DBSNP_T2T_SCHEMA = StructType(
    [
        StructField("POS", LongType()),
        StructField("REF", StringType()),
        StructField("ALT", StringType()),
        StructField("SNP", StringType()),
    ]
)

# gnomAD v4 parquet schema (reference M:238-246). ``hg38_coordinates``
# may be absent from some files — Spark fills nulls for schema columns
# missing from a file (verified on 4.1.2; SURVEY.md §1.3).
GNOMAD_SCHEMA = StructType(
    [
        StructField("POS", LongType()),
        StructField("REF", StringType()),
        StructField("ALT", StringType()),
        StructField("gnomad_an", LongType()),
        StructField("gnomad_ac", LongType()),
        StructField("gnomad_nhomalt", LongType()),
        StructField("hg38_coordinates", StringType()),
    ]
)


# AlphaMissense parquet schema (layout per reference M:212-228).
ALPHA_SCHEMA = StructType(
    [
        StructField("POS", LongType()),
        StructField("A", DoubleType()),
        StructField("C", DoubleType()),
        StructField("G", DoubleType()),
        StructField("T", DoubleType()),
    ]
)


def read_impact(spark: SparkSession, impact_path: str) -> DataFrame:
    """Impact CSV → one row per (chrom,pos,ref,alt) with trimmed impact.

    Reference M:48-50 + M:60: tab-separated with header
    (``CHROM POS REF ALT IMPACT``), chrom normalized to VCF style,
    duplicates across batches dropped (tested semantics: "we should
    keep only one impact", reference T:39-40). The reference trims
    IMPACT after its joins (M:60); trim is row-local so we do it in the
    reader. Dedup keys exclude the impact text itself, exactly like the
    reference.
    """
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(impact_path)
        .withColumn("chrom", normalize_chrom(F.col("chrom")))
        .withColumn("pos", F.col("pos").cast("int"))
        .withColumn("impact", F.trim(F.col("IMPACT")))
    )
    return df.select("chrom", "pos", "ref", "alt", "impact").dropDuplicates(
        ["chrom", "pos", "ref", "alt"]
    )


def read_dbsnp(spark: SparkSession, dbsnp_path: str, t2t: bool) -> DataFrame:
    """dbSNP rs-id table; columns (chrom, pos, ref, alt, dbSNP).

    Two physical variants (reference M:159-199):

    - hg19/hg38: headerless TSV whose ``#CHROM …`` header row is a
      comment line (dropped in-scan via ``comment='#'`` — the reference
      used a separate text filter, M:188);
    - T2T: parquet with explicit schema, chromosome carried by the
      ``c<CHROM>_<suffix>.parquet`` file name (M:163-186).
    """
    if t2t:
        return (
            spark.read.schema(DBSNP_T2T_SCHEMA)
            .parquet(dbsnp_path)
            .withColumn("chrom", chrom_from_c_prefixed_filename())
            .select(
                "chrom",
                F.col("POS").cast("int").alias("pos"),
                F.col("REF").alias("ref"),
                F.col("ALT").alias("alt"),
                F.col("SNP").alias("dbSNP"),
            )
        )
    schema = StructType(
        [
            StructField("chrom_raw", StringType()),
            StructField("pos", StringType()),
            StructField("ref", StringType()),
            StructField("alt", StringType()),
            StructField("dbSNP", StringType()),
        ]
    )
    return (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .schema(schema)
        .csv(dbsnp_path)
        .select(
            normalize_chrom(F.col("chrom_raw")).alias("chrom"),
            F.col("pos").cast("int").alias("pos"),
            "ref",
            "alt",
            "dbSNP",
        )
    )


def read_gnomad(spark: SparkSession, gnomad_path: str) -> DataFrame:
    """gnomAD allele-frequency table (reference M:236-264).

    Columns: chrom, pos, ref, alt, gnomad_an, gnomad_ac,
    gnomad_nhomalt, hg38_coordinate. Chromosome from the
    ``c<CHROM>_<lo>_<hi>.parquet`` file name (M:250-258).
    """
    return (
        spark.read.schema(GNOMAD_SCHEMA)
        .parquet(gnomad_path)
        .withColumn("chrom", chrom_from_c_prefixed_filename())
        .select(
            "chrom",
            F.col("POS").cast("int").alias("pos"),
            F.col("REF").alias("ref"),
            F.col("ALT").alias("alt"),
            "gnomad_an",
            "gnomad_ac",
            "gnomad_nhomalt",
            F.col("hg38_coordinates").alias("hg38_coordinate"),
        )
    )


def read_alpha(spark: SparkSession, alpha_path: str) -> DataFrame:
    """AlphaMissense per-position substitution scores (reference M:201-208).

    Explicit schema ``POS long, A/C/G/T double`` (original blobs absent
    from the reference snapshot, FIXTURES.md §6; layout derived from the
    CASE at reference M:212-228) — the reference base's own column is 0
    and each other column holds the pathogenicity score for that
    substitution. Chromosome from the ``<CHROM>.parquet`` file name
    (M:205-207). The explicit schema keeps the scan inference-free,
    like every other reader in this package.
    """
    return (
        spark.read.schema(ALPHA_SCHEMA)
        .parquet(alpha_path)
        .withColumn("chrom", chrom_from_plain_filename())
        .withColumnRenamed("POS", "pos")
        .withColumn("pos", F.col("pos").cast("int"))
    )
