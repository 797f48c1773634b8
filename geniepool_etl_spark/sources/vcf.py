"""VCF variant-call source.

Reference behavior being re-expressed (SURVEY.md §2.1 S1-S3, §3):
reference M:110-125 reads VCF text, filters ``#`` header lines, then
re-parses the in-memory text as tab-separated CSV with *schema
inference* — which costs a full extra pass over the input before the
real job (SURVEY.md §3 "process boundaries"). Spark-first we do it in
ONE scan: ``spark.read.csv`` with ``comment='#'`` (header lines are
dropped inside the scan itself) and an explicit 10-column schema, so
there is no inference job, and column pruning reaches the parser.

Gzip (``.vcf.gz``) and glob paths are handled natively by the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from geniepool_etl_spark.sources.filename import file_stem

# VCF v4.2 body layout: 10 tab-separated columns, single-sample files.
# All strings at scan time (typed casts happen in read_mutations) —
# matches the reference's all-string CSV parse (M:114).
VCF_SCHEMA = StructType(
    [
        StructField("chrom", StringType()),
        StructField("pos", StringType()),
        StructField("id", StringType()),
        StructField("ref", StringType()),
        StructField("alt", StringType()),
        StructField("qual", StringType()),
        StructField("filter", StringType()),
        StructField("info", StringType()),
        StructField("format", StringType()),
        StructField("last", StringType()),
    ]
)


def read_vcf_raw(spark: SparkSession, input_path: str) -> DataFrame:
    """One-scan VCF body read: explicit schema, header comments dropped.

    Equivalent to reference M:110-125 (text read + ``not like '#%'`` +
    inferred CSV parse + positional renames) but with a single pass and
    no inference job.
    """
    return (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .schema(VCF_SCHEMA)
        .csv(input_path)
    )


def read_mutations(spark: SparkSession, input_path: str) -> DataFrame:
    """VCF files → one row per variant call with hom/het sample structs.

    Port of reference M:81-108 (``getMutationsByIndex``):

    - ``srr`` sample id comes from the file name (M:87);
    - ``chrom`` keeps only the part before ``_``
      (``chr1_KI270706v1_random`` → ``chr1``, M:88);
    - ``pos``→int, ``qual``→float (M:89-90; permissive-cast policy, see
      session.py);
    - ``ad`` is the 2nd ``:``-field of the genotype column (M:91);
    - a call is homozygous iff the genotype starts with ``1/1`` (M:86);
    - exactly one of ``hom_struct`` / ``het_struct`` is non-null per row
      (M:96-104) — downstream ``collect_set`` skips the nulls, which is
      what turns rows into per-genotype sample arrays (SURVEY.md §2.4 A1).

    Output columns: chrom, pos, ref, alt, hom_struct, het_struct.
    """
    raw = read_vcf_raw(spark, input_path)

    # Coalesce to false so a malformed/short row (null genotype column)
    # classifies as het, matching the reference's
    # when(startsWith("1/1"), true).otherwise(false) (M:86) — a bare
    # null predicate would drop the sample from BOTH arrays.
    homo = F.coalesce(F.col("last").startswith("1/1"), F.lit(False))
    sample_struct = F.struct(
        F.col("srr").alias("id"),
        F.col("qual").alias("qual"),
        F.col("ad").alias("ad"),
    )

    return (
        raw.withColumn("srr", file_stem())
        .withColumn("chrom", F.substring_index("chrom", "_", 1))
        .withColumn("pos", F.col("pos").cast("int"))
        .withColumn("qual", F.col("qual").cast("float"))
        .withColumn("ad", F.split("last", ":").getItem(1))
        .withColumn("hom_struct", F.when(homo, sample_struct))
        .withColumn("het_struct", F.when(~homo, sample_struct))
        .select("chrom", "pos", "ref", "alt", "hom_struct", "het_struct")
    )
