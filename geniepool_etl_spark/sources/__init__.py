"""Data sources: VCF variant calls and the four annotation tables."""

from geniepool_etl_spark.sources.annotations import (
    read_alpha,
    read_dbsnp,
    read_gnomad,
    read_impact,
)
from geniepool_etl_spark.sources.vcf import read_mutations, read_vcf_raw

__all__ = [
    "read_vcf_raw",
    "read_mutations",
    "read_impact",
    "read_dbsnp",
    "read_gnomad",
    "read_alpha",
]
