"""File-name–borne lineage.

In the reference's data layout, two pieces of identity live in *file
names*, not file contents (SURVEY.md §7.3):

- the sample id of a VCF: ``.../SRR14860529.vcf.gz`` → ``SRR14860529``
  (reference M:87);
- the chromosome of an annotation parquet: ``.../c1_m132.parquet`` →
  ``chr1``, ``.../cY_m9.parquet`` → ``chrY`` (reference M:172-180,
  M:250-258), and for alpha files ``.../1.parquet`` → ``chr1``
  (reference M:205-207).

These helpers centralize that convention-coupled string surgery as
Column expressions over ``input_file_name()`` so every reader shares
one tested implementation. All are pure built-in expressions — they
run JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_basename(col: Column | None = None) -> Column:
    """Last path segment of ``input_file_name()`` (or a given column)."""
    c = F.input_file_name() if col is None else col
    return F.substring_index(c, "/", -1)


def file_stem(col: Column | None = None) -> Column:
    """Basename up to the first ``.`` — the VCF sample id (M:87).

    ``/a/b/SRR581526-small.vcf.gz`` → ``SRR581526-small``.
    """
    return F.substring_index(file_basename(col), ".", 1)


def chrom_from_c_prefixed_filename(col: Column | None = None) -> Column:
    """Chromosome from ``c<CHROM>_<suffix>.parquet`` names (M:172-180).

    Strip directory + extension, keep text before the first ``_``,
    delete ``c``/``C``, upper-case, prefix ``chr``:
    ``c1_m132.parquet`` → ``chr1``; ``cY_m9.parquet`` → ``chrY``.

    Matches the reference's exact transform (a literal ``c`` deletion,
    not just a prefix strip — faithfully convention-coupled).
    """
    stem_before_underscore = F.substring_index(file_stem(col), "_", 1)
    return F.concat(
        F.lit("chr"),
        F.upper(F.regexp_replace(stem_before_underscore, "c", "")),
    )


def chrom_from_plain_filename(col: Column | None = None) -> Column:
    """Chromosome from ``<CHROM>.parquet`` names (M:205-207).

    ``.../1.parquet`` → ``chr1``; ``.../x.parquet`` → ``chrX``.
    """
    return F.concat(F.lit("chr"), F.upper(file_stem(col)))


def normalize_chrom(col: Column) -> Column:
    """``chr``-prefix + upper-case a bare chromosome column (M:49, M:191)."""
    return F.concat(F.lit("chr"), F.upper(col))
