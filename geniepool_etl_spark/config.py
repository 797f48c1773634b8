"""Engine constants.

Mirrors the reference's layout constants (reference M:18-19, where
M = src/main/java/spark/ImportVcfToDataLakeByRanges.java): the lake is
range-partitioned on ``(chrom, pos_bucket)`` with ``pos_bucket =
floor(pos / PARTITION_SIZE)`` and at most ``MAX_RECORDS_PER_FILE`` rows
per output parquet file, so a point/range genomic query prunes to a
single Hive partition directory.
"""

# Width of one position bucket (reference M:18, used M:75).
PARTITION_SIZE: int = 100_000

# Cap on rows per output parquet file (reference M:19, used M:132).
MAX_RECORDS_PER_FILE: int = 25_000
