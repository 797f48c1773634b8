"""Runnable ETL job entrypoint, mirroring the reference's spark-submit
``main`` (reference M:22-41: 8 positional args).

Usage (spark-submit or plain python with a local master):

    python -m geniepool_etl_spark.cli \\
        <input_path> <output_path> <status_path> \\
        <impact_path> <dbsnp_path> <t2t> <gnomad_path> <alpha_path>

``t2t`` is ``true``/``false`` — selects the parquet (T2T) vs TSV dbSNP
reader, exactly like the reference's flag (M:28, M:159-199).
"""

from __future__ import annotations

import sys

from geniepool_etl_spark.lake import write_datalake, write_status
from geniepool_etl_spark.pipeline import convert_vcfs_to_datalake, get_status
from geniepool_etl_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) != 8:
        print(__doc__, file=sys.stderr)
        return 2
    (
        input_path,
        output_path,
        status_path,
        impact_path,
        dbsnp_path,
        t2t_raw,
        gnomad_path,
        alpha_path,
    ) = args
    t2t = t2t_raw.strip().lower() in ("true", "1", "yes")

    spark = get_spark("geniepool-etl")
    lake_df = convert_vcfs_to_datalake(
        spark, input_path, impact_path, dbsnp_path, t2t, gnomad_path, alpha_path
    )
    write_datalake(lake_df, output_path)
    write_status(get_status(spark, input_path), status_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
