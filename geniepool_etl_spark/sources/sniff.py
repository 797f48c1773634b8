"""CSV dialect sniffing — the ingestion-time guess a lakehouse
loader makes before committing to a parse (the `csv.Sniffer` /
pandas `sep=None` step, Spark-first).

Candidate delimiters are scored per document over its first lines:
quoted regions are struck first (``"…"`` may contain any delimiter),
then a candidate is CONSISTENT when every non-empty line yields the
same field count > 1. The winning delimiter is the first consistent
candidate in priority order (``,`` ``;`` ``\\t`` ``|``) — ties go to
the conventional comma, exactly like the stdlib sniffer's
preference list. A header is inferred when the first line has no
all-numeric field but the second line does.

All of it is one codegen'd projection of split/ filter/ transform
expressions over the raw text — zero UDFs, no shuffle: sniffing a
million files costs one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DELIMS: tuple[tuple[str, str], ...] = (
    ("comma", ","),
    ("semicolon", ";"),
    ("tab", "\t"),
    ("pipe", "|"),
)


def _lines(body: Column) -> Column:
    return F.filter(
        F.split(body, r"\r?\n"), lambda l: F.length(l) > 0
    )


def sniff_csv_dialect(
    df: DataFrame, body_col: str = "body", id_col: str = "asset_id"
) -> DataFrame:
    """Per document: ``delimiter`` (name, or 'unknown'), ``n_cols``,
    ``has_header``, ``n_lines`` — computed from quote-stripped field
    counts. ``unknown`` (with n_cols 0) when no candidate is
    consistent across lines."""
    stripped = F.transform(
        _lines(F.col(body_col)),
        lambda l: F.regexp_replace(l, '"[^"]*"', "q"),
    )
    out = df.withColumn("_ls", stripped)
    # per candidate: field count per line; consistent iff one
    # distinct count and > 1 field
    def _counts(d: str) -> Column:
        # single-arg lambda factory: a 2-arg lambda would receive
        # (element, index) and clobber a default-arg capture of d.
        pat = "\\" + d if d in ",|" else d
        return F.transform(
            F.col("_ls"), lambda l: F.size(F.split(l, pat, -1))
        )

    for name, d in DELIMS:
        counts = _counts(d)
        ok = (
            (F.size(F.col("_ls")) > 0)
            & (F.size(F.array_distinct(counts)) == 1)
            & (F.element_at(counts, 1) > 1)
        )
        out = out.withColumn(f"_ok_{name}", ok).withColumn(
            f"_nc_{name}", F.element_at(counts, 1)
        )
    delim = F.lit("unknown")
    n_cols = F.lit(0)
    for name, _d in reversed(DELIMS):
        delim = F.when(F.col(f"_ok_{name}"), F.lit(name)).otherwise(
            delim
        )
        n_cols = F.when(
            F.col(f"_ok_{name}"), F.col(f"_nc_{name}")
        ).otherwise(n_cols)
    out = out.withColumn("_delim", delim).withColumn("_nc", n_cols)
    sep = F.lit(None).cast("string")
    for name, d in reversed(DELIMS):
        sep = F.when(
            F.col("_delim") == name, F.lit("\\" + d if d in ",|" else d)
        ).otherwise(sep)
    fields1 = F.split(F.element_at(F.col("_ls"), 1), sep, -1)
    fields2 = F.when(
        F.size(F.col("_ls")) >= 2,
        F.split(F.element_at(F.col("_ls"), 2), sep, -1),
    )
    numeric = lambda f: f.rlike(r"^-?\d+(\.\d+)?$")  # noqa: E731
    has_header = (
        (F.col("_delim") != "unknown")
        & fields2.isNotNull()
        & (F.size(F.filter(fields1, numeric)) == 0)
        & (F.size(F.filter(fields2, numeric)) > 0)
    )
    return out.select(
        F.col(id_col),
        F.col("_delim").alias("delimiter"),
        F.col("_nc").cast("int").alias("n_cols"),
        F.coalesce(has_header, F.lit(False)).alias("has_header"),
        F.size(F.col("_ls")).cast("int").alias("n_lines"),
    )
