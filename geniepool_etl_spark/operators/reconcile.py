"""Table reconciliation: digest-based diff of two keyed tables.

The migration-validation primitive: a user switching an existing
pipeline (e.g. from the reference engine's lake — M:127-138 — to this
repo's) needs "are these two 100 TB tables the same, and if not,
where" answered WITHOUT comparing raw rows across the wire.

Design for scale: each side is reduced scan-side to ``(key, digest)``
— an md5 over a canonical, null-sentineled rendering of the compared
columns — so the only thing that ever shuffles for the key alignment
is ~48 bytes/row regardless of row width. The verdict
per key is one of four statuses; the summary aggregates those. Wide
rows, large text/binary columns, nested payloads: none of it crosses
the exchange.

Caveat the docstring owns: the digest renders values via CAST TO
STRING, so the compared columns must have an engine-portable string
form when the diff is cross-engine (integers, strings, booleans —
not raw doubles; fix a decimal rendering first, e.g. cents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit-separator sentinels: a NULL must digest differently from the
# empty string and from any real value, and column boundaries must
# not be forgeable by embedded separators in data ("a","bc" vs
# "ab","c"). US (0x1f) never occurs in the star-schema text.
_SEP = "\x1f"
_NULL = "\x1f\x00"


def row_digest(cols: list[str]) -> Column:
    """md5 digest of a canonical rendering of ``cols``: each value
    cast to string, NULLs mapped to a reserved sentinel, joined on
    0x1f. Portable: any engine with md5 + string casts reproduces it
    (DuckDB: ``md5(concat_ws(chr(31), coalesce(CAST(c AS VARCHAR),
    chr(31)||chr(0)), ...))``)."""
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *rendered))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-key diff verdict between ``left`` and ``right``:
    ``(keys..., status)`` with status ∈ {'only_left', 'only_right',
    'differs', 'match'}.

    One full-outer sort-merge join on the keys over ``(key, digest)``
    projections — the minimum possible shuffle for exact global
    reconciliation. Keys are assumed unique per side (pre-aggregate
    otherwise).

    r16 note (measured, rejected): a union-tag ``groupBy(keys)``
    formulation (one exchange, no sorts) is value-equivalent under
    the unique-key contract but ran 39 % SLOWER at sf0.1 (0.76 s →
    1.06 s isolated floor) — with near-unique keys the map-side
    partial aggregate compresses nothing and just pays hash-table
    churn on every row, the same no-op-pre-aggregation trap the
    perplexity lane removed this round. The join's per-side sorts
    are cheaper than the aggregate's hashing; kept as-is.
    """
    l_proj = left.select(
        *keys, row_digest(compare_cols).alias("_l_digest")
    )
    r_proj = right.select(
        *keys, row_digest(compare_cols).alias("_r_digest")
    )
    joined = l_proj.join(r_proj, keys, "full_outer")
    status = (
        F.when(F.col("_l_digest").isNull(), F.lit("only_right"))
        .when(F.col("_r_digest").isNull(), F.lit("only_left"))
        .when(
            F.col("_l_digest") == F.col("_r_digest"), F.lit("match")
        )
        .otherwise(F.lit("differs"))
    )
    return joined.select(*keys, status.alias("status"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """The one-screen reconciliation report: row count per diff
    status (all four statuses always present, count 0 when empty —
    a missing status line in a migration report is ambiguous)."""
    statuses = ["differs", "match", "only_left", "only_right"]
    counted = (
        table_diff(left, right, keys, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    spark = left.sparkSession
    domain = spark.createDataFrame(
        [(s,) for s in statuses], ["status"]
    )
    return (
        domain.join(counted, "status", "left")
        .select(
            "status",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        )
    )
