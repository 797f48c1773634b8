"""Engine-portable scalar helpers shared by the operator library.

Two hash families:

- **fast path** (``fast_hash64``): Spark's built-in ``xxhash64`` —
  JVM-side, codegen'd, the default for production pipelines.
- **portable path** (``portable_hash32``): the first 8 hex chars of
  ``md5`` parsed as an integer. Bit-identical in any engine with md5
  (DuckDB: ``CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT)``),
  so correctness oracles can recompute it. ~3× slower than xxhash64;
  use only where cross-engine reproducibility is required.

Time helpers normalize the parquet ``TIMESTAMP(NANOS)`` columns
(unreadable by Spark's vectorized reader without
``spark.sql.legacy.parquet.nanosAsLong=true``) into integer epoch
micros, keeping all event-time arithmetic timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

PORTABLE_HASH_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1


def fast_hash64(col: Column, seed: int = 0) -> Column:
    """xxhash64 with a seed folded in — the production hash."""
    if seed:
        return F.xxhash64(col, F.lit(seed))
    return F.xxhash64(col)


def portable_hash32(col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit unsigned hash reproducible in any engine:
    ``int(md5(f"{seed}:{s}")[:8], 16)`` as a long in [0, 2^32)."""
    s = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB-SQL rendering of :func:`portable_hash32`."""
    return (
        f"CAST(concat('0x', substring(md5(concat('{seed}:', CAST({expr} AS VARCHAR)))"
        f", 1, 8)) AS BIGINT)"
    )


def enable_nanos_as_long(spark: SparkSession) -> None:
    """Allow reading parquet TIMESTAMP(NANOS) columns as raw long
    nanos (Spark's vectorized reader otherwise rejects the type with
    PARQUET_TYPE_ILLEGAL). Safe to call repeatedly; runtime conf."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def micros(col_name: str) -> Column:
    """Epoch-micros long from a nanos-long column (integer ``div``,
    not ``/`` — double division rounds at 1e18 magnitudes and can land
    one µs high of the floor DuckDB's ns→µs conversion uses)."""
    return F.expr(f"CAST({col_name} AS LONG) div 1000")


def tumble_us(us: Column, width_us: int) -> Column:
    """Tumbling-window start (epoch micros) via pure integer math —
    identical in every engine, timezone-free."""
    return us - (us % F.lit(width_us))
