"""Decade probe for dedup.hash_band_pairs (r15): candidate volume
and wall time at N = 100k and N = 1M 64-bit hashes, capped vs
uncapped. The synthetic corpus is the designed quad structure (the
pHash/audio-fp lanes' shape) over xxhash64 group bases — every group
of 4 consecutive ids is a near-dup clique with <=5 top-band bit
flips, so expected true pairs = 1.5·N and recall is measurable.

With 16-bit bands, RANDOM band collisions alone contribute
~bands·C(N,2)/2^16 candidates — quadratic in N — which is exactly
what the max_bucket cap bounds. Run isolated:
python tools/hash_pairs_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark.operators import dedup as D  # noqa: E402
from geniepool_etl_spark.session import get_spark  # noqa: E402


def _flip_mask(m: int) -> int:
    mask = 0
    for t in range(m):
        mask |= 1 << (48 + ((m * 7 + t * 11) % 15))
    return mask


def main() -> None:
    spark = get_spark("hash-pairs-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in (100_000, 1_000_000):
        base = F.xxhash64((F.col("id") / 4).cast("long"))
        mask = (
            F.when(F.col("id") % 4 == 1, F.lit(_flip_mask(1)))
            .when(F.col("id") % 4 == 2, F.lit(_flip_mask(2)))
            .when(F.col("id") % 4 == 3, F.lit(_flip_mask(3)))
            .otherwise(F.lit(0))
        )
        hs = spark.range(n).select(
            F.col("id").alias("asset_id"),
            base.bitwiseXOR(mask).alias("phash"),
        )
        row = {}
        for tag, cap in (("uncapped", None), ("cap64", 64)):
            t0 = time.perf_counter()
            cnt = D.hash_band_pairs(
                hs, max_hamming=6, max_bucket=cap
            ).count()
            row[tag] = {
                "pairs": cnt,
                "sec": round(time.perf_counter() - t0, 3),
                "recall_vs_designed": round(cnt / (1.5 * n), 4),
            }
        out[str(n)] = row
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
