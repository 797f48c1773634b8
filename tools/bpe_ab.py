"""A/B probe for bpe_token_counts physical shapes (r16, throwaway):

  A = current tree implementation (whatever text.py holds)
  B = occurrence-level billing join, no (doc,w) aggregate, no checkpoint:
      occ -> vocab (count by w) -> rounds -> broadcast word_tok ->
      occ join word_tok -> groupBy(doc)

Usage: python tools/bpe_ab.py [--sf10] [runs]
Prints wall seconds per run for each variant, interleaved A,B,A,B...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geniepool_etl_spark import contract as C  # noqa: E402
from geniepool_etl_spark.operators import text as TX  # noqa: E402
from geniepool_etl_spark.operators.text import (  # noqa: E402
    _greedy_merge_rep,
    words_col,
)


def variant_b(df, k=3, text_col="text", id_col="doc_id"):
    occ = df.select(
        F.col(id_col),
        F.explode(words_col(F.lower(F.col(text_col)))).alias("w"),
    ).where(F.length("w") > 0)
    vocab = (
        occ.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.concat(
                F.lit("  "),
                F.array_join(F.split(F.col("w"), ""), "  "),
                F.lit("  "),
            ).alias("rep"),
            "freq",
        )
    )
    for _step in range(1, k + 1):
        arred = vocab.select(
            "rep", "freq",
            F.split(F.trim(F.col("rep")), "  ").alias("_t"),
        )
        bigrams = F.when(
            F.size("_t") >= 2,
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct("
                "  element_at(_t, i) AS l, "
                "  element_at(_t, i + 1) AS r))"
            ),
        ).otherwise(F.array())
        pairs = (
            arred.select(F.explode(bigrams).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.agg(
            F.min_by(
                F.struct(F.col("l"), F.col("r")),
                F.struct(
                    (-F.col("pair_count")).alias("nc"),
                    F.col("l"),
                    F.col("r"),
                ),
            ).alias("_w")
        ).select(
            F.col("_w.l").alias("_bl"), F.col("_w.r").alias("_br")
        )
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            "w",
            _greedy_merge_rep(
                F.col("rep"), F.col("_bl"), F.col("_br")
            ).alias("rep"),
            "freq",
        )
    word_tok = vocab.select(
        "w",
        F.size(F.split(F.trim(F.col("rep")), "  ")).cast("long").alias(
            "n_tok"
        ),
    )
    return (
        occ.join(F.broadcast(word_tok), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def main() -> None:
    tier10 = "--sf10" in sys.argv
    runs = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
    spark = bench.get_spark(
        "bpe-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._stage_sf1(spark, bench.SF_DIR)
    d = bench.SF1_DIR
    if tier10:
        bench._stage_sf10(spark)
        d = bench.SF10_DIR
    docs = C._t(spark, d, "documents")

    wall = {"A": [], "B": []}
    for i in range(runs):
        for name, build in (
            ("A", lambda: TX.bpe_token_counts(docs, k=3)),
            ("B", lambda: variant_b(docs, k=3)),
        ):
            df = build()  # fresh build each run: checkpoints not reused
            spark.sparkContext.setJobDescription(f"bpe {name} run{i}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall[name].append(round(time.perf_counter() - t0, 3))
    print("A (tree impl, fresh build each run):", wall["A"])
    print("B (occurrence-level join):          ", wall["B"])
    spark.stop()


if __name__ == "__main__":
    main()
