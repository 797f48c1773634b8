"""Iterative graph analytics on DataFrames — the Pregel-shaped
workload (repeated join + aggregate over an edge list) expressed so
Catalyst plans each superstep as ONE keyed shuffle join plus one
keyed aggregation.

Reference scope note: the reference engine (a single Spark batch job,
see SURVEY.md) has no graph operators; this module extends the
LLM-pipeline surface — link-graph quality priors (PageRank-style
centrality over a citation/hyperlink graph) are a standard
training-data curation signal.

Cross-engine determinism is the design constraint: float PageRank
sums differ in their last ulp across shuffle merge orders, so scores
here are EXACT fixed-point integers (``scale`` units per unit of
probability mass) and every per-edge contribution is an integer
division — any engine that repeats the arithmetic reproduces every
score bit-for-bit, at any scale, under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank in exact integer fixed-point.

    Per superstep: ``score' = base + Σ_{u→v} (score_u·d) div
    (100·deg_u)`` with ``base = ((100−d)·scale) div (100·N)`` — all
    BIGINT arithmetic (``div`` = integral division, matching DuckDB's
    ``//`` for the nonnegative values here), so the result is
    engine- and shuffle-order-independent. The integer divisions
    floor away sub-unit mass (bounded by one ``scale`` unit per edge
    per step) — the standard fixed-point trade, documented rather
    than hidden; scores are comparable, reproducible ranks, not
    float probabilities.

    Dangling nodes would leak mass; pass a SYMMETRIZED edge list
    (both directions) when the input graph may have sinks — the
    contract entry does.

    Plan shape per superstep: edge-list join on ``src`` (one keyed
    exchange, reusable across supersteps since the key never
    changes), aggregate on ``dst``, left join back to the node set;
    the node count rides a broadcast 1-row frame. The driver-side
    ``for`` loop builds ONE plan of ``iterations`` supersteps — no
    per-step action, no collect. At 100 TB checkpoint every few
    supersteps to cut lineage (same rule as dedup's signature frame).
    """
    if iterations <= 0:
        raise ValueError("pagerank_fixedpoint: iterations must be > 0")
    if not 0 < damping_pct < 100:
        raise ValueError("pagerank_fixedpoint: damping_pct in (0,100)")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    tot = nodes.agg(F.count(F.lit(1)).alias("_n"))
    base = F.expr(f"CAST({(100 - damping_pct) * scale} AS BIGINT) div (100 * _n)")
    scores = nodes.crossJoin(F.broadcast(tot)).select(
        "node", F.expr(f"CAST({scale} AS BIGINT) div _n").alias("score")
    )
    for _ in range(iterations):
        contribs = (
            ed.join(
                scores.select(F.col("node").alias("src"), "score"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.expr(f"(score * {damping_pct}) div (100 * deg)")
                ).alias("_c")
            )
        )
        scores = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                (base + F.coalesce(F.col("_c"), F.lit(0)))
                .alias("score"),
            )
        )
    return scores
