"""Python user-defined table functions (Spark 4 UDTF API): the
extensibility lane for logic that must emit a *variable number of
rows per input partition* with driver-defined lifecycle
(``__init__`` → ``eval`` per row → ``terminate``).

Placement in the engine's lane hierarchy (SCALE.md): built-in
exprs ≫ pandas_udf / applyInPandas (Arrow-batched) ≫ UDTF — the UDTF
worker receives rows one at a time over pickle, NOT Arrow batches, so
this lane is for control-flow-shaped extensions (top-k with early
cutoff, stateful emission, protocol parsing), never for bulk numeric
work. Anything expressible as a window/agg should stay JVM-side; the
contract entry's oracle IS that window formulation, pinning the two
lanes equivalent.

Scale: ``TABLE(t) PARTITION BY key`` shuffles once on the key (same
exchange a window function would need); per-partition state is
bounded by the UDTF's own logic (here: the running top-k heap, k
rows), so executor memory is O(k) per key, not O(partition).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="user_id bigint, event_id bigint, rnk int")
class TopKByValue:
    """Per-partition top-k rows by ``round(value, 4)`` (descending),
    ``event_id`` tiebreak — deterministic under any input order, so
    the result is invariant to shuffle nondeterminism.

    Keeps a bounded min-heap of size k: O(k) state per partition and
    O(log k) per row, regardless of partition size — the shape that
    survives a hot key with 10^8 events.
    """

    K = 2

    def __init__(self) -> None:
        self._heap: list = []  # (round(value,4), -event_id) min-heap

    def eval(self, row) -> None:
        item = (round(row["value"], 4), -row["event_id"], row["user_id"])
        if len(self._heap) < self.K:
            heapq.heappush(self._heap, item)
        elif item > self._heap[0]:
            heapq.heapreplace(self._heap, item)

    def terminate(self):
        ranked = sorted(self._heap, key=lambda t: (-t[0], -t[1]))
        for i, (_, neg_id, user_id) in enumerate(ranked):
            yield user_id, -neg_id, i + 1


def topk_by_value(
    spark: SparkSession, events: DataFrame, view: str = "gp_udtf_events"
) -> DataFrame:
    """Register + invoke the UDTF over ``events`` partitioned by
    user: ``SELECT * FROM topk_by_value(TABLE(v) PARTITION BY
    user_id)``. Re-invocable: registration and the temp view both
    overwrite."""
    spark.udtf.register("gp_topk_by_value", TopKByValue)
    events.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT * FROM gp_topk_by_value(TABLE({view}) PARTITION BY user_id)"
    )
