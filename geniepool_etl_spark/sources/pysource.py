"""Python DataSource API lane (Spark 4): a custom batch source with
real split planning — ``partitions()`` returns one ``InputPartition``
per shard and executors call ``read(partition)`` in parallel, exactly
the contract a connector to a service/format Spark lacks would
implement (the reference's custom readers map here when no JVM
connector exists).

The concrete source is a deterministic synthetic-events generator:
every row is a pure integer function of ``event_id``, so (a) the
output is identical for any partition count — re-splitting is
answer-preserving, the property a real connector's split planner must
also hold — and (b) a SQL oracle can regenerate it exactly via
``generate_series`` arithmetic (no files involved).

Scale notes: rows are yielded as tuples from a generator (the API
streams them in Arrow batches to the JVM); state per partition is
O(1). For bulk columnar reads a real connector should prefer the
Arrow-batch read path (yielding ``pyarrow.RecordBatch``), which this
generator's row volume doesn't warrant. The multiplier is a Knuth
hash constant; all arithmetic stays in BIGINT range (max product
~2.6e13 ≪ 2^63) and value cents are summed as integers downstream.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MULT = 2654435761  # Knuth multiplicative-hash constant
N_USERS = 97
CENTS_MOD = 1_000_000


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("gp_synthetic_events")`` source.

    Options: ``partitions`` (split count), ``rows_per_partition``.
    """

    @classmethod
    def name(cls) -> str:
        return "gp_synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value_cents bigint"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            int(self.options.get("partitions", 8)),
            int(self.options.get("rows_per_partition", 1000)),
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, n_partitions: int, rows_per_partition: int) -> None:
        if n_partitions <= 0 or rows_per_partition <= 0:
            raise ValueError(
                "partitions and rows_per_partition must be positive, got "
                f"{n_partitions}/{rows_per_partition}"
            )
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_partition
        for i in range(self.rows_per_partition):
            event_id = base + i
            yield (
                event_id,
                event_id % N_USERS,
                (event_id * MULT) % CENTS_MOD,
            )


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SyntheticEventsDataSource)
