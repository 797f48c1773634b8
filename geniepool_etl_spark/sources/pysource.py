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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        # the SIMPLE streaming hook: offsets + reads happen driver-side
        # and Spark handles partition planning; a full streamReader()
        # (latestOffset + partitions) is the scale path for sources
        # whose reads must fan out across executors
        return SyntheticEventsStreamReader(
            int(self.options.get("rows_per_batch", 500))
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


def _rows_between(start: int, end: int):
    for event_id in range(start, end):
        yield (
            event_id,
            event_id % N_USERS,
            (event_id * MULT) % CENTS_MOD,
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("gp_synthetic_events")`` — the
    STREAMING half of the Python DataSource API (Spark 4):
    driver-side offset management with executor replay.

    - ``initialOffset``/``read``: each micro-batch advances the
      offset by ``rows_per_batch`` event ids; the offset is plain
      JSON, so it round-trips through the checkpoint and a RESTARTED
      query resumes exactly where the last one committed (asserted
      in the contract entry via two trigger-once runs over one
      checkpoint).
    - ``readBetweenOffsets``: deterministic replay of a recorded
      offset range after a crash — trivially exact here because rows
      are a pure function of event_id, which is precisely the
      property a real connector needs for end-to-end exactly-once.
    """

    def __init__(self, rows_per_batch: int) -> None:
        if rows_per_batch <= 0:
            raise ValueError(
                f"rows_per_batch must be positive, got {rows_per_batch}"
            )
        self.rows_per_batch = rows_per_batch

    def initialOffset(self) -> dict:
        return {"next": 0}

    # concrete lists, not generators: the wrapper's prefetch cache
    # copy.copy()s the returned iterator to allow re-reads, and
    # generators are not copyable
    def read(self, start: dict):
        s = int(start["next"])
        e = s + self.rows_per_batch
        return list(_rows_between(s, e)), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(_rows_between(int(start["next"]), int(end["next"])))

    def commit(self, end: dict) -> None:
        # offsets are pure arithmetic: nothing external to release
        pass

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SyntheticEventsDataSource)
