"""Streaming source over a snapshot table's change feed — the
Delta-streaming-source shape (``spark.readStream.format("delta")``)
rebuilt on the snaptable manifest log and the FULL Python DataSource
streaming API (Spark 4): offsets are table VERSIONS, micro-batch
planning is a driver-side manifest diff (kilobytes of JSON), and each
newly-appended FILE becomes one ``InputPartition`` that an executor
reads directly with pyarrow — row payloads never pass through the
driver, which is the property that separates this from the
``SimpleDataSourceStreamReader`` lane (sources/pysource.py) and makes
it the scale path: a 10 TB append streams as its file set, planned
from its manifest.

Semantics (the Delta CDF append rule): versions whose action only ADDS
files (create/append) stream their new files stamped with
``_commit_version``; a rewrite action (delete/merge/compact/overwrite)
inside the offset range fails LOUD — a file diff across rewrites mixes
rewritten old rows with new ones, the classic CDC corruption. (The
BATCH feed, snaptable.read_changes, spans rewrites since r12 via
write-time ``change_files``; extending this streaming source to plan
those per-commit change files is the analogous next step.)

Filesystem scope: manifests and data files are opened with plain
``open``/pyarrow (file:// paths — the test/CI scope); an object-store
deployment swaps in ``pyarrow.fs`` handles, the planning logic is
path-scheme-agnostic. Exactly-once composes the usual way: offsets
checkpoint through Spark, replay re-reads the SAME immutable files
(copy-on-write tables never mutate a committed file), and the sink
dedupes by batch id.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_LOG_DIR = "_snaplog"


def _versions(table_path: str) -> list[int]:
    logdir = os.path.join(table_path, _LOG_DIR)
    if not os.path.isdir(logdir):
        return []
    out = []
    for name in os.listdir(logdir):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _manifest(table_path: str, version: int) -> dict:
    p = os.path.join(table_path, _LOG_DIR, f"{version:08d}.json")
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _cast(raw: str, dtype: str):
    """Directory-name partition value → the schema's python type
    (the same declared-type discipline snaptable._read_files applies
    JVM-side). Hive escapes special characters (':' → '%3A' etc.) in
    directory names, so unquote FIRST; date/timestamp/decimal get
    real typed values (review finding — a string in a DateType field
    breaks the DataSource row conversion)."""
    from urllib.parse import unquote

    raw = unquote(raw)
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return int(raw)
    if dtype in ("float", "double"):
        return float(raw)
    if dtype == "boolean":
        return raw.lower() == "true"
    if dtype == "date":
        from datetime import date

        return date.fromisoformat(raw)
    if dtype.startswith("timestamp"):
        from datetime import datetime

        return datetime.fromisoformat(raw)
    if dtype.startswith("decimal"):
        from decimal import Decimal

        return Decimal(raw)
    return raw


class SnapChangesDataSource(DataSource):
    """``spark.readStream.format("gp_snap_changes").option("path", t)``
    — stream a snapshot table's appended rows, one batch per offset
    advance, each row stamped with ``_commit_version``."""

    @classmethod
    def name(cls) -> str:
        return "gp_snap_changes"

    def _table_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("gp_snap_changes: option 'path' is required")
        return path

    def schema(self):
        from pyspark.sql.types import LongType, StructType

        table = self._table_path()
        vs = _versions(table)
        if not vs:
            raise ValueError(
                f"gp_snap_changes: no snapshots at {self._table_path()}"
            )
        schema = StructType.fromJson(
            json.loads(_manifest(table, vs[-1])["schema"])
        )
        return schema.add("_commit_version", LongType())

    def streamReader(self, schema) -> "SnapChangesStreamReader":
        return SnapChangesStreamReader(
            self._table_path(),
            [
                (f.name, f.dataType.simpleString())
                for f in schema.fields[:-1]
            ],
        )


class _FileSlice(InputPartition):
    def __init__(self, path: str, commit_version: int) -> None:
        self.path = path
        self.commit_version = commit_version


class SnapChangesStreamReader(DataSourceStreamReader):
    """Version-offset stream planner. ``partitions(start, end)`` is
    the manifest file-list diff for ``(start, end]`` — one partition
    per new file, carrying its commit version; ``read`` runs on an
    EXECUTOR and scans that one parquet file with pyarrow."""

    def __init__(
        self, table_path: str, data_cols: list[tuple[str, str]]
    ) -> None:
        self.table_path = table_path
        self.data_cols = data_cols

    def initialOffset(self) -> dict:
        # deliver the whole existing table as the first batch — the
        # Delta streaming-source default (startingVersion=earliest)
        return {"version": -1}

    def latestOffset(self) -> dict:
        vs = _versions(self.table_path)
        return {"version": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        vs = _versions(self.table_path)
        if v0 < 0:
            # initial load = the CURRENT snapshot at the end offset
            # (the Delta streaming-source rule) — NOT a replay of the
            # whole history: a rewrite inside the history would make
            # the naive file-diff double-emit pre-rewrite rows (review
            # finding). Each file is attributed to the earliest
            # version that references it.
            head = _manifest(self.table_path, v1)
            first_seen: dict[str, int] = {}
            for v in vs:
                if v > v1:
                    break
                for f in _manifest(self.table_path, v)["files"]:
                    first_seen.setdefault(f["path"], v)
            return [
                _FileSlice(
                    os.path.join(self.table_path, f["path"]),
                    first_seen[f["path"]],
                )
                for f in head["files"]
            ]
        seen = {f["path"] for f in _manifest(self.table_path, v0)["files"]}
        parts: list[InputPartition] = []
        for v in vs:
            if not (v0 < v <= v1):
                continue
            m = _manifest(self.table_path, v)
            if m["action"] not in ("append", "create"):
                raise ValueError(
                    f"gp_snap_changes: version {v} is a rewrite "
                    f"({m['action']!r}); the file diff is not a row-level "
                    "change feed across rewrites"
                )
            for f in m["files"]:
                if f["path"] not in seen:
                    seen.add(f["path"])
                    parts.append(
                        _FileSlice(
                            os.path.join(self.table_path, f["path"]), v
                        )
                    )
        return parts

    def read(self, partition: _FileSlice):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        # hive-partitioned tables drop partition columns from leaf
        # files — their values live in the col=value path segments
        pvals: dict[str, str] = {}
        for seg in partition.path.split(os.sep)[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                pvals[k] = v
        cols = []
        for name, dtype in self.data_cols:
            if name in table.column_names:
                cols.append(table.column(name).to_pylist())
            elif name in pvals:
                cols.append([_cast(pvals[name], dtype)] * table.num_rows)
            else:
                # schema-evolved parent file: null-fill the new column
                cols.append([None] * table.num_rows)
        cv = [partition.commit_version] * table.num_rows
        return iter(zip(*cols, cv))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SnapChangesDataSource)
