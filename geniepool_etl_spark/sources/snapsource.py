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

Semantics (the Delta CDF rules, rewrite-spanning since r12): every
row carries ``_change_type`` and ``_commit_version``. Versions whose
action only ADDS files (create/append) stream their new files as
``insert`` rows; ``delete``/``merge`` commits stream their write-time
``change_files`` (each row carries its own recorded change type —
insert / delete / update_preimage / update_postimage, the batch
feed's vocabulary); an ``overwrite`` streams the manifest diff as
delete-all + insert-all; ``compact`` is rows-identical and streams
nothing. A rewrite commit WITHOUT change_files (written before
write-time tracking) still fails LOUD — its net changes were never
recorded and a file diff across it would mix rewritten old rows with
new ones, the classic CDC corruption.

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
        from pyspark.sql.types import LongType, StringType, StructType

        table = self._table_path()
        vs = _versions(table)
        if not vs:
            raise ValueError(
                f"gp_snap_changes: no snapshots at {self._table_path()}"
            )
        schema = StructType.fromJson(
            json.loads(_manifest(table, vs[-1])["schema"])
        )
        out = StructType()
        for f in schema.fields:
            # all-nullable: change rows null-fill columns the table
            # evolved after their origin files were written, and
            # schema-evolved parent files null-fill on read
            out = out.add(f.name, f.dataType, True)
        return out.add("_change_type", StringType()).add(
            "_commit_version", LongType()
        )

    def streamReader(self, schema) -> "SnapChangesStreamReader":
        return SnapChangesStreamReader(
            self._table_path(),
            [
                (f.name, f.dataType.simpleString())
                for f in schema.fields[:-2]
            ],
        )


class _FileSlice(InputPartition):
    def __init__(
        self, path: str, commit_version: int,
        change_type: str | None = "insert",
    ) -> None:
        self.path = path
        self.commit_version = commit_version
        # a fixed type for data files; None for write-time change
        # files, whose rows each carry their own recorded type
        self.change_type = change_type


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
        prev = {
            f["path"] for f in _manifest(self.table_path, v0)["files"]
        }
        prev_m = _manifest(self.table_path, v0)
        parts: list[InputPartition] = []
        for v in vs:
            if v <= v0:
                continue
            if v > v1:
                break
            m = _manifest(self.table_path, v)
            act = m["action"]
            cur = {f["path"] for f in m["files"]}
            if act in ("append", "create"):
                for f in m["files"]:
                    if f["path"] not in prev:
                        parts.append(_FileSlice(
                            os.path.join(self.table_path, f["path"]),
                            v, "insert",
                        ))
            elif act == "compact":
                pass  # rows identical by construction
            elif act == "overwrite":
                for f in prev_m["files"]:
                    if f["path"] not in cur:
                        parts.append(_FileSlice(
                            os.path.join(self.table_path, f["path"]),
                            v, "delete",
                        ))
                for f in m["files"]:
                    if f["path"] not in prev:
                        parts.append(_FileSlice(
                            os.path.join(self.table_path, f["path"]),
                            v, "insert",
                        ))
            elif act in ("delete", "merge"):
                if "change_files" not in m:
                    raise ValueError(
                        f"gp_snap_changes: version {v} is a rewrite "
                        f"({act!r}) committed before write-time change "
                        "tracking; its net changes were never recorded"
                    )
                for f in m["change_files"]:
                    parts.append(_FileSlice(
                        os.path.join(self.table_path, f["path"]),
                        v, None,
                    ))
            else:
                raise ValueError(
                    f"gp_snap_changes: version {v} has unknown "
                    f"action {act!r}"
                )
            prev, prev_m = cur, m
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
        if partition.change_type is not None:
            ct = [partition.change_type] * table.num_rows
        else:
            ct = table.column("_change_type").to_pylist()
        cv = [partition.commit_version] * table.num_rows
        return iter(zip(*cols, ct, cv))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SnapChangesDataSource)
