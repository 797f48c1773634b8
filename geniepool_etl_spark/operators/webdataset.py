"""WebDataset tar-shard packing and parsing.

Large multimodal training runs stream their corpus as WebDataset
shards (the public webdataset convention): plain POSIX tar files
whose members group into samples by basename — ``000017.jpg`` +
``000017.txt`` + ``000017.json`` is one sample — so a data loader
reads one sequential stream per shard with no random I/O. The
PACKING side is the training-prep sink (group samples → shards,
write one tar per shard); the PARSING side is the loader/auditor
(tar walk → member rows).

Spark-first shapes:
- ``pack_webdataset`` is ``applyInPandas`` grouped by shard id —
  the one legitimate shuffle (samples co-locate to their shard),
  then each shard serializes independently; 100 TB packs as wide as
  the shard count. Tars are BYTE-DETERMINISTIC (USTAR format,
  zeroed mtime/uid/gid/uname/gname, members sorted by (key, ext))
  so re-runs produce identical shards — idempotent sinks need
  identical bytes.
- ``parse_webdataset`` is the usual one-to-many Arrow expansion
  (shard asset → member rows) over stdlib ``tarfile``.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WDS_SHARD_SCHEMA = (
    "shard_id long, payload binary, n_samples long, n_members long"
)
WDS_MEMBER_SCHEMA = (
    "shard_id long, key string, ext string, n_bytes long, "
    "content string"
)


def pack_webdataset(
    samples: DataFrame,
    shard_col: str = "shard_id",
    key_col: str = "key",
    ext_col: str = "ext",
    data_col: str = "data",
) -> DataFrame:
    """(shard_id, key, ext, data) member rows → one deterministic
    tar payload per shard (grouped ``applyInPandas``; the groupBy is
    the only exchange)."""

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_col, ext_col])
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for _, r in pdf.iterrows():
                data = bytes(r[data_col])
                ti = tarfile.TarInfo(name=f"{r[key_col]}.{r[ext_col]}")
                ti.size = len(data)
                ti.mtime = 0
                ti.mode = 0o644
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf[shard_col].iloc[0])],
                "payload": [buf.getvalue()],
                "n_samples": [pdf[key_col].nunique()],
                "n_members": [len(pdf)],
            }
        )

    return samples.groupBy(shard_col).applyInPandas(
        one_shard, WDS_SHARD_SCHEMA
    )


def parse_webdataset(shards: DataFrame) -> DataFrame:
    """Tar shard → one row per member (key = basename before the
    FIRST dot, the webdataset grouping rule, so ``a.seg.json``
    groups under ``a``); member bytes decode utf-8 into ``content``
    (replace on binary members — callers needing raw bytes read the
    tar again with a binary schema). Poison (truncated tar, bad
    header checksum) yields the single null row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard_id", "key", "ext", "n_bytes", "content"]
        for pdf in it:
            rows = []
            for sid, b in zip(pdf["shard_id"], pdf["payload"]):
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(b)), mode="r:"
                    ) as tf:
                        for ti in tf.getmembers():
                            if not ti.isfile():
                                continue
                            name = ti.name.rsplit("/", 1)[-1]
                            key, _, ext = name.partition(".")
                            data = tf.extractfile(ti).read()
                            rows.append(
                                (
                                    int(sid), key, ext, len(data),
                                    data.decode("utf-8", "replace"),
                                )
                            )
                except Exception:
                    rows.append((int(sid), None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(batches, WDS_MEMBER_SCHEMA)
