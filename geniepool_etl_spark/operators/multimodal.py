"""Multimodal column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted via Arrow-batched
``mapInPandas``.

The real decode step (image/audio/video libraries) is NOT available in
this environment, so the media decoders are stubbed behind
``NotImplementedError`` with a deterministic byte-level feature
extractor standing in — but the Spark-side plumbing is real and
tested: schema contract, binary column handling, Arrow batch shapes,
partition-preserving narrow execution.

Scale design: ``mapInPandas`` is a narrow per-partition map (no
shuffle); batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Payload bytes never
cross a shuffle boundary — extract features first, aggregate features
only. At 100 TB the binary column stays columnar in parquet and is
column-pruned away whenever a query touches only metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract for an ingested media asset: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapt the ``documents`` table into the asset contract: the text
    utf-8-encoded as the opaque payload (JVM-side ``encode`` — no
    Python in the ingest path)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_image(payload: bytes) -> object:
    """Stub: real image decode (PIL/OpenCV) is unavailable here."""
    raise NotImplementedError(
        "image decode requires PIL/OpenCV — not installed in this environment"
    )


def decode_audio(payload: bytes) -> object:
    """Stub: real audio decode (soundfile/ffmpeg) is unavailable here."""
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg — not installed in this environment"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over Arrow batches (1 row in → 1 row out). The
    pixel work is a deterministic stand-in (payload truncated to
    width·height bytes — PIL/OpenCV are unavailable here; a real
    decoder replaces the inner lambda only), but the contract a real
    resize needs — schema, batch shape, binary handling — is exercised
    for real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(
                        lambda b: b[:n] if b is not None else None
                    ),
                }
            )

    return assets.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 1024, every_n: int = 2
) -> DataFrame:
    """Video frame sampling over Arrow batches — the one-to-MANY
    mapInPandas shape (each asset row expands to its sampled frames).
    Frames are deterministic fixed-width byte windows standing in for
    a real ffmpeg decode; the explode-style output contract is real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(asset_id)
                    idxs.append(i)
                    frames.append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches via
    ``mapInPandas`` (the slot where a real decoder plugs in — see the
    ``decode_*`` stubs). Features here are deterministic byte/char
    counts so correctness is externally checkable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "n_chars": payloads.map(
                        lambda b: len(b.decode("utf-8", errors="replace"))
                        if b is not None
                        else None
                    ).astype("Int64"),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)
