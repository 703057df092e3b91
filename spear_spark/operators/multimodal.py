"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema contracts,
batch iteration, partition-preserving projection; the actual media
decoding is stubbed (the container has no image/audio libs) behind
:func:`_decode_backend`, which raises ``NotImplementedError`` for real
codecs and provides a deterministic fake (md5-derived dimensions) so
the pipeline is end-to-end testable and oracle-checkable.

Scale notes:
* binary payloads ride the normal columnar path (parquet binary);
  ``spark.sql.files.maxPartitionBytes`` bounds per-task bytes, and
  Arrow batches bound Python memory (``maxRecordsPerBatch``).
* decode/feature-extract is per-row CPU work with zero shuffle —
  perfectly elastic across 1000 executors.
* frame sampling / resize emit 1→N rows: do it inside the same
  mapInPandas pass (iterator of batches → iterator of batches) so the
  fan-out never materializes driver-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)


def attach_binary(df: DataFrame, source_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 of a text col;
    in production: parquet binary / file bytes via spark.read.format
    ('binaryFile'))."""
    return df.withColumn(out_col, F.encode(F.col(source_col), "utf-8"))


def _decode_backend(payload: bytes) -> tuple[int, int, str]:
    """STUB: real image decode (PIL/libvips) is unavailable in this
    container.  The deterministic fake derives dimensions from the md5
    digest of the payload — stable across engines and runs."""
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode path not wired yet; deterministic fake below "
            "defines the contract (width, height, format)"
        )
    except ImportError:
        digest = hashlib.md5(payload).hexdigest()
        width = int(digest[:4], 16) % 1920 + 1
        height = int(digest[4:8], 16) % 1080 + 1
        return width, height, "fake"


def decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode: binary payload → (n_bytes, width, height,
    format).  Iterator-of-batches signature keeps memory bounded."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_decode_backend(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                    "format": [d[2] for d in dims],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(decode, DECODED_SCHEMA)
