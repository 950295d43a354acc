"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract as Arrow-batched Pandas UDFs.

The Spark-side plumbing (schema, batching, partition behavior) is real and
tested; the actual media decoding is stubbed (`FakeDecoder`) because no
image/audio libraries ship in this container — swap `FakeDecoder.decode`
for a PIL/ffmpeg call in a real deployment (it raises NotImplementedError
if asked for a real decode).

Scale notes: `mapInPandas` streams Arrow record batches, so peak executor
memory is one batch of payloads, not a partition; decode parallelism ==
partition count, and binary payloads should live in their own parquet
column chunk (columnar pruning keeps metadata-only queries from touching
bytes at all).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for a media decoder.

    `decode_fake` derives stable pseudo-dimensions from the payload digest
    so tests are reproducible; `decode` is the real-decoder seam and raises
    until a media library is wired in.
    """

    @staticmethod
    def decode(payload: bytes) -> dict:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg; not available in this "
            "container — use decode_fake for plumbing tests"
        )

    @staticmethod
    def decode_fake(payload: bytes) -> dict:
        digest = hashlib.md5(payload).digest()
        return {
            "width": 64 + digest[0],
            "height": 64 + digest[1],
            "n_frames": 1 + digest[2] % 8,
            "format": ("png", "jpeg", "webp")[digest[3] % 3],
        }


def with_payload_meta(df: DataFrame, text_col: str) -> DataFrame:
    """Model a text column as (binary payload, typed metadata) — the shape
    a real image/audio table has. All JVM-side."""
    return df.select(
        "*",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
        F.md5(F.col(text_col)).alias("checksum"),
        F.lit("text/plain").alias("mime"),
    )


def decode_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) yielding the
    typed DECODED_SCHEMA. Only id+payload are shipped to Python (column
    pruning), batches stream so memory is O(batch)."""
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [FakeDecoder.decode_fake(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return src.mapInPandas(run, DECODED_SCHEMA)
