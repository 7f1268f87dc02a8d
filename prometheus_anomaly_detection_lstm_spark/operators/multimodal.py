"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside.  The decode/feature-extract step is a
``mapInPandas`` Arrow-batch pipeline; the actual codec work is STUBBED
(no image/audio libs in this container) behind a deterministic fake so
the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested (see tests/test_multimodal.py).

``binary_metadata`` (oracle-checked) derives byte length, digest and
deterministic fake decode dimensions from the payload with pure
Catalyst expressions; ``decode_batch``/``extract_features`` show the
Arrow-batched UDF path a real decoder would take.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def as_binary_table(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: (id, payload BINARY, media_type, meta)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def binary_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata from the opaque payload — JVM-side only.

    Fake decode dims are a deterministic function of the byte length
    (stands in for a real header parse): width = 64 + len % 256,
    height = 64 + (len // 7) % 256.
    """
    blen = F.octet_length("payload").cast("bigint")
    return media.select(
        "media_id",
        "media_type",
        blen.alias("byte_len"),
        F.md5("payload").alias("digest"),
        (F.lit(64) + blen % 256).cast("bigint").alias("fake_width"),
        (F.lit(64) + (F.floor(blen / 7) % 256)).cast("bigint").alias("fake_height"),
    )


DECODE_SCHEMA = (
    "media_id bigint, fake_width bigint, fake_height bigint, "
    "n_pixels bigint, mean_intensity double"
)


def decode_batch(media: DataFrame) -> DataFrame:
    """STUB decode via mapInPandas — the shape a real codec UDF takes.

    A real implementation would decode ``payload`` with PIL/ffmpeg per
    Arrow batch; this deterministic fake derives a tiny "image" from the
    payload bytes so the batch plumbing (binary in, struct out,
    partition-parallel) is exercised end-to-end.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["payload"].map(len).to_numpy()
            w = 64 + lens % 256
            h = 64 + (lens // 7) % 256
            # deterministic fake: "mean pixel" = mean byte value of payload
            mean_int = pdf["payload"].map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                if len(b)
                else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fake_width": w,
                    "fake_height": h,
                    "n_pixels": w * h,
                    "mean_intensity": mean_int,
                }
            )

    return media.mapInPandas(decode, DECODE_SCHEMA)


def resize_stub(media: DataFrame, target: int = 224) -> DataFrame:
    """STUB resize: real codecs unavailable -> raises if actually asked
    to produce pixels; metadata path works."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this "
        "container; use decode_batch's deterministic fake for plumbing "
        "tests"
    )


ORACLE_BINARY_METADATA = """SELECT doc_id AS media_id,
       'image/fake' AS media_type,
       CAST(length(text) AS BIGINT) AS byte_len,
       md5(text) AS digest,
       CAST(64 + length(text) % 256 AS BIGINT) AS fake_width,
       CAST(64 + (length(text) // 7) % 256 AS BIGINT) AS fake_height
FROM documents"""


def q_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary_metadata(as_binary_table(_docs(spark, sf_dir)))


def q_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_batch(as_binary_table(_docs(spark, sf_dir)))


QUERIES = {
    "multimodal_binary_metadata": (q_binary_metadata, ORACLE_BINARY_METADATA),
    # mapInPandas stub decode: rows-only check (Python batch path, no SQL twin)
    "multimodal_decode_stub": (q_decode_stub, None),
}
