"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, batch-shaped Pandas-UDF decode/feature stages.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fake features, clearly marked); everything
Spark-side — schema, partitioning, Arrow batch shape, UDF signatures —
is real and tested.  Swapping ``_fake_decode`` for a PIL/ffmpeg call is
a one-function change that does not touch the plan.

Design for 100 TB of blobs:
- blobs travel as ``binary`` columns in parquet (or as object-store
  URIs + a fetch stage) — never through the driver;
- decode runs in ``mapInPandas`` so each task processes Arrow batches
  (zero-copy into numpy), and ``spark.sql.files.maxPartitionBytes`` /
  ``maxRecordsPerBatch`` bound executor memory per batch;
- features come back as fixed-width arrays -> downstream similarity /
  dedup reuse the vector operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from eventstreamd_spark.session import fan_out

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, blob binary, byte_len int, content_md5 string"
)
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, feature array<float>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: fake a media table from ``documents`` (text bytes stand
    in for image/audio payloads).  Metadata columns are real Spark
    expressions: byte length + md5 fingerprint, both JVM-side."""
    blob = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        blob.alias("blob"),
        F.length(blob).cast("int").alias("byte_len"),
        F.md5(blob).alias("content_md5"),
    )


def _fake_decode(blob: bytes) -> list[float]:
    """STUB decode kernel — deterministic fake features.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(blob))
    -> resize -> channel means; codecs are unavailable in this
    container, so we emit a deterministic byte-histogram projection
    instead (raises nothing, needs nothing).
    """
    if blob is None:
        return [0.0] * FEATURE_DIM
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(blob):
        acc[i % FEATURE_DIM] += b
    n = max(len(blob), 1)
    return [a / n for a in acc]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract stage as ``mapInPandas`` — per-partition
    Arrow batch iterator, the canonical shape for binary-payload UDFs."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "feature": pdf["blob"].map(_fake_decode),
                }
            )
            yield out

    # fan_out: the Python decode kernel is the per-row cost — make sure
    # Arrow batches land on every core, not one file split's worth
    return fan_out(media).mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def media_metadata_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over the blob column — pure JVM."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_blobs"),
        F.sum("byte_len").alias("total_bytes"),
        F.min("byte_len").alias("min_bytes"),
        F.max("byte_len").alias("max_bytes"),
        F.countDistinct("content_md5").alias("n_distinct_blobs"),
    )
