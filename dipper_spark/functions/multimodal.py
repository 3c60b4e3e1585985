"""Multimodal column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque `binary` columns with
typed metadata, processed via Arrow-batched `mapInPandas` — the shape
a real decode/feature-extract/resize/frame-sample stage has at 100 TB
(schema, partitioning, UDF signature, batch flow are real; the codec
itself is STUBBED because no image/audio library exists in this
container).

  attach_fake_blobs(df)    deterministic binary blobs from text docs
                           (stands in for raw image/audio bytes)
  decode_image_meta(df)    mapInPandas "decode": blob -> (width,
                           height, n_bytes, format) — deterministic
                           pure function of the bytes, so an SQL
                           oracle can verify the plumbing end-to-end
  resize_stub / extract_features_stub: clearly-marked NotImplemented
                           codec boundaries with real signatures
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "doc_id bigint, blob binary, media_type string"
META_SCHEMA = "doc_id bigint, width int, height int, n_bytes bigint, format string"


def attach_fake_blobs(docs: DataFrame) -> DataFrame:
    """Deterministic binary column: utf-8 bytes of the text stand in for
    raw media bytes (same plumbing, no codec dependency)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def decode_image_meta(blobs: DataFrame) -> DataFrame:
    """'Decode' each blob to typed metadata via mapInPandas.

    The metadata is a deterministic pure function of the bytes
    (len-derived), so the Spark-side plumbing — Arrow batch transfer,
    binary handling, schema of the output — is fully testable against
    a SQL oracle.  A real implementation would call PIL/ffmpeg here,
    one Arrow batch at a time."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["blob"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n * 7 % 640 + 1).astype("int32"),
                    "height": (n * 13 % 480 + 1).astype("int32"),
                    "n_bytes": n.astype("int64"),
                    "format": pdf["media_type"].str.split("/").str[-1],
                }
            )

    return blobs.mapInPandas(decode, META_SCHEMA)


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize boundary — REAL signature, STUB body.

    On a cluster with codecs installed, replace the inner function with
    PIL decode->resize->encode over each Arrow batch."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "plug PIL/libvips decode->resize->encode here"
        )
        yield  # pragma: no cover

    return blobs.mapInPandas(resize, BLOB_SCHEMA)


def extract_features_stub(blobs: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction boundary (e.g. CLIP/audio embeddings) — REAL
    signature and batch shape, STUB body."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "no ML runtime in this environment; plug the encoder here "
            "(model loaded once per worker, batched inference per Arrow batch)"
        )
        yield  # pragma: no cover

    return blobs.mapInPandas(featurize, f"doc_id bigint, embedding array<float>")


def frame_sample_plan(video_blobs: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index, typed
    (doc_id, frame_idx, blob) — the explode is real (JVM), only the
    per-frame decode is stubbed downstream."""
    n_frames = (F.length("blob") % 300 + 1).alias("n_frames")  # deterministic stand-in
    return (
        video_blobs.filter(F.col("media_type") == "video/mp4")
        .select("doc_id", "blob", n_frames)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
            "blob",
        )
    )
