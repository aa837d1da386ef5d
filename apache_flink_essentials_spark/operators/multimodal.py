"""Multimodal columns (SURVEY §2.10): image/audio/video as opaque ``binary``
payloads with typed metadata, plus the Arrow-batched UDF plumbing for
decode / feature-extract / resize / frame-sample.

The media codec libraries (PIL/librosa/av) are NOT in this container, so the
actual decode step is STUBBED: ``decode_stub=True`` (default) produces
deterministic fake features derived from the payload bytes;
``decode_stub=False`` raises NotImplementedError where the real codec call
belongs. Everything around the stub — schema contract (schemas.MEDIA_SCHEMA),
mapInPandas batch iteration, Arrow transfer, partition sizing — is real and
tested; swapping in a real codec changes only the marked function body.

Scale design: media work is embarrassingly parallel per row but memory-heavy
per batch; ``mapInPandas`` with bounded ``spark.sql.execution.arrow.
maxRecordsPerBatch`` keeps executor memory flat, and repartitioning by
payload size (not row count) prevents straggler partitions full of videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature_dim", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: wrap the documents fixture as media rows (payload = UTF-8
    bytes of text) so the multimodal plumbing is exercisable with the
    driver-provided tables. Pure column expressions."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte histogram
    folded to ``dim`` buckets, L1-normalized. Replace with real decode."""
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = sum(buckets) or 1
    return [round(c / total, 6) for c in buckets]


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decode_stub: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Real pipeline shape: iterator-of-batches so one task never materializes
    its whole partition; per-batch vectorized work in pandas; output schema
    fixed by MEDIA_FEATURE_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # >>> real codec call goes here (PIL.Image.open /
                # librosa.load / av.open over pdf["payload"]) <<<
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "run with decode_stub=True"
                )
            feats = pdf["payload"].map(lambda p: _fake_features(bytes(p), dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(lambda p: len(bytes(p))),
                    "feature_dim": dim,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize image rows via ``mapInPandas`` (Arrow-batched), same contract
    as extract_features: the codec call is stubbed (deterministic payload
    passthrough + target dims recorded) or raises where the real
    decode→resize→re-encode belongs. Non-image rows are filtered out
    JVM-side BEFORE the Python boundary so only image payloads cross Arrow.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # >>> real codec call goes here (PIL.Image.open(payload)
                # .resize((width, height)).tobytes()) <<<
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "run with decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"],
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def spread_media(media: DataFrame, num_partitions: int, id_col: str = "media_id") -> DataFrame:
    """Row-level repartition before a decode stage: media files arrive
    packed by source (all videos of one crawl in one input split), so
    file-granularity partitions straggle. Hashing on the media id spreads
    rows uniformly; combined with bounded Arrow batches
    (``spark.sql.execution.arrow.maxRecordsPerBatch``) this keeps decode
    tasks CPU-bound and executor memory flat at 100 TB."""
    return media.repartition(num_partitions, F.col(id_col))


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata projection over media rows — pure column expressions (no
    decode): payload size + declared meta. This is the oracle-checkable
    part of the multimodal surface."""
    return media.select(
        F.col("media_id"),
        F.col("modality"),
        F.length(F.col("payload")).alias("payload_bytes"),
        F.col("meta.mime").alias("mime"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan* for video rows: one output row per planned
    sample timestamp (duration-driven), decode deferred to
    extract_features. Demonstrates 1→N expansion on media metadata without
    touching payloads (sequence+explode, JVM-side)."""
    return (
        media.filter(F.col("modality") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ),
        )
        .select("media_id", "sample_ms")
    )
