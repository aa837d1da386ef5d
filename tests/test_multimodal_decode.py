"""Planted-fixture tests for the real media decode path (media_codecs +
multimodal decode_stub=False): PNG/BMP codec roundtrips, header probes for
JPEG/GIF/WEBP/WAV, pixel-level features, and genuine resize through Spark."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from apache_flink_essentials_spark.operators import media_codecs as C
from apache_flink_essentials_spark.operators import multimodal as M
from apache_flink_essentials_spark.schemas import MEDIA_SCHEMA


# --- fixture payload builders ---------------------------------------------

def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Build a spec-valid PNG applying the GIVEN filter type per scanline
    (exercises the decoder's unfilter paths our encoder never emits)."""
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ft = filters[y]
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        filt = np.empty(stride, np.int32)
        for x in range(stride):
            a = int(flat[y, x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (int(row[x]) - pred) & 0xFF
        out.append(ft)
        out += filt.astype(np.uint8).tobytes()
    idat = zlib.compress(bytes(out))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _minimal_jpeg(width: int, height: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def _webp_vp8l(width: int, height: int) -> bytes:
    bits = (width - 1) | ((height - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits) + b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# --- codec unit tests ------------------------------------------------------

def test_png_roundtrip_rgb_gray_rgba():
    for arr in (_rgb(5, 7), _rgb(4, 4)[:, :, :1], _rgb(3, 6, 1)[:, :, [0, 1, 2, 0]]):
        enc = C.encode_png(np.ascontiguousarray(arr))
        probe = C.probe_image(enc)
        assert probe == ("png", arr.shape[1], arr.shape[0])
        dec = C.decode_png(enc)
        np.testing.assert_array_equal(dec, arr)


def test_png_all_filter_types_decode():
    arr = _rgb(5, 6, seed=42)
    enc = _png_with_filters(arr, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(C.decode_png(enc), arr)


def test_bmp_roundtrip_with_row_padding():
    arr = _rgb(4, 3)  # width 3 → 9-byte rows padded to 12
    enc = C.encode_bmp(arr)
    assert C.probe_image(enc) == ("bmp", 3, 4)
    np.testing.assert_array_equal(C.decode_bmp(enc), arr)


def test_header_probes_jpeg_gif_webp():
    assert C.probe_image(_minimal_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert C.probe_image(_gif(13, 11)) == ("gif", 13, 11)
    assert C.probe_image(_webp_vp8l(17, 5)) == ("webp", 17, 5)


def test_probe_rejects_text_and_truncated():
    assert C.probe_image(b"BM this is text that starts with BM" + b"x" * 40) is None
    assert C.probe_image(b"hello world, definitely not an image payload!") is None
    assert C.probe_image(C.encode_png(_rgb(3, 3))[:20]) is None


def test_wav_probe_and_samples():
    samples = (np.sin(np.linspace(0, 20, 8000)) * 20000).astype(np.int16)
    b = _wav(samples, rate=8000)
    info = C.probe_wav(b)
    assert info["sample_rate"] == 8000
    assert info["duration_ms"] == 1000
    got, rate = C.decode_wav_samples(b)
    assert rate == 8000
    np.testing.assert_array_equal(got[:, 0], samples)


def test_resize_nearest_shapes_and_identity():
    arr = _rgb(8, 8)
    np.testing.assert_array_equal(C.resize_nearest(arr, 8, 8), arr)
    assert C.resize_nearest(arr, 4, 2).shape == (2, 4, 3)
    # constant image stays constant at any size
    const = np.full((5, 5, 3), 77, np.uint8)
    assert (C.resize_nearest(const, 16, 3) == 77).all()


# --- Spark-side planted-fixture tests -------------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, mod, bytearray(payload), (mime, None, None, None, None))
         for i, (mod, payload, mime) in enumerate(rows)],
        MEDIA_SCHEMA,
    )


def test_extract_features_real_decode(spark):
    white = np.full((4, 4, 3), 255, np.uint8)      # luminance 255 → last bucket
    black = np.zeros((4, 4, 3), np.uint8)          # luminance 0 → first bucket
    wav = _wav(np.zeros(100, np.int16))
    media = _media_df(spark, [
        ("image", C.encode_png(white), "image/png"),
        ("image", C.encode_bmp(black), "image/bmp"),
        ("audio", wav, "audio/wav"),
        ("image", b"not an image at all, just bytes", "application/octet-stream"),
    ])
    rows = {r.media_id: r for r in M.extract_features(media, dim=8).collect()}
    assert rows[0].format == "png" and rows[0].decoded
    assert rows[0].features[7] == pytest.approx(1.0)       # all-white mass
    assert rows[1].format == "bmp" and rows[1].decoded
    assert rows[1].features[0] == pytest.approx(1.0)       # all-black mass
    assert rows[2].format == "wav" and rows[2].decoded
    assert rows[2].features[4] == pytest.approx(1.0)       # silence → middle bucket
    assert rows[3].format is None and not rows[3].decoded  # honest fallback
    assert abs(sum(rows[3].features) - 1.0) < 0.01         # byte-hist normalized


def test_resize_images_real(spark):
    arr = _rgb(8, 8, seed=7)
    media = _media_df(spark, [
        ("image", C.encode_png(arr), "image/png"),
        ("image", C.encode_bmp(arr), "image/bmp"),
        ("image", b"garbage payload", "application/octet-stream"),
    ])
    rows = {r.media_id: r for r in M.resize_images(media, 4, 4).collect()}
    png_out = C.decode_png(bytes(rows[0].payload))
    assert rows[0].resized and png_out.shape == (4, 4, 3)
    np.testing.assert_array_equal(png_out, C.resize_nearest(arr, 4, 4))
    bmp_out = C.decode_bmp(bytes(rows[1].payload))
    assert rows[1].resized and bmp_out.shape == (4, 4, 3)
    assert not rows[2].resized
    assert bytes(rows[2].payload) == b"garbage payload"    # passthrough, not dropped


def test_decode_media_probe(spark):
    media = _media_df(spark, [
        ("image", C.encode_png(_rgb(6, 9)), "image/png"),
        ("image", _minimal_jpeg(320, 200), "image/jpeg"),
        ("audio", _wav(np.zeros(4000, np.int16), rate=8000), "audio/wav"),
        ("image", b"plain text payload", "text/plain"),
    ])
    rows = {r.media_id: r for r in M.decode_media(media).collect()}
    assert (rows[0].format, rows[0].width, rows[0].height) == ("png", 9, 6)
    assert (rows[1].format, rows[1].width, rows[1].height) == ("jpeg", 320, 200)
    assert rows[2].format == "wav"
    assert rows[2].sample_rate == 8000 and rows[2].duration_ms == 500
    assert rows[3].format is None


def test_frame_sample_plan_duration_driven(spark):
    from pyspark.sql import functions as F

    from apache_flink_essentials_spark.operators.multimodal import (
        documents_as_video,
        frame_sample_plan,
    )

    docs = spark.createDataFrame(
        [(3, "x" * 10), (6, "y" * 62), (7, "skipped")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    plan = frame_sample_plan(documents_as_video(docs), every_ms=1000).collect()
    by_id = {}
    for r in plan:
        by_id.setdefault(r.media_id, []).append(r.sample_ms)
    # doc 3: 10 chars * 40 ms = 400 ms → one sample at 0
    assert sorted(by_id[3]) == [0]
    # doc 6: 62 * 40 = 2480 ms → samples at 0, 1000, 2000
    assert sorted(by_id[6]) == [0, 1000, 2000]
    # doc 7: doc_id % 3 != 0 → not video
    assert 7 not in by_id
