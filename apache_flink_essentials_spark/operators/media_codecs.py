"""Pure-Python media codecs for the multimodal tier (SURVEY §2.10).

No external codec library exists in this container, so these are real,
dependency-free implementations over stdlib + numpy:

- Header probes (format/dimensions/audio params) for PNG, JPEG, GIF, BMP,
  WEBP (VP8/VP8L/VP8X) and WAV — byte-level parsing of the published
  container formats, enough for metadata extraction, partition sizing and
  format routing at scale without touching pixel data.
- A full PNG codec (bit-depth 8; gray / gray+alpha / RGB / RGBA / palette;
  all five scanline filters; our encoder emits filter 0, which the decoder
  unfilters fully vectorized) built on stdlib ``zlib``.
- A 24-bit uncompressed BMP codec.
- 16-bit PCM WAV sample access.
- Nearest-neighbor resize (numpy fancy indexing, no Python pixel loops).

These run inside Arrow-batched pandas UDFs (`multimodal.extract_features`
/ `resize_images`), so per-row cost is the dominant concern: the probes are
O(header bytes); PNG/BMP decode is numpy-vectorized except PNG filters
1/3/4, which require the sequential left-neighbor recurrence the format
defines (our own encoder never emits them).

Reference parity note: the reference repo (Flink DataStream demos) has no
media path at all — this tier is part of the BASELINE.json north-star
surface (multimodal columns for LLM training-data pipelines).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Dimensions above this are treated as parse garbage, not images. Keeps the
# probes safe to run over arbitrary binary columns (a text payload that
# happens to start with 'BM' must not "parse").
_MAX_DIM = 1 << 20

_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _sane(w: int, h: int) -> bool:
    return 0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM


# --- header probes ---------------------------------------------------------

def probe_image(b: bytes) -> tuple[str, int, int] | None:
    """Identify an image payload from its header: (format, width, height).

    Returns None when the bytes are not a recognized image — the probe is
    deliberately strict (magic + structural fields + sane dimensions) so it
    can run over arbitrary binary columns without false positives.
    """
    if len(b) < 10:  # every branch below re-checks its own minimum length
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h) if _sane(w, h) else None
    if b[:2] == b"\xff\xd8":
        dims = _jpeg_dims(b)
        if dims and _sane(*dims):
            return ("jpeg", dims[0], dims[1])
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h) if _sane(w, h) else None
    if b[:2] == b"BM" and len(b) >= 54:
        hdr_size = struct.unpack("<I", b[14:18])[0]
        if hdr_size < 40:  # BITMAPCOREHEADER not supported
            return None
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        if bpp not in (1, 4, 8, 16, 24, 32):
            return None
        return ("bmp", w, abs(h)) if _sane(w, abs(h)) else None
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 16:
        return _webp_dims(b)  # per-fourcc length checks inside
    return None


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn frame header."""
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            return None  # desynchronized — not a valid marker stream
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return (w, h)
        i += 2 + seg_len
    return None


def _webp_dims(b: bytes) -> tuple[str, int, int] | None:
    fourcc = b[12:16]
    if fourcc == b"VP8 " and len(b) >= 30:
        # lossy: 3-byte frame tag, then sync code 9d 01 2a, then 14-bit dims
        if b[23:26] != b"\x9d\x01\x2a":
            return None
        w = struct.unpack("<H", b[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", b[28:30])[0] & 0x3FFF
        return ("webp", w, h) if _sane(w, h) else None
    if fourcc == b"VP8L" and len(b) >= 25:
        if b[20] != 0x2F:
            return None
        bits = struct.unpack("<I", b[21:25])[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return ("webp", w, h) if _sane(w, h) else None
    if fourcc == b"VP8X" and len(b) >= 30:
        w = 1 + int.from_bytes(b[24:27], "little")
        h = 1 + int.from_bytes(b[27:30], "little")
        return ("webp", w, h) if _sane(w, h) else None
    return None


def probe_wav(b: bytes) -> dict | None:
    """Parse a RIFF/WAVE header: sample_rate, channels, bits_per_sample,
    duration_ms, data chunk offset+size. None if not a WAV."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data = None
    n = len(b)
    while i + 8 <= n:
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if tag == b"fmt " and i + 8 + 16 <= n:
            audio_fmt, channels, rate = struct.unpack("<HHI", b[i + 8:i + 16])
            byte_rate = struct.unpack("<I", b[i + 16:i + 20])[0]
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
            fmt = (audio_fmt, channels, rate, byte_rate, bits)
        elif tag == b"data":
            data = (i + 8, size)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt or not data:
        return None
    audio_fmt, channels, rate, byte_rate, bits = fmt
    if audio_fmt != 1 or rate <= 0 or byte_rate <= 0:  # PCM only
        return None
    off, size = data
    size = min(size, n - off)
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "duration_ms": size * 1000 // byte_rate,
        "data_offset": off,
        "data_size": size,
    }


# --- PNG codec -------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    """Decode a PNG to a (H, W, C) uint8 array. Supports bit depth 8, color
    types 0/2/3/4/6 (palette expanded to RGB), interlace 0, all scanline
    filters. Raises ValueError on anything else."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while i + 8 <= len(b):
        length = struct.unpack(">I", b[i:i + 4])[0]
        tag = b[i + 4:i + 8]
        body = b[i + 8:i + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length  # length + tag + body + crc
    if width is None or not idat:
        raise ValueError("truncated PNG")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = _png_unfilter(np.frombuffer(raw, np.uint8), height, stride, ch)
    out = arr.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        out = palette[out[:, :, 0]]
    return out


def _png_unfilter(raw: np.ndarray, h: int, stride: int, ch: int) -> np.ndarray:
    """Undo PNG scanline filtering. Filters 0 (none) and 2 (up) are fully
    vectorized; 1/3/4 (sub/average/paeth) carry the format's sequential
    left-pixel recurrence and fall back to a per-byte loop."""
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = filters[y]
        row = data[y]
        prev = out[y - 1] if y > 0 else zero
        if ft == 0:
            out[y] = row
        elif ft == 2:
            out[y] = row + prev  # uint8 wraparound == mod-256 per spec
        elif ft in (1, 3, 4):
            res = out[y]
            for x in range(stride):
                a = int(res[x - ch]) if x >= ch else 0
                if ft == 1:
                    v = row[x] + a
                elif ft == 3:
                    v = row[x] + ((a + int(prev[x])) >> 1)
                else:
                    bb = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                    v = row[x] + pred
                res[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
    return out


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as PNG (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    raw = np.empty((h, w * ch + 1), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
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


# --- BMP codec (24-bit uncompressed) --------------------------------------

def decode_bmp(b: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) uint8 RGB."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    if not _sane(w, h):
        raise ValueError("bad BMP dimensions")
    row_size = (w * 3 + 3) & ~3
    need = data_off + row_size * h
    if len(b) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(b, np.uint8, row_size * h, data_off).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a bottom-up 24-bit uncompressed BMP."""
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("BMP encoder takes RGB")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


# --- WAV PCM access --------------------------------------------------------

def decode_wav_samples(b: bytes) -> tuple[np.ndarray, int]:
    """Return (samples int16 array [n, channels], sample_rate) for a 16-bit
    PCM WAV. Raises ValueError otherwise."""
    info = probe_wav(b)
    if info is None or info["bits_per_sample"] != 16:
        raise ValueError("not a 16-bit PCM WAV")
    off, size = info["data_offset"], info["data_size"]
    size -= size % (2 * info["channels"])
    samples = np.frombuffer(b, np.int16, size // 2, off)
    return samples.reshape(-1, info["channels"]), info["sample_rate"]


# --- resize ----------------------------------------------------------------

def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via fancy indexing (no Python pixel loops)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]
