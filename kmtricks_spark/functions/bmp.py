"""Minimal real media codecs, pure numpy — no external libraries.

* BMP (Windows V3, 24bpp uncompressed): full encode/decode of the
  standard on-disk format — 14-byte BITMAPFILEHEADER + 40-byte
  BITMAPINFOHEADER, BGR pixel order, rows bottom-up, 4-byte row padding.
  Any BMP written by other tools with these settings decodes here and
  vice versa.
* bilinear resize over (h, w, 3) uint8 arrays, vectorized.
* PCM16 mono audio: encode/decode raw little-endian int16.
* FRMS container for synthetic video: 'FRMS' + u32 frame count +
  per-frame u32 length + BMP bytes (our own documented test container —
  real videos need codec libs, see operators/multimodal.py).

These exist so the multimodal pipeline stages compute real decode /
resize / feature math in this container; swap in PIL/ffmpeg codecs for
JPEG/MP4 in production — the Spark plumbing is format-agnostic.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res, res, pixel offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp uncompressed BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # BGR, bottom-up
    rows = img[::-1, :, ::-1].reshape(h, w * 3)
    if pad:
        rows = np.concatenate([rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    pixels = rows.tobytes()
    off = _FILE_HDR.size + _INFO_HDR.size
    file_hdr = _FILE_HDR.pack(b"BM", off + len(pixels), 0, 0, off)
    info_hdr = _INFO_HDR.pack(40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + pixels


def decode_bmp(buf: bytes) -> np.ndarray:
    """24bpp uncompressed BMP bytes -> (h, w, 3) uint8 RGB.

    Handles bottom-up (positive height) and top-down (negative height)
    row orders; rejects compressed or non-24bpp files explicitly."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    _, _, _, _, off = _FILE_HDR.unpack_from(buf, 0)
    hdr_size, w, h, _, bpp, comp = _INFO_HDR.unpack_from(buf, _FILE_HDR.size)[:6]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP (got {bpp}bpp comp={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, dtype=np.uint8, count=h * row_bytes, offset=off)
    rows = data.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample of (h, w, c) uint8, align-corners=False (the
    OpenCV/PIL convention: sample at pixel centers)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def encode_pcm16(samples: np.ndarray) -> bytes:
    """float in [-1, 1] (or int16) mono -> raw little-endian int16 bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    return samples.astype("<i2").tobytes()


def decode_pcm16(buf: bytes) -> np.ndarray:
    """raw little-endian int16 mono -> float64 in [-1, 1]."""
    return np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0


FRMS_MAGIC = b"FRMS"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """FRMS container: concatenated BMP frames, length-prefixed."""
    parts = [FRMS_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_bmp(f)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def frame_count(buf: bytes) -> int:
    if buf[:4] != FRMS_MAGIC:
        raise ValueError("not an FRMS container")
    return struct.unpack_from("<I", buf, 4)[0]


def decode_frame(buf: bytes, index: int) -> np.ndarray:
    """Decode frame `index` without materializing the others."""
    n = frame_count(buf)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} of {n}")
    off = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        if i == index:
            return decode_bmp(buf[off : off + ln])
        off += ln
    raise AssertionError("unreachable")
