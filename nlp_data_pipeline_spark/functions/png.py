"""Minimal pure-stdlib PNG decoder (zlib inflate + scanline unfilter).

Replaces the "no image libs in this container" stub for the one format
the standard library can fully decode: PNG's pixel model is zlib
(stdlib) + five per-scanline difference filters (pure arithmetic,
PNG spec RFC 2083 §6). Supported: 8-bit depth, color types 0 (gray),
2 (RGB), 6 (RGBA), non-interlaced — exactly what the committed
fixtures (tools/make_png_fixtures.py) and typical ML thumbnail shards
use. Anything else raises ValueError and the caller degrades to
metadata-only, the same honest posture the stub had.

This is DELIBERATELY per-payload Python: it runs inside Arrow-batched
``mapInPandas`` kernels (operators/multimodal.py), the sanctioned slow
path for opaque binary decode — the same place PIL/ffmpeg would sit on
a production cluster. Numpy is used for the unfilter inner loop so the
per-row cost is vectorized over the row's bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """payload -> (width, height, channels, uint8 array [h, w, channels])."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); 8-bit gray/RGB/RGBA non-interlaced only"
        )
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint16)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        cur = line.astype(np.uint16)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential in pixel units, vector over channels
            cur = cur.reshape(width, bpp)
            for x in range(1, width):
                cur[x] = (cur[x] + cur[x - 1]) & 0xFF
            cur = cur.reshape(stride)
        elif ftype == 2:  # Up
            cur = (cur + prior) & 0xFF
        elif ftype == 3:  # Average
            pr = prior.reshape(width, bpp)
            cur = cur.reshape(width, bpp)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(width):
                cur[x] = (cur[x] + ((left + pr[x]) >> 1)) & 0xFF
                left = cur[x]
            cur = cur.reshape(stride)
        elif ftype == 4:  # Paeth
            pr = prior.reshape(width, bpp).astype(np.int32)
            cur = cur.reshape(width, bpp).astype(np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(width):
                p = left + pr[x] - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - pr[x]),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pr[x], upleft)
                )
                cur[x] = (cur[x] + pred) & 0xFF
                left, upleft = cur[x], pr[x].copy()
            cur = cur.reshape(stride).astype(np.uint16)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prior = cur.astype(np.uint16)
    return width, height, channels, out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """uint8 [h, w, channels] -> PNG bytes. `filters[y]` picks each row's
    filter (default 0); used by the fixture generator to exercise every
    unfilter path with known pixel content."""
    arr = np.asarray(pixels, dtype=np.uint8)
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels
    flat = arr.reshape(height, width * channels).astype(np.int32)
    lines = bytearray()
    zero = np.zeros(width * channels, dtype=np.int32)
    for y in range(height):
        f = filters[y] if filters else 0
        cur = flat[y]
        pri = flat[y - 1] if y else zero
        a = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        c = np.concatenate([np.zeros(bpp, dtype=np.int32), pri[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - a
        elif f == 2:
            enc = cur - pri
        elif f == 3:
            enc = cur - ((a + pri) >> 1)
        elif f == 4:
            p = a + pri - c
            pa, pb, pc = np.abs(p - a), np.abs(p - pri), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, pri, c))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(f)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + chunk(b"IEND", b"")
    )
