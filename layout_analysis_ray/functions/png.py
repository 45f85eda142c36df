"""Pure-Python/numpy PNG codec (stdlib ``zlib`` only — no image libraries).

Exists so the media stage's REAL-decode branch can run actual compressed
image bytes end to end in this sandbox (VERDICT r4 item 5): the
reference's core input is an image-file read feeding the extractor
(``/root/reference/src/DocumentAnalyzer.py:105-109``); here the decode is
an injectable kernel for the ``MediaFeaturizer`` actor pool.

Decoder scope (spec: the W3C PNG recommendation, public knowledge):
non-interlaced, 8-bit-per-sample images of color type 0 (grayscale),
2 (RGB), 4 (gray+alpha), 6 (RGBA), reduced to one grayscale plane
(integer ITU-R 601 luma for color).  Palette, 16-bit and Adam7 inputs
raise ``ValueError`` — upstream the actor quarantines that row instead of
failing the task.  Chunk CRCs are verified, so corrupted payloads also
land in quarantine rather than producing silent garbage pixels.

The encoder writes 8-bit grayscale with a deterministic per-row filter
cycle (None/Sub/Up) so fixture roundtrips exercise the unfilter paths the
encoder's own output would otherwise never contain; filters 3/4 are
pinned against a naive per-pixel reference in tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(plane: np.ndarray) -> bytes:
    """8-bit grayscale PNG bytes for a uint8 [h, w] plane.  Rows cycle
    filters None/Sub/Up (y % 3) so decoding the encoder's own output
    exercises three of the five unfilter paths."""
    plane = np.ascontiguousarray(plane, dtype=np.uint8)
    h, w = plane.shape
    rows = []
    for y in range(h):
        ft = y % 3
        row = plane[y].astype(np.int16)
        if ft == 1:  # Sub: raw[x] = cur[x] - cur[x-1]
            filt = np.empty(w, np.int16)
            filt[0] = row[0]
            filt[1:] = row[1:] - row[:-1]
        elif ft == 2 and y > 0:  # Up: raw[x] = cur[x] - prior[x]
            filt = row - plane[y - 1].astype(np.int16)
        else:
            ft = 0
            filt = row
        rows.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering: ``data`` is the decompressed byte
    stream (filter byte + w*bpp bytes per row); returns uint8 [h, w*bpp].

    Sub is a per-channel modular cumsum (vectorized); Average/Paeth have
    a true left-to-right dependency and fall back to a per-pixel loop —
    only rows that actually use those filters pay for it."""
    stride = w * bpp
    if len(data) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel stream length {len(data)} != expected {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = int(data[pos])
        row = data[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:
            # recon[x] = raw[x] + recon[x-bpp]: modular cumsum per channel
            cur = (
                np.cumsum(row.reshape(w, bpp), axis=0, dtype=np.int64) % 256
            ).reshape(stride).astype(np.int32)
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft == 3:
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (row[x] + ((left + prev[x]) >> 1)) % 256
        elif ft == 4:
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png_gray(payload: bytes) -> np.ndarray:
    """PNG bytes -> grayscale uint8 [h, w] plane.  Raises ``ValueError``
    on anything malformed or out of scope (bad signature/CRC, palette,
    16-bit, interlaced, truncated stream) — the quarantine contract."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            seen_iend = True
            break
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth {depth}, color type {ctype})")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    px = _unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    if ctype == 0:
        return px[:, :, 0]
    if ctype == 4:  # gray + alpha: keep the gray channel
        return px[:, :, 0]
    # RGB(A): integer ITU-R 601 luma
    rgb = px[:, :, :3].astype(np.int64)
    return (
        (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    ).astype(np.uint8)
