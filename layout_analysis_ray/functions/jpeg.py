"""Pure-Python/numpy baseline JPEG codec (no image libraries).

Closes the last input-format gap of the reference's image read path
(``/root/reference/src/DocumentAnalyzer.py:105-109`` and the S2 extension
filter ``.jpg/.jpeg/.png``, ``src/detect_paragraphs.py:26``): with
``functions/png.py`` this makes both reference formats decodable
in-sandbox, so the media stage's real-decode branch runs actual
entropy-coded image bytes end to end.

Spec scope (ITU-T T.81 baseline sequential DCT, public knowledge):

- decoder: baseline (SOF0), 8-bit, grayscale or YCbCr with any standard
  sampling factors; Huffman entropy decode with byte stuffing and
  restart markers; dequantize -> de-zigzag -> vectorized 8x8 IDCT (one
  einsum over ALL blocks of a component, not per-block loops) -> level
  shift.  Returns the LUMA plane only (the media stage wants grayscale):
  chroma coefficients are entropy-decoded to keep the bitstream in sync
  but never IDCT'd.  Progressive (SOF2), 12-bit, and arithmetic coding
  raise ``ValueError`` — the upstream actor quarantines that row.
- encoder: baseline grayscale, quality-scaled Annex-K luminance quant
  table, Annex-K standard Huffman tables, optional restart interval.
  Exists so fixtures are real entropy-coded JPEG bytes; decode(encode(p))
  is pinned against the separate float reference in tests.

IDCT exactness: the decoder's IDCT is float64 cosine basis followed by
round-half-away (matching the reference C implementations closely enough
that encode->decode roundtrip error is bounded by quantization, which the
tests assert), and every decode is deterministic bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 luminance quantization table (quality 50 base)
_QTAB_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# zigzag scan order: _ZIGZAG[k] = raster index of the k-th zigzag coeff
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# float64 8x8 IDCT basis: basis[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_IDCT_1D = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_decode_table(bits, vals):
    """(length, code) -> symbol dict, canonical Huffman (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops at any non-stuffing marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._bitbuf = 0
        self._nbits = 0
        self.marker = None  # set when a marker interrupts the stream

    def _fill(self) -> bool:
        d = self._d
        if self._pos >= len(d):
            return False
        b = d[self._pos]
        if b == 0xFF:
            if self._pos + 1 >= len(d):
                return False
            nxt = d[self._pos + 1]
            if nxt == 0x00:
                self._pos += 2  # stuffed 0xFF data byte
            else:
                self.marker = nxt  # a real marker: stop
                return False
        else:
            self._pos += 1
        self._bitbuf = (self._bitbuf << 8) | b
        self._nbits += 8
        return True

    def read_bit(self) -> int:
        if self._nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        self._nbits -= 1
        return (self._bitbuf >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_to_marker(self) -> int | None:
        """Drop buffered bits and return the marker byte after 0xFF."""
        self._bitbuf = 0
        self._nbits = 0
        d = self._d
        while self._pos + 1 < len(d):
            if d[self._pos] == 0xFF and d[self._pos + 1] != 0x00:
                m = d[self._pos + 1]
                self._pos += 2
                return m
            self._pos += 1
        return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> luma uint8 [h, w] plane.  Raises
    ``ValueError`` on progressive/12-bit/arithmetic/malformed input (the
    quarantine contract).  Chroma components are entropy-decoded (the
    bitstream interleaves them) but never inverse-transformed."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htabs[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) unsupported"
            )
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtabs, htabs,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, qtabs, htabs, restart_interval):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    by_id = {c[0]: c for c in comps}
    # luma = the first frame component (grayscale: the only one)
    luma_id = comps[0][0]
    plan = []  # per scan component: (comp, dc table, ac table, n blocks/mcu)
    for cs, td, ta in scan:
        cid, ch, cv, tq = by_id[cs]
        dc = htabs.get((0, td))
        ac = htabs.get((1, ta))
        if dc is None or ac is None:
            raise ValueError("missing JPEG Huffman table")
        plan.append(((cid, ch, cv, tq), dc, ac))
    reader = _BitReader(payload, pos)
    # collect luma coefficient blocks; chroma blocks decode-and-drop
    _, lh, lv, ltq = by_id[luma_id]
    if ltq not in qtabs:
        raise ValueError("missing JPEG quant table")
    n_luma_blocks = mcus_x * mcus_y * lh * lv
    luma_coef = np.zeros((n_luma_blocks, 64), dtype=np.int64)
    li = 0
    preds = {c[0]: 0 for c in comps}
    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.sync_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                preds = {c[0]: 0 for c in comps}
            mcu_count += 1
            for (cid, ch, cv, _tq), dc, ac in plan:
                for _b in range(ch * cv):
                    blk = _decode_block(reader, dc, ac, preds, cid)
                    if cid == luma_id:
                        luma_coef[li] = blk
                        li += 1
    # dequantize + de-zigzag + one vectorized IDCT over all luma blocks
    q = qtabs[ltq]
    deq = luma_coef * q[None, :]
    raster = np.zeros((n_luma_blocks, 64), dtype=np.float64)
    raster[:, _ZIGZAG] = deq
    blocks = raster.reshape(-1, 8, 8)
    # 2-D IDCT: basis.T @ B @ basis for every block in one einsum
    px = np.einsum("ux,nuv,vy->nxy", _IDCT_1D, blocks, _IDCT_1D)
    px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
    # assemble the luma plane from MCU-ordered blocks
    bw = mcus_x * lh  # blocks per row
    plane = (
        px.reshape(mcus_y, mcus_x, lv, lh, 8, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(mcus_y * lv * 8, bw * 8)
    )
    # luma plane covers ceil to MCU multiples of the SCALED dims
    ly = (h * lv + vmax - 1) // vmax
    lx = (w * lh + hmax - 1) // hmax
    return np.ascontiguousarray(plane[:ly, :lx])


def _decode_block(reader, dc_table, ac_table, preds, cid):
    blk = np.zeros(64, dtype=np.int64)
    t = reader.decode_symbol(dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    preds[cid] += diff
    blk[0] = preds[cid]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# encoder (baseline grayscale)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self._out.append(b)
            if b == 0xFF:
                self._out.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1 bits

    def emit_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self._out += bytes([0xFF, marker])  # markers are never stuffed

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self._out)


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K luminance table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QTAB_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit magnitude code)."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg_gray(
    plane: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """uint8 [h, w] -> baseline grayscale JPEG (Annex-K Huffman tables).
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs (one MCU == one block for grayscale) — fixtures with
    restarts pin the decoder's resync path."""
    plane = np.ascontiguousarray(plane, dtype=np.uint8)
    h, w = plane.shape
    if h == 0 or w == 0:
        raise ValueError("zero-dimension plane")
    q = _quant_table(quality)
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((by * 8, bx * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    # forward DCT = basis @ B @ basis.T (the IDCT basis is orthonormal)
    coef = np.einsum("ux,nxy,vy->nuv", _IDCT_1D, blocks, _IDCT_1D)
    zz = coef.reshape(-1, 64)[:, _ZIGZAG]
    qz = np.round(zz / q[None, :]).astype(np.int64)

    dc_enc = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_enc = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    wtr = _BitWriter()
    pred = 0
    for i, blk in enumerate(qz):
        if restart_interval and i and i % restart_interval == 0:
            wtr.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            pred = 0
        t, mag = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        c, ln = dc_enc[t]
        wtr.write(c, ln)
        if t:
            wtr.write(mag, t)
        nz = np.nonzero(blk[1:])[0]
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run > 15:
                c, ln = ac_enc[0xF0]  # ZRL
                wtr.write(c, ln)
                run -= 16
            t, mag = _magnitude(int(blk[pos]))
            c, ln = ac_enc[(run << 4) | t]
            wtr.write(c, ln)
            wtr.write(mag, t)
            k = pos + 1
        if k < 64:
            c, ln = ac_enc[0x00]  # EOB
            wtr.write(c, ln)
    data = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(q.astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS),
    )
    out += seg(
        0xC4,
        bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += data
    out += b"\xff\xd9"
    return out
