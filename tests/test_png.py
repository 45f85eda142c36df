"""Pure-Python PNG codec gates: roundtrip, every filter type against a
naive per-pixel reference, color-to-luma reduction, malformed-payload
quarantine, and cross-codec equality with the RAW8 demo path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from layout_analysis_ray.functions.png import (
    _SIG,
    _chunk,
    decode_png_gray,
    encode_png_gray,
)


def _plane(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _png_from_filtered(w, h, ctype, bpp, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _naive_filter(plane3, ft_by_row):
    """Reference FORWARD filter (per-pixel, straight from the spec) so the
    decoder's unfilter is pinned against independent math."""
    h, w, bpp = plane3.shape
    flat = plane3.reshape(h, w * bpp).astype(np.int32)
    out = b""
    for y in range(h):
        ft = ft_by_row[y]
        row = bytearray()
        for x in range(w * bpp):
            cur = int(flat[y, x])
            left = int(flat[y, x - bpp]) if x >= bpp else 0
            up = int(flat[y - 1, x]) if y > 0 else 0
            ul = int(flat[y - 1, x - bpp]) if (y > 0 and x >= bpp) else 0
            if ft == 0:
                v = cur
            elif ft == 1:
                v = cur - left
            elif ft == 2:
                v = cur - up
            elif ft == 3:
                v = cur - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa_ <= pb_ and pa_ <= pc_)
                    else (up if pb_ <= pc_ else ul)
                )
                v = cur - pred
            row.append(v % 256)
        out += bytes([ft]) + bytes(row)
    return out


def test_roundtrip_encoder_filters():
    for h, w in [(1, 1), (3, 5), (17, 23), (64, 48)]:
        p = _plane(h, w, seed=h * 100 + w)
        assert np.array_equal(decode_png_gray(encode_png_gray(p)), p)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_every_filter_type_vs_naive_reference(ft):
    p = _plane(9, 13, seed=ft)[..., None]
    png = _png_from_filtered(13, 9, 0, 1, _naive_filter(p, [ft] * 9))
    assert np.array_equal(decode_png_gray(png), p[:, :, 0])


def test_mixed_filters_multichannel_luma():
    rng = np.random.default_rng(11)
    for ctype, bpp in [(2, 3), (4, 2), (6, 4)]:
        px = rng.integers(0, 256, size=(6, 7, bpp), dtype=np.uint8)
        fts = [rng.integers(0, 5) for _ in range(6)]
        png = _png_from_filtered(7, 6, ctype, bpp, _naive_filter(px, fts))
        got = decode_png_gray(png)
        if ctype == 4:
            want = px[:, :, 0]
        else:
            rgb = px[:, :, :3].astype(np.int64)
            want = (
                (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114)
                // 1000
            ).astype(np.uint8)
        assert np.array_equal(got, want)


def test_malformed_payloads_raise_value_error():
    good = encode_png_gray(_plane(5, 5))
    cases = [
        b"not a png at all",
        good[:8],  # signature only
        good[:-4],  # truncated
        good[:20] + bytes([good[20] ^ 0xFF]) + good[21:],  # CRC break
    ]
    # interlaced header (Adam7) with a valid CRC
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    cases.append(_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b""))
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    cases.append(_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b""))
    for c in cases:
        with pytest.raises(ValueError):
            decode_png_gray(c)


def test_png_decoder_matches_raw8_demo_path():
    """encode_png_payloads compresses the SAME plane the RAW8 payload
    carries, so the 32 resampled bytes — and therefore the embeddings —
    are identical across codecs; only n_frames differs (PNG is 1)."""
    from layout_analysis_ray.stages.media import (
        demo_bytes_decoder,
        encode_demo_payloads,
        encode_png_payloads,
        png_bytes_decoder,
    )

    refs = [f"media://doc{i}/0" for i in range(6)]
    raw_a, meta_a = demo_bytes_decoder(encode_demo_payloads(refs))
    raw_b, meta_b = png_bytes_decoder(encode_png_payloads(refs))
    assert np.array_equal(raw_a, raw_b)
    assert np.array_equal(meta_a[:, :2], meta_b[:, :2])
    assert (meta_b[:, 2] == 1).all()


def test_featurizer_quarantines_corrupt_png():
    from layout_analysis_ray.stages.media import (
        MediaFeaturizer,
        encode_png_payloads,
        png_bytes_decoder,
    )

    refs = ["media://a/0", "media://b/0", "media://c/0"]
    payloads = encode_png_payloads(refs)
    payloads[1] = payloads[1][:30]  # truncated mid-chunk
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "media_ref": pa.array(refs),
            "media_bytes": pa.array(payloads, pa.binary()),
        }
    )
    out = MediaFeaturizer(decoder=png_bytes_decoder, source_col="media_bytes")(
        batch
    )
    assert out.column("decode_mode").to_pylist() == ["real", "error", "real"]
    assert out.column("width").to_pylist()[1] == -1
