"""Guards on the raw-signature binary column kernels: the single-buffer
builder must fail LOUDLY past int32 offset range (silent wrap would
corrupt every downstream pair), and the hand-parsed explode must handle
empty blocks and reject non-binary() layouts."""

import numpy as np
import pyarrow as pa
import pytest

from layout_analysis_ray.functions import dedup
from layout_analysis_ray.functions.dedup import (
    MINHASH_PERMS,
    _sig_binary_array,
    band_rows_from_sigs,
    bands_from_sig_column,
)


def _sigs(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**40, size=(n, MINHASH_PERMS), dtype=np.int64)


def test_sig_column_roundtrip_matches_direct_bands():
    ids = np.arange(100, 117, dtype=np.int64)
    sigs = _sigs(len(ids))
    tbl = pa.table({"doc_id": pa.array(ids), "sig": _sig_binary_array(sigs)})
    got = bands_from_sig_column(tbl)
    want = band_rows_from_sigs(ids, sigs)
    assert got.equals(want)


def test_sig_column_roundtrip_survives_slice_offset():
    # a sliced Arrow array has a non-zero .offset — the buffer parse must
    # honor it
    ids = np.arange(50, dtype=np.int64)
    sigs = _sigs(len(ids), seed=11)
    tbl = pa.table({"doc_id": pa.array(ids), "sig": _sig_binary_array(sigs)})
    got = bands_from_sig_column(tbl.slice(10, 20))
    want = band_rows_from_sigs(ids[10:30], sigs[10:30])
    assert got.equals(want)


def test_bands_from_empty_block():
    tbl = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "sig": pa.array([], pa.binary()),
        }
    )
    out = bands_from_sig_column(tbl)
    assert out.num_rows == 0
    assert out.column_names == ["part", "band_key", "doc_id", "sig"]


def test_bands_rejects_large_binary_sig():
    ids = np.arange(3, dtype=np.int64)
    sigs = _sigs(3)
    sig_col = _sig_binary_array(sigs).cast(pa.large_binary())
    tbl = pa.table({"doc_id": pa.array(ids), "sig": sig_col})
    with pytest.raises(TypeError, match="binary"):
        bands_from_sig_column(tbl)


def test_sig_binary_array_overflow_is_loud(monkeypatch):
    # shrink the batch that trips the 2 GiB offset ceiling by inflating
    # the per-row width instead of allocating 4M real rows
    monkeypatch.setattr(dedup, "MINHASH_PERMS", 2**28)
    with pytest.raises(ValueError, match="too large"):
        _sig_binary_array(np.zeros((8, 4), dtype=np.int64))
