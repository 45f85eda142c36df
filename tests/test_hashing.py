"""The vectorized md5 kernels (functions/hashing.py) are convention-
critical: every sampling/dedup/packing oracle pins their exact output.
These tests pin (a) known digests, (b) DuckDB-path == hashlib-fallback
equality, (c) NULL/empty/unicode handling, (d) order preservation on
batches large enough to exercise DuckDB's parallel scan."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from layout_analysis_ray.functions import hashing as H


def test_md5_hex_known_values():
    got = H.md5_hex(pa.array(["", "abc", None, "héllo"])).to_pylist()
    assert got == [
        hashlib.md5(b"").hexdigest(),
        hashlib.md5(b"abc").hexdigest(),
        hashlib.md5(b"").hexdigest(),  # NULL hashes as ''
        hashlib.md5("héllo".encode()).hexdigest(),
    ]


def test_md5_hex_matches_fallback_large():
    rng = np.random.default_rng(7)
    vals = [
        "x" * int(n) + str(i) for i, n in enumerate(rng.integers(0, 300, 5000))
    ]
    vals[100] = None
    col = pa.array(vals, pa.string())
    fast = H.md5_hex(col).to_pylist()
    slow = H._md5_hex_fallback(H._as_string_array(col)).to_pylist()
    assert fast == slow


def test_md5_hex_chunked_and_large_string():
    chunked = pa.chunked_array([["a", "b"], ["c"]])
    assert H.md5_hex(chunked).to_pylist() == [
        hashlib.md5(x).hexdigest() for x in (b"a", b"b", b"c")
    ]
    ls = pa.array(["abc", ""], pa.large_string())
    assert H._md5_hex_fallback(H._as_string_array(ls)).to_pylist() == [
        hashlib.md5(b"abc").hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]


def test_id_kernels_match_reference_loop():
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 2**40, 4000).astype(np.int64)
    hexes = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
    assert H.md5_hex_of_ids(ids).to_pylist() == hexes
    np.testing.assert_array_equal(
        H.id_bucket_digit(ids), np.array([int(h[0], 16) for h in hexes])
    )
    np.testing.assert_array_equal(
        H.id_hash_u32(ids), np.array([int(h[:8], 16) for h in hexes])
    )


def test_id_kernels_duckdb_vs_fallback():
    if H._duckdb is None:
        pytest.skip("duckdb unavailable")
    ids = np.arange(0, 2500, dtype=np.int64)
    try:
        H._duckdb_saved = H._duckdb
        H._duckdb = None
        slow_digit = H.id_bucket_digit(ids)
        slow_u32 = H.id_hash_u32(ids)
        slow_hex = H.md5_hex_of_ids(ids).to_pylist()
    finally:
        H._duckdb = H._duckdb_saved
    np.testing.assert_array_equal(H.id_bucket_digit(ids), slow_digit)
    np.testing.assert_array_equal(H.id_hash_u32(ids), slow_u32)
    assert H.md5_hex_of_ids(ids).to_pylist() == slow_hex


def test_str_hash_u60_duckdb_vs_fallback_and_known():
    import hashlib

    strs = ["", "a", "the quick fox", "émoji ☃", "x" * 500] + [
        f"tok{i} tok{i+1} tok{i+2}" for i in range(200)
    ]
    got = H.str_hash_u60(strs)
    # definition: int of the first 15 hex chars of md5 == top 60 bits
    want = np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in strs],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(got, want)
    if H._duckdb is None:
        pytest.skip("duckdb unavailable")
    try:
        H._duckdb_saved = H._duckdb
        H._duckdb = None
        slow = H.str_hash_u60(strs)
    finally:
        H._duckdb = H._duckdb_saved
    np.testing.assert_array_equal(got, slow)
