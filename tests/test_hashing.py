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


def test_hash_array_categorize_nul_quirk_pinned():
    """pandas hash_array's default categorize=True path corrupts hashes of
    strings with EMBEDDED NUL bytes (the same string hashes differently
    depending on the containing array; distinct strings collide), while
    for NUL-free strings it is value-identical to the stable
    categorize=False path.  Pinned because every partition-routing hash
    in the engine relies on cross-array element stability
    (_editdist_key_hash hashes key parts separately with
    categorize=False for exactly this reason)."""
    import numpy as np
    import pandas as pd

    vals = np.asarray(
        [f"k{i % 37} word {i % 11}" for i in range(1000)], dtype=object
    )
    assert (
        pd.util.hash_array(vals)
        == pd.util.hash_array(vals, categorize=False)
    ).all()
    nul = np.asarray([f"a{i % 5}\x00b{i % 97}" for i in range(1000)], dtype=object)
    stable = pd.util.hash_array(nul, categorize=False)
    assert (
        np.concatenate(
            [
                pd.util.hash_array(nul[:300], categorize=False),
                pd.util.hash_array(nul[300:], categorize=False),
            ]
        )
        == stable
    ).all()


def test_editdist_key_hash_context_independent():
    from layout_analysis_ray.functions.dedup import _editdist_key_hash
    import numpy as np

    langs = [f"l{i % 7}" for i in range(500)]
    pfxs = [f"prefix {i % 43}\x00x" for i in range(500)]  # NULs allowed in text
    full = _editdist_key_hash(langs, pfxs)
    parts = np.concatenate(
        [
            _editdist_key_hash(langs[:123], pfxs[:123]),
            _editdist_key_hash(langs[123:], pfxs[123:]),
        ]
    )
    assert (full == parts).all()
    # no separator aliasing: ("ab", "c...") != ("a", "bc...")
    a = _editdist_key_hash(["ab"], ["cdefghij"])
    b = _editdist_key_hash(["a"], ["bcdefghij"])
    assert a[0] != b[0]


def test_banded_edit_distances_exact_vs_reference():
    """The vectorized banded DP must equal a classic full DP (clamped at
    k+1) over byte strings — fuzzed, including unicode multi-byte and
    empty strings."""
    import random

    import numpy as np

    from layout_analysis_ray.functions.dedup import banded_edit_distances

    def ref_lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j - 1] + (ca != cb), prev[j] + 1, cur[-1] + 1)
                )
            prev = cur
        return prev[-1]

    rng = random.Random(11)
    alpha = "ab cdé日"
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
        b = list(a)
        for _ in range(rng.randint(0, 12)):
            op = rng.choice(["i", "d", "s"])
            if op == "i" or not b:
                b.insert(rng.randint(0, len(b)), rng.choice(alpha))
            elif op == "d":
                b.pop(rng.randrange(len(b)))
            else:
                b[rng.randrange(len(b))] = rng.choice(alpha)
        pairs.append((a, "".join(b)))
    pairs += [("", ""), ("", "abc"), ("samesame", "samesame")]
    for k in (3, 8):
        got = banded_edit_distances([p[0] for p in pairs], [p[1] for p in pairs], k)
        want = np.array(
            [
                min(ref_lev(a.encode(), b.encode()), k + 1)
                for a, b in pairs
            ],
            dtype=np.int64,
        )
        assert (got == want).all()
