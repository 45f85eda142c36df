"""The vectorized shingle/minhash/fingerprint kernels must be bit-identical
to the per-document reference path — every minhash golden and the
doc_fingerprint SQL oracle pin their values."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from layout_analysis_ray.functions.dedup import (
    MINHASH_PERMS,
    MINHASH_PRIME,
    _A,
    _B,
    _shingle_ints,
    _shingles,
    minhash_sigs_col,
)
from layout_analysis_ray.functions.text import fingerprint_batch, flat_shingles

EDGE_TEXTS = [
    None,
    "",
    "   ",
    "one",
    "two tokens",
    "exactly three tokens",
    "a b c d e f",
    "Punct!! and CAPS, plus 123 numbers...",
    "héllo wörld three tokens here",  # non-ascii folds to token splits
    "dup dup dup dup",  # duplicate shingles
    "x",
]


def _ref_sig(text):
    """Per-doc reference: distinct shingle ints -> min over perms."""
    x = _shingle_ints(text or "")
    if not x.size:
        return np.full(MINHASH_PERMS, MINHASH_PRIME, dtype=np.int64)
    return ((x[None, :] * _A[:, None] + _B[:, None]) % MINHASH_PRIME).min(
        axis=1
    )


def test_flat_shingles_multiset_equals_reference():
    col = pa.array(EDGE_TEXTS, pa.string())
    seg, sh, ntok = flat_shingles(col)
    per_row = {}
    for s, v in zip(seg, sh.to_pylist()):
        per_row.setdefault(int(s), []).append(v)
    for i, t in enumerate(EDGE_TEXTS):
        assert sorted(per_row.get(i, [])) == sorted(_shingles(t or "")), i
    # token counts drive the n_shingles contract
    # "héllo wörld ..." tokenizes as h/llo/w/rld/three/tokens/here (7): the
    # [a-z0-9]+ tokenizer splits at non-ascii letters
    assert ntok.tolist() == [0, 0, 0, 1, 2, 3, 6, 6, 7, 4, 1]


def test_minhash_sigs_col_equals_per_doc_reference():
    col = pa.array(EDGE_TEXTS, pa.string())
    got = minhash_sigs_col(col)
    for i, t in enumerate(EDGE_TEXTS):
        np.testing.assert_array_equal(got[i], _ref_sig(t), err_msg=str(i))


def test_minhash_sigs_col_on_real_docs():
    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    col = tbl["text"].combine_chunks().slice(0, 120)
    got = minhash_sigs_col(col)
    for i, t in enumerate(col.to_pylist()):
        np.testing.assert_array_equal(got[i], _ref_sig(t), err_msg=str(i))


def test_fingerprint_batch_equals_per_doc_reference():
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
            "text": pa.array(EDGE_TEXTS, pa.string()),
        }
    )
    got = fingerprint_batch(batch).to_pandas()
    for i, t in enumerate(EDGE_TEXTS):
        sh = _shingles(t or "")
        if not sh:
            want_fp = hashlib.md5(b"").hexdigest()
        else:
            want_fp = min(hashlib.md5(s.encode()).hexdigest() for s in sh)
        row = got[got["doc_id"] == i].iloc[0]
        assert row["fingerprint"] == want_fp, (i, t)


def test_fingerprint_n_shingles_contract():
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
            "text": pa.array(EDGE_TEXTS, pa.string()),
        }
    )
    got = fingerprint_batch(batch).to_pandas().sort_values("doc_id")
    # old contract: n_shingles = n_tokens - 2 for >=3 tokens, else 0
    assert got["n_shingles"].tolist() == [0, 0, 0, 0, 0, 1, 4, 4, 5, 2, 0]
