"""Packed coordinates must be invariant to the engine-internal
subpartition count: `sub` is monotone in doc_id within a part, so the
two-level offset stitch reproduces the part-wide cumsum exactly for any
nsub.  This is the contract that lets 10^10 docs pack as thousands of
bounded kernels instead of 16 huge sorts."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("nsub", [5, 64, 4096])
def test_pack_sequences_subpart_invariant(ray_session, nsub):
    from layout_analysis_ray.pipelines.corpus import pack_sequences

    base = _sorted(pack_sequences(SF, n_subparts=1).to_pandas())
    got = _sorted(pack_sequences(SF, n_subparts=nsub).to_pandas())
    pd.testing.assert_frame_equal(got, base)


@pytest.mark.parametrize("nsub", [7, 4096])
def test_pack_sequences_global_subpart_invariant(ray_session, nsub):
    from layout_analysis_ray.pipelines.corpus import pack_sequences_global

    base = _sorted(pack_sequences_global(SF, n_subparts=1).to_pandas())
    got = _sorted(pack_sequences_global(SF, n_subparts=nsub).to_pandas())
    pd.testing.assert_frame_equal(got, base)


def test_corpus_prepare_subpart_invariant(ray_session):
    from layout_analysis_ray.pipelines.corpus import corpus_prepare

    base = _sorted(corpus_prepare(SF, n_subparts=1).to_pandas())
    got = _sorted(corpus_prepare(SF, n_subparts=16).to_pandas())
    pd.testing.assert_frame_equal(got, base)


def test_sub_assigner_monotone_and_bounded():
    import numpy as np

    from layout_analysis_ray.pipelines.corpus import _sub_assigner

    nsub, assign = _sub_assigner(SF, 64)
    assert nsub == 64
    ids = np.sort(
        np.random.default_rng(5).integers(0, 10**6, 5000).astype(np.int64)
    )
    sub = assign(ids)
    assert (np.diff(sub) >= 0).all()  # monotone in doc_id
    assert sub.min() >= 0 and sub.max() < 64


def test_explicit_nsub_survives_missing_stats(tmp_path, ray_session):
    """A documents.parquet written WITHOUT row-group statistics must not
    silently discard an explicit n_subparts: the assigner falls back to a
    doc_id-only scan and still subpartitions (and coordinates stay
    invariant)."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.pipelines.corpus import (
        _doc_id_span,
        _sub_assigner,
        pack_sequences,
    )

    src = pq.read_table(f"{SF}/documents.parquet")
    pq.write_table(src, str(tmp_path / "documents.parquet"), write_statistics=False)
    assert _doc_id_span(str(tmp_path)) is None

    nsub, assign = _sub_assigner(str(tmp_path), 8)
    assert nsub == 8
    ids = src["doc_id"].to_numpy(zero_copy_only=False)
    subs = assign(ids)
    assert subs.min() >= 0 and subs.max() < 8 and len(set(subs.tolist())) > 1

    # default (no explicit knob) still degrades to one subpart quietly
    nsub_d, _ = _sub_assigner(str(tmp_path), None)
    assert nsub_d == 1

    base = _sorted(pack_sequences(SF, n_subparts=1).to_pandas())
    got = _sorted(pack_sequences(str(tmp_path), n_subparts=8).to_pandas())
    pd.testing.assert_frame_equal(got, base)


def test_pack_fragmentation_vs_bruteforce(ray_session, tmp_path):
    """Fragmentation report vs a Python brute force over a planted corpus
    with a doc exactly filling a window, one straddling a boundary, one
    spanning three windows, and a zero-token doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import layout_analysis_ray.pipelines.corpus as C

    B = C.PACK_BUDGET_TOKENS
    texts = {
        1: "w " * B,            # exactly one window
        2: "w " * (B // 2),     # together with 1: straddles
        3: "w " * (2 * B + 5),  # spans >= 3 windows
        4: "  .  ",             # zero tokens
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = C.pack_fragmentation_report(str(tmp_path)).to_pandas()

    import hashlib
    import re
    parts = {}
    for d in sorted(texts):
        n = len(re.findall("[a-z0-9]+", texts[d].lower()))
        p = int(hashlib.md5(str(d).encode()).hexdigest()[0], 16)
        parts.setdefault(p, []).append((d, n))
    spans = []
    for p, docs in parts.items():
        before = 0
        for _d, n in sorted(docs):
            if n > 0:
                spans.append((before % B + n - 1) // B + 1)
            before += n
    exp_split = sum(w >= 2 for w in spans)
    assert got.n_docs.iloc[0] == len(spans) == 3
    assert got.n_split.iloc[0] == exp_split
    assert got.split_ppm.iloc[0] == exp_split * 1_000_000 // len(spans)
    assert got.max_windows.iloc[0] == max(spans)
