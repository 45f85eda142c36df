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
