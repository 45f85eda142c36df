"""Resumable corpus prep: the checkpointed tokenize stage must (a) produce
exactly the direct corpus_prepare result, (b) recompute ONLY missing
narrow partitions on rerun, and (c) refuse to pack from an incomplete
narrow checkpoint."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
P = 8


def _packed(out_dir: str) -> pd.DataFrame:
    from layout_analysis_ray.state.checkpoint import read_output

    return (
        read_output(os.path.join(out_dir, "packed"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_resumable_matches_direct_and_resumes(tmp_path, ray_session):
    from layout_analysis_ray.pipelines.corpus import (
        corpus_prepare,
        corpus_prepare_resumable,
    )
    from layout_analysis_ray.state import checkpoint as ckpt

    out = str(tmp_path / "prep_out")
    job = corpus_prepare_resumable(SF, out, num_partitions=P)
    assert job["narrow"]["partitions_written"] > 0
    direct = (
        corpus_prepare(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_packed(out), direct)

    # simulate a crash that lost one narrow partition: marker + fragment
    narrow = os.path.join(out, "narrow")
    victim = sorted(ckpt.committed_partitions(narrow))[0]
    os.remove(os.path.join(narrow, ckpt.MANIFEST_DIR, f"part-{victim:05d}.COMMITTED"))
    os.remove(os.path.join(narrow, f"part-{victim:05d}.parquet"))
    # the packed stage also reruns — clear it (its resume is write-level)
    shutil.rmtree(os.path.join(out, "packed"))

    job2 = corpus_prepare_resumable(SF, out, num_partitions=P)
    # ONLY the lost narrow partition was recomputed
    assert job2["narrow"]["partitions_written"] == 1
    assert job2["narrow"]["partitions_skipped_committed"] == len(
        ckpt.committed_partitions(narrow)
    ) - 1
    pd.testing.assert_frame_equal(_packed(out), direct)


def test_incomplete_narrow_checkpoint_refuses_to_pack(tmp_path, ray_session):
    from layout_analysis_ray.pipelines.corpus import corpus_prepare_resumable
    from layout_analysis_ray.state import checkpoint as ckpt

    out = str(tmp_path / "prep_out")
    corpus_prepare_resumable(SF, out, num_partitions=P)
    narrow = os.path.join(out, "narrow")
    victim = sorted(ckpt.committed_partitions(narrow))[0]
    os.remove(os.path.join(narrow, ckpt.MANIFEST_DIR, f"part-{victim:05d}.json"))

    # the manifest is gone but the COMMITTED marker remains: the docs
    # accounted for no longer cover the input -> stage 2 must refuse
    # rather than silently pack a partial corpus
    with pytest.raises(RuntimeError, match="incomplete"):
        corpus_prepare_resumable(SF, out, num_partitions=P)
