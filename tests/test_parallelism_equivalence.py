"""SURVEY.md §5: outputs must be identical at two parallelism levels.

Runs the CLI in fresh subprocesses with RAY_GRAFT_CPUS=2 and =8 against the
same input and asserts the extracted span sequences are byte-equal doc for
doc (ordering is per-doc by construction, so parallelism cannot change any
output — this pins that)."""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.dataset as pads


def _canon(path: str) -> dict:
    frags = [
        os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
    ]
    out = {}
    for r in pads.dataset(frags).to_table().to_pylist():
        out[r["doc_id"]] = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        )
    return out


def test_same_output_at_two_cpu_counts(tmp_path):
    outs = {}
    for ncpu in (2, 8):
        out = str(tmp_path / f"out_{ncpu}")
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        r = subprocess.run(
            [sys.executable, "-m", "layout_analysis_ray", "extract",
             "--sf-dir", "/root/testdata/sf0.001", "--out", out,
             "--partitions", "8"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-800:]
        outs[ncpu] = _canon(out)
    assert outs[2] == outs[8]
    assert len(outs[2]) == 500
