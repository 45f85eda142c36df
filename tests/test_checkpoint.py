"""Resume / lineage tests (SURVEY.md §4, §7.2 step 6).

Kill-and-rerun semantics: a partially-committed output directory, when the
job is rerun, is completed by processing ONLY the missing partitions, and the
final table equals a from-scratch run exactly.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pytest

from layout_analysis_ray.pipelines.extract import extract_pipeline
from layout_analysis_ray.sources.synth import gen_table
from layout_analysis_ray.state import checkpoint as ckpt

P = 8
N_DOCS = 160


def _docs():
    import ray.data as rd

    return rd.from_arrow(gen_table(N_DOCS))


def _canon(tbl: pa.Table) -> list:
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    return [(r["doc_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"])) for r in rows]


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "ckpt_out")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_run_writes_all_partitions_and_matches_direct(out_dir, ray_session):
    job = ckpt.resumable_write(
        _docs(), out_dir, num_partitions=P, pipeline=extract_pipeline
    )
    assert job["partitions_written"] == P
    assert ckpt.committed_partitions(out_dir) == set(range(P))
    manifests = ckpt.read_manifests(out_dir)
    assert len(manifests) == P
    assert sum(m["n_docs"] for m in manifests) == N_DOCS
    assert all(m["run_id"] == job["run_id"] for m in manifests)

    got = _canon(
        pa.concat_tables(
            [b for b in ckpt.read_output(out_dir).iter_batches(batch_format="pyarrow")]
        )
    )
    want = _canon(
        pa.concat_tables(
            [b for b in extract_pipeline(_docs()).iter_batches(batch_format="pyarrow")]
        )
    )
    assert got == want


def test_kill_and_rerun_resumes_only_missing(out_dir, ray_session):
    job1 = ckpt.resumable_write(
        _docs(), out_dir, num_partitions=P, pipeline=extract_pipeline
    )
    # simulate a crash that lost 3 partitions (fragment + manifest + marker)
    lost = [1, 4, 6]
    for b in lost:
        os.remove(os.path.join(out_dir, f"part-{b:05d}.parquet"))
        os.remove(os.path.join(out_dir, "_manifest", f"part-{b:05d}.json"))
        os.remove(os.path.join(out_dir, "_manifest", f"part-{b:05d}.COMMITTED"))

    job2 = ckpt.resumable_write(
        _docs(), out_dir, num_partitions=P, pipeline=extract_pipeline
    )
    assert job2["partitions_written"] == len(lost)
    assert job2["partitions_skipped_committed"] == P - len(lost)
    assert ckpt.committed_partitions(out_dir) == set(range(P))

    # untouched partitions keep their original lineage; redone ones are new
    for m in ckpt.read_manifests(out_dir):
        expect = job2["run_id"] if m["partition"] in lost else job1["run_id"]
        assert m["run_id"] == expect

    got = _canon(
        pa.concat_tables(
            [b for b in ckpt.read_output(out_dir).iter_batches(batch_format="pyarrow")]
        )
    )
    want = _canon(
        pa.concat_tables(
            [b for b in extract_pipeline(_docs()).iter_batches(batch_format="pyarrow")]
        )
    )
    assert got == want


def test_rerun_of_complete_output_is_noop(out_dir, ray_session):
    ckpt.resumable_write(_docs(), out_dir, num_partitions=P, pipeline=extract_pipeline)
    frag = os.path.join(out_dir, "part-00000.parquet")
    mtime = os.path.getmtime(frag)
    job = ckpt.resumable_write(
        _docs(), out_dir, num_partitions=P, pipeline=extract_pipeline
    )
    assert job["partitions_written"] == 0
    assert os.path.getmtime(frag) == mtime


def test_bucketing_is_stable_across_processes(ray_session):
    ids = [f"doc-{i:08d}" for i in range(50)]
    a = ckpt.stable_bucket_ids(ids, 16)
    b = ckpt.stable_bucket_ids(pa.array(ids), 16)
    assert list(a) == list(b)
    # frozen expectation: crc32-based, must never change across versions
    assert list(a[:8]) == [ckpt.zlib.crc32(i.encode()) % 16 for i in ids[:8]]


def test_real_kill_mid_run_then_resume(tmp_path):
    """North-rule semantics: SIGKILL a running `extract` job once its first
    partitions commit, rerun it, and the final output must be complete and
    duplicate-free."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    out = str(tmp_path / "killed_out")
    cmd = [sys.executable, "-m", "layout_analysis_ray", "extract",
           "--sf-dir", "/root/testdata/sf0.01", "--out", out,
           "--partitions", "16"]
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    proc = subprocess.Popen(
        cmd, cwd="/root/repo", env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # kill hard as soon as the first writer task touches the manifest dir
    # (10 ms poll: partitions commit in a burst, the window is narrow)
    mdir = os.path.join(out, "_manifest")
    deadline = _time.time() + 240
    while _time.time() < deadline:
        if os.path.isdir(mdir) or proc.poll() is not None:
            break
        _time.sleep(0.01)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    # whatever the kill hit — mid-write, post-commit-pre-summary, or a
    # completed run — the rerun below must converge to a complete,
    # duplicate-free output
    n_before = len(ckpt.committed_partitions(out))

    r = subprocess.run(
        cmd, cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert ckpt.committed_partitions(out) == set(range(16))

    import pyarrow.dataset as pads

    frags = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".parquet")]
    ids = pads.dataset(frags).to_table().column("doc_id").to_pylist()
    assert len(ids) == 500 and len(set(ids)) == 500  # complete, no dupes
