"""Resumable partitioned output with per-partition lineage manifests.

Ray-Data analogue of the reference's only checkpoint/resume mechanism — the
training loop's ``Saver`` save / ``latest_checkpoint`` restore
(``/root/reference/src/train_detector.py:185-187,241-242``) — generalized to
*inference* resume per SURVEY.md §4: the output is laid out as one Parquet
fragment per deterministic hash partition of ``doc_id``, each committed
atomically with a JSON lineage manifest and a ``_COMMITTED`` marker.  A rerun
enumerates the markers and filters already-committed partitions out of the
input **before** any compute or shuffle happens, so a killed run resumes
without reprocessing finished partitions (north-star requirement).

Layout (Lance-fragment-like; Parquet used because the ``lance`` package is
not installable in this sandbox — SURVEY.md §7.3)::

    out_dir/
      part-00007.parquet          # data fragment for partition 7
      _manifest/part-00007.json   # lineage: run_id, rows, docs, checksum, wall_s
      _manifest/part-00007.COMMITTED

Partitioning is a *stable* hash of ``doc_id`` (crc32) so the input→partition
mapping is identical across runs, processes and parallelism levels.  Writing
uses ``groupby(bucket).map_groups`` — the one shuffle the checkpointed path
needs (the north rule's "salted groupby keyed on doc_id"); each group task
writes its own fragment + manifest and returns a one-row summary, so the
driver only ever sees the (tiny) manifest table.  At 100 TB the shuffle
volume is the *extracted output* (much smaller than the input) and the
partition count is chosen ~4× the worker count.
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"

_SUMMARY_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_bytes", pa.int64()),
        ("wall_s", pa.float64()),
        ("skipped", pa.bool_()),
    ]
)


def stable_bucket_ids(doc_ids: pa.Array | list, num_partitions: int) -> np.ndarray:
    """Deterministic doc_id -> partition bucket, process-independent:
    crc32 for string ids (the extract table), vectorized pandas C hash
    for int64 ids (the documents table) — never Python ``hash()``."""
    if isinstance(doc_ids, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(
        doc_ids.type
    ):
        import pandas as pd

        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        ids = doc_ids.to_numpy(zero_copy_only=False).astype(np.int64)
        return (pd.util.hash_array(ids) % num_partitions).astype(np.int32)
    if isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        doc_ids = doc_ids.to_pylist()
    return np.fromiter(
        (zlib.crc32(d.encode()) % num_partitions for d in doc_ids),
        dtype=np.int32,
        count=len(doc_ids),
    )


def committed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    return {
        int(f.split("-")[1].split(".")[0])
        for f in os.listdir(mdir)
        if f.endswith(".COMMITTED")
    }


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out = []
    if not os.path.isdir(mdir):
        return out
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out


def _write_partition(group: pa.Table, *, out_dir: str, run_id: str) -> pa.Table:
    """map_groups fn: writes one partition fragment atomically.

    Write order is data → manifest → marker, with a same-directory
    ``os.replace`` rename for each, so a crash at any point leaves either a
    fully-committed partition or one that the next run redoes from scratch
    (never a half fragment that would be double-counted).
    """
    t0 = time.perf_counter()
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    bucket = int(group.column("bucket")[0].as_py())
    data = group.drop_columns(["bucket"])

    os.makedirs(mdir, exist_ok=True)
    frag = os.path.join(out_dir, f"part-{bucket:05d}.parquet")
    marker = os.path.join(mdir, f"part-{bucket:05d}.COMMITTED")
    if os.path.exists(marker):  # lost-task retry of a committed group
        return _summary_row(bucket, 0, 0, 0, 0.0, skipped=True)

    # deterministic within-partition order -> byte-stable fragments
    data = data.sort_by("doc_id")
    tmp = frag + f".tmp-{run_id}"
    pq.write_table(data, tmp)
    os.replace(tmp, frag)

    n_spans = 0
    if "spans" in data.column_names:
        import pyarrow.compute as pc

        n_spans = int(
            pc.sum(pc.fill_null(pc.list_value_length(data.column("spans")), 0)).as_py()
            or 0
        )
    n_bytes = os.path.getsize(frag)
    wall = time.perf_counter() - t0
    manifest = {
        "partition": bucket,
        "run_id": run_id,
        "n_docs": data.num_rows,
        "n_spans": n_spans,
        "n_bytes": n_bytes,
        "doc_id_min": data.column("doc_id")[0].as_py() if data.num_rows else None,
        "doc_id_max": data.column("doc_id")[-1].as_py() if data.num_rows else None,
        "checksum_crc32": zlib.crc32(
            data.column("doc_id").combine_chunks().to_string().encode()
        ),
        "wall_s": round(wall, 4),
    }
    mtmp = os.path.join(mdir, f"part-{bucket:05d}.json.tmp-{run_id}")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(mtmp, os.path.join(mdir, f"part-{bucket:05d}.json"))
    with open(marker + f".tmp-{run_id}", "w") as fh:
        fh.write(run_id)
    os.replace(marker + f".tmp-{run_id}", marker)
    return _summary_row(bucket, data.num_rows, n_spans, n_bytes, wall)


def _summary_row(bucket, n_docs, n_spans, n_bytes, wall, skipped=False) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int32()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_spans": pa.array([n_spans], pa.int64()),
            "n_bytes": pa.array([n_bytes], pa.int64()),
            "wall_s": pa.array([float(wall)], pa.float64()),
            "skipped": pa.array([skipped]),
        },
        schema=_SUMMARY_SCHEMA,
    )


def resumable_write(
    docs,
    out_dir: str,
    *,
    num_partitions: int = 64,
    pipeline=None,
) -> dict:
    """Run ``pipeline`` (default: identity) over ``docs`` and write the result
    partitioned + manifested under ``out_dir``; skip committed partitions.

    ``docs`` is a doc-grain Dataset ``(doc_id, spans)``.  Returns a job
    summary dict (also persisted as ``out_dir/_job.json``).  Idempotent:
    rerunning after a partial failure only processes missing partitions;
    rerunning a complete output is a no-op.
    """
    done = committed_partitions(out_dir)
    run_id = uuid.uuid4().hex[:12]
    t0 = time.perf_counter()
    if len(done) >= num_partitions:  # nothing pending: resume of a complete run
        return {
            "run_id": run_id,
            "out_dir": out_dir,
            "num_partitions": num_partitions,
            "partitions_written": 0,
            "partitions_skipped_committed": len(done),
            "n_docs": 0,
            "n_spans": 0,
            "n_bytes": 0,
            "wall_s": 0.0,
        }

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        buckets = stable_bucket_ids(batch.column("doc_id"), num_partitions)
        batch = batch.append_column("bucket", pa.array(buckets, pa.int32()))
        if not done:
            return batch
        keep = ~np.isin(buckets, list(done))
        return batch.filter(pa.array(keep))

    # Filter committed partitions FIRST (before any heavy compute).
    pending = docs.map_batches(tag_and_filter, batch_format="pyarrow")
    if pipeline is not None:
        # pipeline consumes/produces doc-grain (doc_id, spans); re-derive the
        # bucket column afterwards (it is a pure function of doc_id).
        pending = pipeline(pending.drop_columns(["bucket"]))
        pending = pending.map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(stable_bucket_ids(b.column("doc_id"), num_partitions), pa.int32()),
            ),
            batch_format="pyarrow",
        )

    import functools

    summary = (
        pending.groupby("bucket")
        .map_groups(
            functools.partial(_write_partition, out_dir=out_dir, run_id=run_id),
            batch_format="pyarrow",
        )
        .take_all()
    )  # tiny: one row per partition

    written = [r for r in summary if not r["skipped"]]
    job = {
        "run_id": run_id,
        "out_dir": out_dir,
        "num_partitions": num_partitions,
        "partitions_written": len(written),
        "partitions_skipped_committed": len(done),
        "n_docs": int(sum(r["n_docs"] for r in written)),
        "n_spans": int(sum(r["n_spans"] for r in written)),
        "n_bytes": int(sum(r["n_bytes"] for r in written)),
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"_job-{run_id}.json"), "w") as fh:
        json.dump(job, fh, indent=2)
    return job


def read_output(out_dir: str):
    """Ray Dataset over the committed fragments of a resumable output."""
    import ray.data as rd

    frags = [
        os.path.join(out_dir, f"part-{b:05d}.parquet")
        for b in sorted(committed_partitions(out_dir))
    ]
    return rd.read_parquet(frags)
