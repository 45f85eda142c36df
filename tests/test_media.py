"""Media featurizer: stub decode, real Ray plumbing (schema, actor pool,
determinism, unit-norm embeddings)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from layout_analysis_ray.stages.media import FEAT_DIM, MEDIA_SCHEMA, MediaFeaturizer


def _batch(n=8):
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "kind": pa.array(["image"] * n),
            "text": pa.array([""] * n),
            "media_ref": pa.array([f"media://d{i}/0" for i in range(n)]),
            "offset": pa.array(list(range(n)), pa.int32()),
        }
    )


def test_featurizer_schema_and_determinism():
    f1, f2 = MediaFeaturizer(), MediaFeaturizer()
    out1, out2 = f1(_batch()), f2(_batch())
    assert out1.schema.equals(MEDIA_SCHEMA)
    assert out1.equals(out2)  # deterministic across actor instances
    assert out1.column("decode_mode")[0].as_py() == "stub"
    emb = np.array(out1.column("embedding").to_pylist(), dtype=np.float32)
    assert emb.shape == (8, FEAT_DIM)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # different refs -> different features
    assert not np.allclose(emb[0], emb[1])


def test_media_features_pipeline(ray_session):
    from layout_analysis_ray.stages.media import media_features

    out = media_features("/root/testdata/sf0.001", concurrency=(1, 2))
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert tbl.num_rows > 100  # interleaved_media family keeps kept images
    assert tbl.schema.equals(MEDIA_SCHEMA)
    refs = tbl.column("media_ref").to_pylist()
    assert all(r.startswith("media://") for r in refs)


def test_media_pool_size_leaves_task_headroom():
    """Session-sized decode pool: never the full CPU count (a pool ==
    num_cpus deadlocks the pipeline — the scorer_pool_size invariant),
    always >= 1, and ~5/8 of the session at real sizes."""
    from layout_analysis_ray.stages.media import media_pool_size

    for cpus in (1, 2, 3, 4, 8, 16, 32, 64):
        size = media_pool_size(cpus)
        assert 1 <= size <= max(1, cpus - 1)
    assert media_pool_size(32) == 20
    assert media_pool_size(8) == 5


def test_media_sample_mod_deterministic_subset(ray_session):
    """sample_mod=N keeps a deterministic md5-hash 1/N subset of media
    refs: stable across runs (process-independent hash) and a strict
    subset of the full corpus — the filter runs before the fetch stage so
    nothing about ordering or parallelism can change membership."""
    from layout_analysis_ray.stages.media import media_features

    full = media_features("/root/testdata/sf0.001", concurrency=(1, 2))
    full_refs = set(
        pa.concat_tables(list(full.iter_batches(batch_format="pyarrow")))
        .column("media_ref")
        .to_pylist()
    )
    got = [
        set(
            pa.concat_tables(
                list(
                    media_features(
                        "/root/testdata/sf0.001",
                        concurrency=(1, 2),
                        sample_mod=4,
                    ).iter_batches(batch_format="pyarrow")
                )
            )
            .column("media_ref")
            .to_pylist()
        )
        for _ in range(2)
    ]
    assert got[0] == got[1]  # deterministic across runs
    assert got[0] < full_refs  # strict subset
    # a 1/4 hash sample of >100 refs lands well inside (5%, 60%)
    assert 0.05 * len(full_refs) < len(got[0]) < 0.6 * len(full_refs)


def test_poison_payload_quarantines_not_raises():
    """VERDICT r4 item 3: a truncated/mis-sized RAW8 payload must emit a
    marked error row (decode_mode 'error', meta -1, zero embedding) while
    every other row in the batch decodes normally — never a task failure."""
    from layout_analysis_ray.stages.media import (
        demo_bytes_decoder,
        encode_demo_payloads,
    )

    batch = _batch(4)
    payloads = encode_demo_payloads(batch.column("media_ref").to_pylist())
    payloads[1] = payloads[1][:3]  # truncated header
    payloads[2] = payloads[2][:-5]  # length mismatch vs header
    poisoned = batch.append_column(
        "media_bytes", pa.array(payloads, pa.binary())
    )
    f = MediaFeaturizer(decoder=demo_bytes_decoder, source_col="media_bytes")
    out = f(poisoned)
    assert out.num_rows == 4
    modes = out.column("decode_mode").to_pylist()
    assert modes == ["real", "error", "error", "real"]
    assert out.column("width").to_pylist()[1] == -1
    assert out.column("n_frames").to_pylist()[2] == -1
    emb = np.array(out.column("embedding").to_pylist(), dtype=np.float32)
    assert np.allclose(emb[1], 0.0) and np.allclose(emb[2], 0.0)
    # clean rows are bit-identical to an unpoisoned decode of the same refs
    clean = MediaFeaturizer(
        decoder=demo_bytes_decoder, source_col="media_bytes"
    )(
        batch.append_column(
            "media_bytes",
            pa.array(
                encode_demo_payloads(batch.column("media_ref").to_pylist()),
                pa.binary(),
            ),
        )
    )
    assert out.slice(0, 1).equals(clean.slice(0, 1))
    assert out.slice(3, 1).equals(clean.slice(3, 1))


def test_poison_payload_frame_sample_zero_frames():
    """Quarantined rows (n_frames == -1) must sample zero frames, not crash
    the vectorized expansion."""
    import numpy as np

    nf = np.array([3, -1, 1], dtype=np.int64)
    take = np.minimum(np.maximum(nf, 0), 4)
    assert take.tolist() == [3, 0, 1]


def test_poison_deskew_quarantines_row():
    """Same contract for the deskew actor: bad payload -> width/height/
    n_baselines == -1 row, good rows unchanged."""
    from layout_analysis_ray.functions.pagexml import doc_to_page_xml
    from layout_analysis_ray.stages.media import encode_demo_payloads, parse_raw8
    from layout_analysis_ray.stages.raster import (
        MediaDeskewer,
        _planted_baselines,
    )

    refs = ["media://a/0", "media://b/0"]
    payloads = encode_demo_payloads(refs)
    xmls = []
    for r, p in zip(refs, payloads):
        w, h, _f, _pl = parse_raw8(p)
        lines, _ = _planted_baselines(r, w, h)
        xmls.append(doc_to_page_xml(r, [], width=w, height=h, baselines=lines))
    payloads[0] = b"\x01"  # poison
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "media_ref": pa.array(refs),
            "media_bytes": pa.array(payloads, pa.binary()),
            "sidecar_xml": pa.array(xmls),
        }
    )
    out = MediaDeskewer()(batch)
    assert out.num_rows == 2
    assert out.column("width").to_pylist() == [-1, parse_raw8(encode_demo_payloads(refs)[1])[0]]
    assert out.column("n_baselines").to_pylist()[0] == -1
    assert out.column("n_baselines").to_pylist()[1] > 0


def test_phash_kernel_and_planted_neardups(ray_session):
    """phash64 is noise-tolerant (one flipped pixel stays within the
    banding's hamming<=3 net) and content-sensitive (a different image
    is far); the banded pair join finds exactly the planted near-dup
    pair; error rows (undecodable payloads) never enter the pairing."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from layout_analysis_ray.stages.media import (
        PHASH_HAM_MAX,
        MediaPHasher,
        phash64,
        phash_pairs_from_hashes,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(40, 50), dtype=np.uint8).astype(np.uint8)
    noisy = base.copy()
    noisy[3, 4] ^= 0x10  # one-pixel perturbation
    other = rng.integers(0, 256, size=(40, 50), dtype=np.uint8)

    h_base = phash64(base)
    h_noisy = phash64(noisy)
    h_other = phash64(other)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h_base, h_noisy) <= PHASH_HAM_MAX
    assert ham(h_base, h_other) > PHASH_HAM_MAX

    def raw8(plane):
        h, w = plane.shape
        return (
            int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + plane.tobytes()
        )

    batch = pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3", "d4"], pa.string()),
            "media_ref": pa.array(["a", "a_noisy", "b", "poison"], pa.string()),
            "media_bytes": pa.array(
                [raw8(base), raw8(noisy), raw8(other), b"\x01"], pa.binary()
            ),
        }
    )
    hashed = MediaPHasher()(batch)
    modes = dict(
        zip(hashed["media_ref"].to_pylist(), hashed["decode_mode"].to_pylist())
    )
    assert modes == {"a": "real", "a_noisy": "real", "b": "real",
                     "poison": "error"}

    pairs = phash_pairs_from_hashes(rd.from_arrow(hashed)).to_pandas()
    assert pairs[["ref_a", "ref_b"]].values.tolist() == [["a", "a_noisy"]]
    assert int(pairs["hamming"].iloc[0]) <= PHASH_HAM_MAX


def test_media_phash_corpus_smoke(ray_session):
    """media_phash over the sf0.001 corpus: every media span hashes
    (decode_mode 'real', nonzero 64-bit patterns), refs are unique, and
    the full near-dup join returns a typed (possibly empty) pair table
    over the random-plane fixtures."""
    from layout_analysis_ray.stages.media import (
        media_phash,
        phash_pairs_from_hashes,
    )

    hashes = media_phash("/root/testdata/sf0.001", concurrency=(1, 2))
    df = hashes.to_pandas()
    assert len(df) > 0
    assert (df["decode_mode"] == "real").all()
    assert df["media_ref"].is_unique
    assert (df["phash"] != 0).any()

    pairs = phash_pairs_from_hashes(
        media_phash("/root/testdata/sf0.001", concurrency=(1, 2))
    )
    # the union-seeded Dataset schema survives even an all-empty result
    # (to_pandas would be column-less then — the documented ensure_schema
    # limit, functions/schema.py)
    assert pairs.schema().names == ["ref_a", "ref_b", "hamming"]
