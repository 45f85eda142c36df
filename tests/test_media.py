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
