"""Real-model swap points: the optional logistic scorer in SpanScorer and
the injectable real decoder in MediaFeaturizer must flow through the exact
same actor-pool plumbing as the default heuristic/stub paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from layout_analysis_ray import conformance as C
from layout_analysis_ray.sources.synth import DOCS_SCHEMA

LONG = "stream layout engine span block arrow batch shuffle actor pipeline " * 3


def _doc(doc_id: str, texts: list[str]) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "html", "text": t, "media_ref": "", "offset": i}
            for i, t in enumerate(texts)
        ],
    }


@pytest.fixture(scope="module")
def weights_len10(tmp_path_factory):
    """Content iff vis_len >= 10: W=[0,1,0], b=-10 over
    [link_density, vis_len, text_density]."""
    p = tmp_path_factory.mktemp("model") / "w.npz"
    np.savez(p, W=np.array([0.0, 1.0, 0.0]), b=np.array(-10.0))
    return str(p)


def test_scorer_model_branch_direct(weights_len10):
    from layout_analysis_ray.stages.score import SpanScorer

    batch = pa.Table.from_pylist(
        [_doc("d0", [f"<p>{LONG}</p>", "<p>tiny</p>", f"<p>{'y' * 40}</p>"])],
        schema=DOCS_SCHEMA,
    )
    before = SpanScorer.init_count
    model = SpanScorer(model_weights=weights_len10)
    assert SpanScorer.init_count == before + 1  # weights load in __init__
    out = model(batch)
    labels = out.column("span_label").to_pylist()[0]
    # vis_len >= 10 -> content; "tiny" (4 chars) -> boiler
    assert labels == [C.LABEL_CONTENT, C.LABEL_BOILER, C.LABEL_CONTENT]

    # the heuristic path disagrees on the 40-char low-text-density span?
    # no — prove divergence with the opposite model: everything is boiler
    import numpy as _np
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.npz")
        _np.savez(p, W=_np.zeros(3), b=_np.array(-1.0))
        all_boiler = SpanScorer(model_weights=p)(batch)
        assert all(
            l == C.LABEL_BOILER
            for l in all_boiler.column("span_label").to_pylist()[0]
        )
    heur = SpanScorer()(batch)
    assert heur.column("span_label").to_pylist()[0][0] == C.LABEL_CONTENT


def test_scorer_model_branch_pipeline(ray_session, weights_len10):
    """End-to-end: model weights reach every scorer actor via
    fn_constructor_kwargs and change the extraction output."""
    import ray.data as rd

    from layout_analysis_ray.pipelines.extract import extract_pipeline

    docs = pa.Table.from_pylist(
        [_doc(f"d{i}", [f"<p>{LONG}</p>", "<p>tiny</p>"]) for i in range(20)],
        schema=DOCS_SCHEMA,
    )
    with_model = extract_pipeline(
        rd.from_arrow(docs), model_weights=weights_len10, concurrency=(1, 2)
    ).take_all()
    assert len(with_model) == 20
    for r in with_model:
        texts = [s["text"] for s in r["spans"]]
        assert any(LONG.strip() in t for t in texts)
        assert not any("tiny" in t for t in texts)  # model dropped it


def test_media_real_decoder_contract(ray_session):
    """Injected bytes decoder switches decode_mode to 'real'; dims and
    pixels come from PARSING THE ACTUAL PAYLOAD BYTES (RAW8 header +
    stride resample), embeddings from the same batched matmul as the
    stub path."""
    import hashlib

    from layout_analysis_ray.stages.media import (
        FEAT_DIM,
        demo_bytes_decoder,
        encode_demo_payloads,
        media_features,
    )

    rows = media_features(
        "/root/testdata/sf0.001", concurrency=(1, 2), decoder=demo_bytes_decoder
    ).take_all()
    assert len(rows) > 100
    for r in rows[:20]:
        assert r["decode_mode"] == "real"
        dig = hashlib.sha256(r["media_ref"].encode()).digest()
        assert r["width"] == 16 + dig[0] % 48
        assert r["height"] == 16 + dig[1] % 48
        assert r["n_frames"] == 1 + dig[2] % 4
        assert len(r["embedding"]) == FEAT_DIM
    # the embedding must be a function of the decoded pixels: recompute
    # one row end-to-end from the payload bytes
    raw, meta = demo_bytes_decoder(
        encode_demo_payloads([rows[0]["media_ref"]])
    )
    assert (meta[0] == [rows[0]["width"], rows[0]["height"], rows[0]["n_frames"]]).all()


def test_demo_bytes_decoder_rejects_corrupt_payloads():
    import pytest

    from layout_analysis_ray.stages.media import (
        demo_bytes_decoder,
        encode_demo_payloads,
    )

    good = encode_demo_payloads(["img://a"])[0]
    with pytest.raises(ValueError):
        demo_bytes_decoder([good[:4]])  # truncated header
    with pytest.raises(ValueError):
        demo_bytes_decoder([good + b"x"])  # length mismatch


def test_media_features_custom_fetch(ray_session):
    """`fetch` is injectable: a substitute ref->bytes kernel replaces the
    demo payload synth, so the decoder parses the SUBSTITUTE bytes (all
    16x16x1 here — widths prove which fetch ran)."""
    import numpy as np

    from layout_analysis_ray.stages.media import (
        _RAW8_HEADER,
        demo_bytes_decoder,
        media_features,
    )

    def flat_fetch(refs):
        px = bytes(16 * 16)
        hdr = (16).to_bytes(2, "little") * 2 + (1).to_bytes(2, "little")
        return [hdr + px for _ in refs]

    rows = media_features(
        "/root/testdata/sf0.001",
        concurrency=(1, 2),
        decoder=demo_bytes_decoder,
        fetch=flat_fetch,
    ).take(50)
    assert rows
    assert all(r["width"] == 16 and r["height"] == 16 for r in rows)


def test_media_features_self_fetching_decoder(ray_session):
    """`fetch=None` skips the payload stage entirely: the decoder receives
    the media_ref STRINGS (the documented contract for decoders that do
    their own object-store GET)."""
    import numpy as np

    from layout_analysis_ray.stages.media import media_features

    def ref_decoder(refs):
        assert all(isinstance(r, str) for r in refs)
        n = len(refs)
        raw = np.zeros((n, 32), dtype=np.uint8)
        meta = np.empty((n, 3), dtype=np.int32)
        meta[:] = (7, 9, 2)
        return raw, meta

    rows = media_features(
        "/root/testdata/sf0.001",
        concurrency=(1, 2),
        decoder=ref_decoder,
        fetch=None,
    ).take(20)
    assert rows
    assert all(
        r["width"] == 7 and r["height"] == 9 and r["n_frames"] == 2
        and r["decode_mode"] == "real"
        for r in rows
    )
