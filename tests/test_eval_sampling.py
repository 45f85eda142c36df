"""Evaluation metrics, sampling determinism, PAGE-XML round-trip, IVF ANN."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


# ---------- evaluation ------------------------------------------------------


def test_dice_conventions():
    from layout_analysis_ray.functions.evaluate import _dice, _positional_accuracy

    a = [{"kind": "paragraph", "text": "x", "media_ref": "", "offset": 0}]
    assert _dice([], []) == 1.0  # empty-vs-empty = 1 (HelperMethods.py:71-73)
    assert _dice(a, []) == 0.0  # empty-vs-nonempty = 0
    assert _dice(a, a) == 1.0
    assert _positional_accuracy([], []) == 1.0
    assert _positional_accuracy(a, []) == 0.0


def test_eval_identical_pipelines(ray_session):
    import ray.data as rd

    from layout_analysis_ray.functions.evaluate import (
        corpus_summary,
        evaluate_extraction,
    )
    from layout_analysis_ray.pipelines.extract import extract_pipeline
    from layout_analysis_ray.sources.synth import gen_table

    docs = gen_table(64)
    e = evaluate_extraction(
        extract_pipeline(rd.from_arrow(docs)), extract_pipeline(rd.from_arrow(docs))
    )
    s = corpus_summary(e)
    assert s["n_docs"] == 64
    assert s["n_exact"] == 64
    assert s["mean_dice"] == 1.0
    assert s["mean_positional_accuracy"] == 1.0


def test_eval_detects_differences(ray_session):
    import ray.data as rd

    from layout_analysis_ray.functions.evaluate import evaluate_extraction
    from layout_analysis_ray.pipelines.extract import extract_pipeline
    from layout_analysis_ray.sources.synth import gen_table

    a = extract_pipeline(rd.from_arrow(gen_table(16)))

    def drop_first_span(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        for r in rows:
            r["spans"] = r["spans"][1:]
        return pa.Table.from_pylist(rows, schema=batch.schema)

    b = extract_pipeline(rd.from_arrow(gen_table(16))).map_batches(
        drop_first_span, batch_format="pyarrow"
    )
    rows = {r["doc_id"]: r for b_ in evaluate_extraction(a, b).iter_batches(
        batch_format="pyarrow") for r in b_.to_pylist()}
    assert any(not r["exact"] for r in rows.values())
    assert all(r["dice"] <= 1.0 for r in rows.values())


# ---------- sampling --------------------------------------------------------


def test_split_deterministic_and_ratio(ray_session):
    from layout_analysis_ray.functions.sampling import train_test_split_hash

    r1 = train_test_split_hash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    r2 = train_test_split_hash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert r1.equals(r2)
    frac = (r1["split"] == "test").mean()
    assert 0.25 < frac < 0.42  # ~1/3


def test_weighted_sample_bias(ray_session):
    from layout_analysis_ray.functions.sampling import weighted_sample

    kept = weighted_sample(SF).to_pandas()
    import pyarrow.parquet as pq

    all_docs = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"]).to_pandas()
    # longer docs must be over-represented
    assert kept["n_chars"].mean() > all_docs["n_chars"].mean()


def test_importance_weights_sum(ray_session):
    from layout_analysis_ray.functions.sampling import importance_weights

    df = importance_weights(SF).to_pandas()
    # floor-division ppm sums to just under 1e6
    assert 0.98e6 < df["prob_ppm"].sum() <= 1.0e6


# ---------- PAGE-XML --------------------------------------------------------


def test_pagexml_roundtrip():
    from layout_analysis_ray.functions.pagexml import (
        doc_to_page_xml,
        page_xml_to_spans,
    )

    spans = [
        {"kind": "title", "text": "A <Title> & more", "media_ref": "", "offset": 0},
        {"kind": "paragraph", "text": "body text", "media_ref": "", "offset": 1},
        {"kind": "image", "text": "", "media_ref": "media://d/0", "offset": 2},
    ]
    xml = doc_to_page_xml("doc-x", spans)
    assert 'id="r1"' in xml and 'id="r3"' in xml  # emission-order region ids
    back = page_xml_to_spans(xml)
    assert back == spans


def test_pagexml_baseline_roundtrip():
    """Baseline polylines survive the round trip with the reference's
    axis-swap contract: (y, x) in memory, "x,y" on disk."""
    from layout_analysis_ray.functions.pagexml import (
        doc_to_page_xml,
        page_xml_baselines,
        page_xml_to_spans,
    )

    spans = [
        {"kind": "paragraph", "text": "body", "media_ref": "", "offset": 0},
    ]
    lines = [[(10, 5), (10, 400)], [(60, 5), (62, 200), (60, 395)]]
    xml = doc_to_page_xml("doc-b", spans, baselines=lines)
    assert 'points="5,10 400,10"' in xml  # x,y serialization
    assert page_xml_baselines(xml) == lines
    assert page_xml_to_spans(xml) == spans  # baselines don't disturb spans
    # and a baseline-free doc parses to no baselines
    assert page_xml_baselines(doc_to_page_xml("doc-x", spans)) == []


def test_pagexml_pipeline(ray_session):
    from layout_analysis_ray.functions.pagexml import page_xml_export

    tbl = pa.concat_tables(
        list(page_xml_export(SF).iter_batches(batch_format="pyarrow"))
    )
    assert tbl.num_rows == 500
    xml0 = tbl.column("xml")[0].as_py()
    assert xml0.startswith('<?xml version="1.0"')
    assert "<PcGts" in xml0


# ---------- IVF ANN ---------------------------------------------------------


def test_ivf_full_probe_equals_brute(ray_session):
    from layout_analysis_ray.functions.similarity import (
        IVF_CLUSTERS,
        knn_brute,
        knn_ivf,
    )

    brute = knn_brute(SF).to_pandas().sort_values(["query_id", "rank"])
    full = knn_ivf(SF, nprobe=IVF_CLUSTERS).to_pandas().sort_values(
        ["query_id", "rank"]
    )
    assert brute.reset_index(drop=True).equals(full.reset_index(drop=True))


def test_ivf_partial_probe_recall(ray_session):
    from layout_analysis_ray.functions.similarity import knn_brute, knn_ivf

    brute = knn_brute(SF).to_pandas()
    approx = knn_ivf(SF).to_pandas()
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(a & b) / len(b)
    assert recall >= 0.4  # near-random embeddings; nprobe=4/8 clusters


def test_sample_exact_k_partition_invariant(ray_session):
    """The exact-size sample must be identical however the input is
    blocked (per-block partial bottom-k merges to one global order), and
    must truncate gracefully when k exceeds the corpus."""
    from layout_analysis_ray.functions.sampling import sample_exact_k

    sf = "/root/testdata/sf0.001"
    a = sample_exact_k(sf, k=37).to_pandas()
    b = sample_exact_k(sf, k=37).to_pandas()
    assert a.equals(b)
    assert len(a) == 37
    assert list(a.sample_rank) == list(range(1, 38))
    big = sample_exact_k(sf, k=10_000).to_pandas()
    assert len(big) == 500  # corpus size caps the sample
    assert list(big.sample_rank) == list(range(1, 501))
