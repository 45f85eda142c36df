"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + §8 coverage map: 178 entries); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (144) with IDENTICAL
column names, dtypes (every SUM cast to BIGINT — DuckDB HUGEINT renders as
float64) and exact integer arithmetic (cents / ppm / floor division) so
value hashes match bit-for-bit.  Queries without SQL entries (extraction
family, MinHash/SimHash/LSH/IVF, sketches, media, PAGE-XML) are
non-SQL-expressible or approximate by design and get the driver's rows-only
check; their real correctness gates are the pytest oracle-equality,
property, and accuracy suites.

Ray is initialised by the driver before import; nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: interleaved docs derived from sf0.001 -> extraction ->
    exploded span rows (doc_id, kind, text, media_ref, offset)."""
    from layout_analysis_ray.pipelines.extract import explode, extract_pipeline
    from layout_analysis_ray.sources.synth import docs_from_parquet

    return explode(extract_pipeline(docs_from_parquet(SF_SMOKE)))


def _extract_spans(sf_dir: str):
    from layout_analysis_ray.pipelines.extract import explode, extract_pipeline
    from layout_analysis_ray.sources.synth import docs_from_parquet

    return explode(extract_pipeline(docs_from_parquet(sf_dir)))


def _extract_kind_counts(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from layout_analysis_ray.pipelines.relational import _partial_then_global

    ds = _extract_spans(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": batch["kind"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["kind"], ["n"]
    )


def _extract_spans_skew(sf_dir: str):
    """Skew-robust variant: chunk giant docs -> score -> salted groupby
    reassembly; pytest proves span-equality with the happy path."""
    from layout_analysis_ray.pipelines.extract import explode
    from layout_analysis_ray.sources.synth import docs_from_parquet
    from layout_analysis_ray.stages.skew import extract_pipeline_skew

    return explode(extract_pipeline_skew(docs_from_parquet(sf_dir)))


def _extract_spans_cluster_order(sf_dir: str):
    """Alternative pluggable block-ordering strategy (§2.10 swap surface):
    proximity clustering instead of XY-cut; same block set, different order
    (pinned by tests/test_blocks.py)."""
    from layout_analysis_ray.pipelines.extract import explode, extract_pipeline
    from layout_analysis_ray.sources.synth import docs_from_parquet

    return explode(
        extract_pipeline(docs_from_parquet(sf_dir), order_strategy="cluster")
    )


def _extract_spans_flood_order(sf_dir: str):
    """Third pluggable ordering strategy (watershed analogue): seeded
    nearest-first region growth; same block set, basin-growth order
    (pinned by tests/test_blocks.py + a frozen golden)."""
    from layout_analysis_ray.pipelines.extract import explode, extract_pipeline
    from layout_analysis_ray.sources.synth import docs_from_parquet

    return explode(
        extract_pipeline(docs_from_parquet(sf_dir), order_strategy="flood")
    )


def _media_phash(sf_dir: str):
    from layout_analysis_ray.stages.media import media_phash

    return media_phash(sf_dir)


def _media_phash_neardup_pairs(sf_dir: str):
    from layout_analysis_ray.stages.media import media_phash_neardup_pairs

    return media_phash_neardup_pairs(sf_dir)


def _media_audio_features(sf_dir: str):
    """Audio modality: real RIFF/PCM16 decode in an actor pool, exact
    integer features (all scalar columns — directly rows-only checkable)."""
    from layout_analysis_ray.stages.audio import media_audio_features

    return media_audio_features(sf_dir)


def _media_features(sf_dir: str):
    """Driver-facing projection: scalar columns only (the embedding vector
    stays inside the stage; e0_ppm summarizes it for the rows-only check)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from layout_analysis_ray.stages.media import media_features

    def proj(b: pa.Table) -> pa.Table:
        e0 = pc.list_element(b.column("embedding"), 0)
        return b.drop_columns(["embedding"]).append_column(
            "e0_ppm",
            pc.cast(pc.floor(pc.multiply(pc.cast(e0, pa.float64()), 1e6)), pa.int64()),
        )

    return media_features(sf_dir).map_batches(proj, batch_format="pyarrow")


def _media_features_demo(sf_dir: str):
    """media_features with the REAL-bytes demo decode path: payload fetch
    into a binary column, RAW8 header parse + pixel resample in the actor
    pool (decode_mode == 'real').  Same scalar projection as
    media_features; golden-pinned so the byte-decode output is a frozen
    gate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from layout_analysis_ray.stages.media import (
        demo_bytes_decoder,
        media_features,
    )

    def proj(b: pa.Table) -> pa.Table:
        e0 = pc.list_element(b.column("embedding"), 0)
        return b.drop_columns(["embedding"]).append_column(
            "e0_ppm",
            pc.cast(pc.floor(pc.multiply(pc.cast(e0, pa.float64()), 1e6)), pa.int64()),
        )

    return media_features(sf_dir, decoder=demo_bytes_decoder).map_batches(
        proj, batch_format="pyarrow"
    )


def _media_features_png(sf_dir: str):
    """media_features decoding REAL COMPRESSED IMAGE BYTES: the fetch
    stage materializes grayscale PNGs (same deterministic planes as the
    RAW8 payloads) and the actor pool inflates + un-filters them with the
    pure-Python codec (``functions/png.py``) — the reference's
    image-file-read input path (``src/DocumentAnalyzer.py:105-109``)
    exercised end to end in-sandbox.  Golden-pinned."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from layout_analysis_ray.stages.media import (
        encode_png_payloads,
        media_features,
        png_bytes_decoder,
    )

    def proj(b: pa.Table) -> pa.Table:
        e0 = pc.list_element(b.column("embedding"), 0)
        return b.drop_columns(["embedding"]).append_column(
            "e0_ppm",
            pc.cast(pc.floor(pc.multiply(pc.cast(e0, pa.float64()), 1e6)), pa.int64()),
        )

    return media_features(
        sf_dir, decoder=png_bytes_decoder, fetch=encode_png_payloads
    ).map_batches(proj, batch_format="pyarrow")


def _media_features_jpeg(sf_dir: str):
    """media_features decoding baseline-JPEG bytes: Huffman entropy decode
    + vectorized IDCT in the actor pool (``functions/jpeg.py``), restart
    markers exercised on every fixture — the reference's .jpg input
    branch (S2 extension filter, ``src/detect_paragraphs.py:26``) run on
    real entropy-coded bytes.  Golden-pinned."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from layout_analysis_ray.stages.media import (
        encode_jpeg_payloads,
        jpeg_bytes_decoder,
        media_features,
    )

    def proj(b: pa.Table) -> pa.Table:
        e0 = pc.list_element(b.column("embedding"), 0)
        return b.drop_columns(["embedding"]).append_column(
            "e0_ppm",
            pc.cast(pc.floor(pc.multiply(pc.cast(e0, pa.float64()), 1e6)), pa.int64()),
        )

    return media_features(
        sf_dir, decoder=jpeg_bytes_decoder, fetch=encode_jpeg_payloads
    ).map_batches(proj, batch_format="pyarrow")


def _media_deskew(sf_dir: str):
    """Raster skew normalization over decoded RAW8 planes: sidecar
    PAGE-XML baselines -> reference A2 angle estimate -> G5 plane
    rotation -> G8 baseline normalization (stages/raster.py).  Rows-only
    for the driver; golden-pinned (plane checksums freeze the rotation
    kernel)."""
    from layout_analysis_ray.stages.raster import media_deskew

    return media_deskew(sf_dir)


def _media_frame_sample(sf_dir: str):
    """Uniform-stride frame sampling rows (doc_id, media_ref, n_frames,
    frame_idx) — deterministic, golden-pinned."""
    from layout_analysis_ray.stages.media import frame_sample

    return frame_sample(sf_dir)


def _media_overlay(sf_dir: str):
    """M9/G10/M10 composite over decoded RAW8 planes: span-region debug
    overlay (closed width-4 rect outlines, the reference's
    ``get_img_coords``), planted separator-column stamping
    (``get_separator_img``), and the sidecar baseline-height median (the
    working stat the reference's dead ``get_baseline_median`` intended).
    Rows-only; golden-pinned (overlay plane checksums freeze the draw
    kernels)."""
    from layout_analysis_ray.functions.rastermaps import media_overlay

    return media_overlay(sf_dir)


def _eval_raster_dice(sf_dir: str):
    """G11-over-G12: per-doc symmetric best dice between the happy-path
    and flood-order extractions, computed over RASTERIZED
    content-dependent region maps (the reference's ``get_maps`` +
    ``symmetric_best_dice`` contract, exact integer ppm).  Rows-only;
    golden-pinned."""
    from layout_analysis_ray.functions.rastermaps import eval_raster_dice

    return eval_raster_dice(sf_dir)


def _extract_error_docs(sf_dir: str):
    """Quarantine visibility: doc_ids whose extraction emitted an 'error'
    span (poison docs survive as rows, never as task failures)."""
    import pyarrow.compute as pc

    ds = _extract_spans(sf_dir)
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), "error")).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
    )


def _dedup_neardup_incremental_ingest(sf_dir: str):
    """Incremental NEAR-dup (MinHash-band) dedup against the shared
    mutable band-sharded index: day-1 docs build the index, the returned
    rows are day 2's survivors — neither intra-day near-dup
    non-representatives nor band matches of anything day 1 admitted.
    Stateful actors + LSH, not SQL-expressible; pytest-gated (batch
    equivalence, planted cross-increment near-dup, shard invariance,
    replay idempotence)."""
    from layout_analysis_ray.state.dedup_index import (
        dedup_neardup_incremental_ingest,
    )

    return dedup_neardup_incremental_ingest(sf_dir)


def _dedup_incremental_ingest(sf_dir: str):
    """Incremental exact dedup against the shared mutable shard-actor
    index (raw-actor tier): day-1 docs (id-hash digit < 8) build the
    index, the returned rows are day 2's previously-unseen content."""
    from layout_analysis_ray.state.dedup_index import dedup_incremental_ingest

    return dedup_incremental_ingest(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from layout_analysis_ray.functions import (
        dedup,
        domains,
        evaluate,
        graph,
        joins,
        pagexml,
        profile,
        quantiles,
        sampling,
        similarity,
        sketches,
        stats,
        text,
        windows,
    )
    from layout_analysis_ray.pipelines import corpus
    from layout_analysis_ray.pipelines import relational as rel

    return {
        # flagship extraction family (non-SQL; pytest-gated vs oracle)
        "extract_spans": _extract_spans,
        "extract_kind_counts": _extract_kind_counts,
        "extract_spans_skew": _extract_spans_skew,
        "extract_spans_cluster_order": _extract_spans_cluster_order,
        "extract_spans_flood_order": _extract_spans_flood_order,
        "media_features": _media_features,
        "media_audio_features": _media_audio_features,
        "media_features_demo": _media_features_demo,
        "media_features_png": _media_features_png,
        "media_features_jpeg": _media_features_jpeg,
        "media_deskew": _media_deskew,
        "media_frame_sample": _media_frame_sample,
        "media_overlay": _media_overlay,
        "eval_raster_dice": _eval_raster_dice,
        # relational operators
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q6_forecast_revenue": rel.q6_forecast_revenue,
        "q4_priority_semijoin": rel.q4_priority_semijoin,
        "cust_yoy_activity": rel.cust_yoy_activity,
        "q3_top_orders": rel.q3_top_orders,
        "q5_region_revenue": rel.q5_region_revenue,
        "part_type_stats": rel.part_type_stats,
        "top_docs_by_chars": rel.top_docs_by_chars,
        "distinct_event_types": rel.distinct_event_types,
        "semi_join_customers": rel.semi_join_customers,
        "anti_join_customers": rel.anti_join_customers,
        "split_hash_buckets": rel.split_hash_buckets,
        "q_join_bucketed": joins.q_join_bucketed,
        "q_join_bucketed_agg": joins.q_join_bucketed_agg,
        "cust_order_counts": rel.cust_order_counts,
        "top_orders_per_segment": rel.top_orders_per_segment,
        "revenue_rollup": rel.revenue_rollup,
        "revenue_cube": rel.revenue_cube,
        "part_skyline_by_brand": rel.part_skyline_by_brand,
        "part_pairs_top": rel.part_pairs_top,
        "orders_pivot_by_year": rel.orders_pivot_by_year,
        "orders_above_cust_avg": rel.orders_above_cust_avg,
        "q18_large_orders": rel.q18_large_orders,
        "q14_promo_ratio": rel.q14_promo_ratio,
        "cust_order_dist": rel.cust_order_dist,
        "q15_top_supplier": rel.q15_top_supplier,
        "cust_idle_above_avg": rel.cust_idle_above_avg,
        "q17_small_qty_revenue": rel.q17_small_qty_revenue,
        "q19_disjunctive_revenue": rel.q19_disjunctive_revenue,
        "q9_profit_by_nation_year": rel.q9_profit_by_nation_year,
        "q11_part_value_hotlist": rel.q11_part_value_hotlist,
        "q16_supplier_variety": rel.q16_supplier_variety,
        "q20_excess_shippers": rel.q20_excess_shippers,
        "nation_segment_listagg": rel.nation_segment_listagg,
        "q21_waiting_suppliers": rel.q21_waiting_suppliers,
        "q7_volume_shipping": rel.q7_volume_shipping,
        "q10_returned_top_customers": rel.q10_returned_top_customers,
        "q8_market_share": rel.q8_market_share,
        "q12_priority_by_returnflag": rel.q12_priority_by_returnflag,
        "q13_custdist": rel.q13_custdist,
        "q22_global_balance": rel.q22_global_balance,
        "lineitem_unpivot": rel.lineitem_unpivot,
        # stream-shaped windows
        "events_tumbling_1h": windows.tumbling_hourly,
        "events_sessionize": windows.sessionize,
        "events_running_total": windows.running_total,
        "events_props_json": windows.props_json_extract,
        "events_hopping_1h_30m": windows.hopping_1h_30m,
        "events_mode_value_by_type": windows.mode_value_by_type,
        "events_top_per_user": windows.top_event_per_user,
        "events_first_last_per_user": windows.first_last_event_per_user,
        "events_new_users_hourly": windows.new_users_hourly,
        "events_value_outliers": stats.events_value_outliers,
        "events_distinct_users_hourly": windows.distinct_users_hourly,
        "events_value_histogram": windows.events_value_histogram,
        "events_session_ids": windows.session_ids,
        "events_top_sessions": windows.top_sessions_by_value,
        "events_lag_diff": windows.lag_diff,
        "events_moving_avg": windows.moving_avg,
        "events_range_sum_1h": windows.range_sum_1h,
        "events_user_retention_hourly": windows.user_retention_hourly,
        "events_percent_rank_by_type": windows.percent_rank_by_type,
        "events_dense_rank_by_type": windows.dense_rank_by_type,
        "events_cume_dist_by_type": windows.cume_dist_by_type,
        "events_asof_last_purchase": windows.asof_last_purchase,
        "events_range_join_purchase": windows.range_join_after_purchase,
        # time-range-salted variants (hot-key path): same results, bounded
        # per-worker group size — oracle SQL identical to the unsalted twin
        "events_sessionize_salted": windows.sessionize_salted,
        "events_asof_salted": windows.asof_last_purchase_salted,
        "events_range_join_salted": windows.range_join_after_purchase_salted,
        "events_funnel_counts": windows.funnel_counts,
        "extract_error_docs": _extract_error_docs,
        # text analysis
        "doc_token_stats": text.token_stats,
        "doc_lang_id": text.lang_id,
        "doc_quality": text.quality,
        "doc_fingerprint": text.fingerprint,
        "html_visible_stats": text.html_visible_stats,
        "doc_top_tokens_by_lang": text.top_tokens_by_lang,
        "doc_tfidf_top_terms": text.tfidf_top_terms,
        "doc_lang_confusion": text.lang_confusion,
        "doc_length_histogram": text.doc_length_histogram,
        "doc_repetition_stats": text.repetition_stats,
        "doc_lm_quality": text.lm_quality,
        "doc_chunks": text.chunk_documents,
        "doc_lm_ppl_buckets": text.lm_ppl_buckets,
        "doc_hashed_features": text.hashed_features,
        "doc_bigram_top": text.bigram_top,
        "source_token_jaccard": text.source_token_jaccard,
        "doc_ntile_by_chars": text.ntile_by_chars,
        "doc_oov_rate": text.oov_rate,
        "vocab_freq_spectrum": text.vocab_freq_spectrum,
        "doc_sentence_stats": text.doc_sentence_stats,
        # corpus pipelines: cleaning chain + sequence packing
        "corpus_clean_keep": corpus.corpus_clean_keep,
        "corpus_filter_funnel_gopher": corpus.corpus_filter_funnel_gopher,
        "pack_fragmentation_report": corpus.pack_fragmentation_report,
        "pack_sequences": corpus.pack_sequences,
        "pack_sequences_global": corpus.pack_sequences_global,
        "corpus_prepare": corpus.corpus_prepare,
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "dedup_rate_by_source": dedup.dedup_rate_by_source,
        "source_leakage_matrix": dedup.source_leakage_matrix,
        "dedup_prefix_containment_pairs": dedup.dedup_prefix_containment_pairs,
        "dedup_minhash_pairs": dedup.dedup_minhash_pairs,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_simhash_pairs": dedup.simhash_pairs,
        "ngram_jaccard_consecutive": dedup.ngram_jaccard_consecutive,
        "ngram_chain_groups": graph.ngram_chain_groups,
        "dedup_minhash_groups": graph.dedup_minhash_groups,
        "dedup_incremental_ingest": _dedup_incremental_ingest,
        "dedup_neardup_incremental_ingest": _dedup_neardup_incremental_ingest,
        "dedup_lines": dedup.dedup_lines,
        "dedup_editdistance_pairs": dedup.dedup_editdistance_pairs,
        "corpus_filter_funnel": corpus.corpus_filter_funnel,
        "events_value_hour_cov_by_type": stats.events_value_hour_cov_by_type,
        "events_value_mad_by_type": quantiles.events_value_mad_by_type,
        "lineitem_weighted_median_price": quantiles.lineitem_weighted_median_price,
        "doc_pii_stats": text.pii_stats,
        "doc_redact_terms": text.redact_pattern,
        "decontaminate_ngrams": dedup.decontaminate_ngrams,
        "dedup_keep_best": dedup.dedup_keep_best,
        "dedup_substring_spans": dedup.dedup_substring_spans,
        "doc_dup_span_stats": dedup.doc_dup_span_stats,
        # source-level corpus composition (domain scorecard + balancing)
        "source_quality_report": domains.source_quality_report,
        "source_quality_floor_keep": domains.source_quality_floor_keep,
        "corpus_token_budget_cut": domains.corpus_token_budget_cut,
        "source_token_weighted_median_quality": domains.source_token_weighted_median_quality,
        "events_transition_counts": windows.transition_counts,
        "events_user_streaks": windows.user_hour_streaks,
        "events_scd2_intervals": windows.scd2_type_intervals,
        "events_type_drift_chi2": windows.type_drift_chi2,
        "events_user_journey_paths": windows.user_journey_paths,
        "events_time_to_purchase": windows.time_to_purchase_histogram,
        "events_debounce_counts": windows.debounce_counts,
        "events_session_size_histogram": windows.session_size_histogram,
        "events_user_coverage": windows.user_coverage_intervals,
        "events_missing_hours": windows.missing_hours_by_type,
        "events_rolling_7d_users": windows.rolling_7d_users,
        "events_audience_overlap": windows.audience_overlap,
        "events_session_duration_median": windows.session_duration_median,
        "events_first_touch_attribution": windows.first_touch_attribution,
        "source_fingerprint": domains.source_fingerprint,
        "source_lang_gini": domains.source_lang_gini,
        "orders_table_profile": profile.table_profile,
        "copurchase_pagerank": rel.copurchase_pagerank,
        "copurchase_triangles": rel.copurchase_triangles,
        "documents_assertions": domains.documents_assertions,
        "nation_revenue_share": rel.nation_revenue_share,
        "cust_order_gap_histogram": rel.cust_order_gap_histogram,
        "cust_revenue_deciles": rel.cust_revenue_deciles,
        "cust_rfm_segments": rel.cust_rfm_segments,
        "orders_mom_growth": rel.orders_mom_growth,
        "part_cheapest_supplier": rel.part_cheapest_supplier,
        "orders_denormalized": rel.orders_denormalized,
        "events_user_ltv_cohort": rel.events_user_ltv_cohort,
        "events_benford_first_digit": stats.events_benford_first_digit,
        "events_hourly_spike_by_type": windows.hourly_spike_by_type,
        "events_rolling_max_24h": windows.rolling_max_24h_by_type,
        "events_user_value_decayed": windows.user_value_decayed,
        "events_dow_hour_heatmap": windows.dow_hour_heatmap,
        "embedding_label_quality": similarity.embedding_label_quality,
        "cap_docs_per_source": domains.cap_docs_per_source,
        "domain_mix_sample": domains.domain_mix_sample,
        "domain_mix_repeat": domains.domain_mix_repeat,
        # similarity search
        "embedding_knn": similarity.knn_brute,
        "embedding_neardup_pairs": similarity.neardup_pairs,
        "embedding_neardup_pairs_lsh": similarity.neardup_pairs_lsh,
        "ann_lsh_buckets": similarity.lsh_buckets,
        "ann_knn_lsh": similarity.knn_lsh,
        "ann_ivf_assign": similarity.ivf_assign,
        "ann_knn_ivf": similarity.knn_ivf,
        "embedding_label_centroids": similarity.label_centroids,
        "embedding_top_component": similarity.embedding_top_component,
        "embedding_norm_quantiles": similarity.embedding_norm_quantiles,
        "media_phash": _media_phash,
        "media_phash_neardup_pairs": _media_phash_neardup_pairs,
        "embedding_centroid_confusion": similarity.centroid_confusion,
        # evaluation / sampling / sidecar export
        "eval_skew_vs_happy": evaluate.eval_skew_vs_happy,
        "split_train_test": sampling.train_test_split_hash,
        "weighted_sample": sampling.weighted_sample,
        "sample_exact_k": sampling.sample_exact_k,
        "importance_weights": sampling.importance_weights,
        "page_xml_export": pagexml.page_xml_export,
        # sketches (approximate; pytest gates vs exact answers)
        "sketch_distinct_users": sketches.approx_distinct_users,
        "sketch_source_unique": sketches.source_unique_sketch,
        "sketch_heavy_tokens": sketches.heavy_hitter_tokens,
        "sketch_value_quantiles": sketches.approx_value_quantiles,
        # exact distributed order statistics (histogram narrowing, no sort)
        "lineitem_price_quantiles": quantiles.lineitem_price_quantiles,
        "lineitem_price_quartiles_interp": quantiles.lineitem_price_quartiles_interp,
        "events_value_median_interp_by_type": quantiles.events_value_median_interp_by_type,
        "events_value_quantiles": quantiles.events_value_quantiles,
        "events_value_median_by_type": quantiles.events_value_median_by_type,
        "events_value_quartile": quantiles.events_value_quartile,
        "events_value_winsorized": quantiles.events_value_winsorized,
        "stratified_sample_by_lang": sampling.stratified_sample_by_lang,
    }


_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_STOPS = "('the','a','and','of','to','in','is','on','for','with')"


def oracle_sql() -> dict[str, str]:
    d = {
        "q1_pricing_summary": f"""
            -- CASTs on every SUM-derived column: DuckDB SUM(BIGINT) returns
            -- HUGEINT (-> pandas float64) while the engine emits int64.
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) // 100 AS BIGINT) AS sum_qty,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
              CAST((SUM(CAST(round(l_quantity*100) AS BIGINT)) * 10000) // COUNT(*) AS BIGINT) AS avg_qty_ppm,
              COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "cust_yoy_activity": """
            WITH a AS (
              SELECT o_custkey, COUNT(*) AS n FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
            b AS (
              SELECT o_custkey, COUNT(*) AS n FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1)
            SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_1996,
                   CAST(coalesce(b.n, 0) AS BIGINT) AS n_1997,
                   CASE WHEN a.o_custkey IS NULL THEN 'new'
                        WHEN b.o_custkey IS NULL THEN 'churned'
                        ELSE 'retained' END AS status
            FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        """,
        "q4_priority_semijoin": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
              AND o.o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate >= TIMESTAMP '1996-10-01')
            GROUP BY 1
        """,
        "q6_forecast_revenue": """
            SELECT CAST(COALESCE(SUM(
                     CAST(round(l_extendedprice*100) AS BIGINT)
                     * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT)
                     AS revenue_e4,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
              AND CAST(round(l_quantity*100) AS BIGINT) < 2400
        """,
        "q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_cents
              FROM lineitem GROUP BY 1
              HAVING SUM(CAST(round(l_quantity*100) AS BIGINT)) > 25000)
            SELECT c_name, o_custkey, o_orderkey,
                   epoch_us(o_orderdate) // 86400000000 AS o_orderdate_day,
                   CAST(round(o_totalprice*100) AS BIGINT) AS total_price_cents,
                   sum_qty_cents
            FROM big
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY sum_qty_cents DESC, o_orderkey
            LIMIT 100
        """,
        "q8_market_share": """
            WITH j AS (
              SELECT year(o_orderdate) AS o_year,
                     CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4,
                     CASE WHEN n1.n_name = 'NATION_5' THEN 1 ELSE 0 END AS is_target
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region ON n2.n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01')
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   CAST(SUM(is_target * rev_e4) AS BIGINT) AS target_rev_e4,
                   CAST(SUM(rev_e4) AS BIGINT) AS total_rev_e4,
                   CAST((SUM(is_target * rev_e4) * 1000000) // SUM(rev_e4)
                        AS BIGINT) AS share_ppm,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "q7_volume_shipping": """
            WITH j AS (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     CAST(round(l_extendedprice*100) AS BIGINT)
                       * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
                AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                  OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
            SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
                   CAST(SUM(rev_e4) AS BIGINT) AS revenue_e4,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM j GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "q13_custdist": """
            -- Q13 adaptation: status <> 'F' stands in for the comment
            -- NOT LIKE; zero-order customers kept by the outer join
            WITH c_orders AS (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderstatus <> 'F'
              GROUP BY c_custkey)
            SELECT c_count, COUNT(*) AS custdist
            FROM c_orders GROUP BY c_count
        """,
        "q22_global_balance": """
            -- Q22 adaptation: mean-positive-balance compare is
            -- CROSS-MULTIPLIED (no division); inactivity = no order on or
            -- after Q22_CUTOFF (pipelines/relational.py literal)
            WITH t AS (
              SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                     COUNT(*) AS n
              FROM customer
              WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0)
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
              COUNT(*) AS n_cust,
              CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                AS sum_acctbal_cents
            FROM customer, t
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
              AND c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
        """,
        "q10_returned_top_customers": """
            WITH per_cust AS (
              SELECT o_custkey AS c_custkey,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT)))
                          AS BIGINT) AS revenue_e4,
                     CAST(COUNT(*) AS BIGINT) AS n_items
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1996-07-01'
                AND o_orderdate < TIMESTAMP '1996-10-01'
              GROUP BY 1)
            SELECT c_custkey, c_name, revenue_e4, n_items,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
                   n_name
            FROM per_cust
            JOIN customer USING (c_custkey)
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue_e4 DESC, c_custkey
            LIMIT 20
        """,
        "q17_small_qty_revenue": """
            WITH bl AS (
              SELECT l_partkey,
                     CAST(round(l_quantity*100) AS BIGINT) AS qty_cents,
                     CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#12'),
            a AS (SELECT l_partkey, SUM(qty_cents) AS sq, COUNT(*) AS n
                  FROM bl GROUP BY 1)
            SELECT CAST(COALESCE(SUM(price_cents), 0) AS BIGINT)
                     AS total_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COALESCE(SUM(price_cents), 0) // 7 AS BIGINT)
                     AS avg_yearly_cents
            FROM bl JOIN a USING (l_partkey)
            WHERE 5 * qty_cents * n < sq
        """,
        "q19_disjunctive_revenue": """
            SELECT CAST(COALESCE(SUM(
                     CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))), 0)
                     AS BIGINT) AS revenue_e4,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND CAST(round(l_quantity*100) AS BIGINT) BETWEEN 100 AND 1100)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND CAST(round(l_quantity*100) AS BIGINT) BETWEEN 1000 AND 2000)
               OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
                   AND CAST(round(l_quantity*100) AS BIGINT) BETWEEN 2000 AND 3000)
        """,
        "q9_profit_by_nation_year": """
            SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l_discount*100) AS BIGINT))
                          - CAST(round(p_retailprice*100) AS BIGINT)
                            * CAST(l_quantity AS BIGINT) * 100) AS BIGINT)
                     AS profit_e4,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%rod%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q11_part_value_hotlist": """
            WITH v AS (
              SELECT l_partkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))) AS val
              FROM lineitem GROUP BY 1)
            SELECT l_partkey, CAST(val AS BIGINT) AS value_e4
            FROM v
            WHERE 10 * (SELECT COUNT(*) FROM v) * val
                  > 13 * (SELECT SUM(val) FROM v)
            ORDER BY l_partkey
        """,
        "q16_supplier_variety": """
            WITH d AS (
              SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
                AND l_suppkey % 3 <> 0)
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(*) AS BIGINT) AS supplier_cnt
            FROM d GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, 1, 2, 3
        """,
        "q20_excess_shippers": """
            WITH q AS (
              SELECT l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small%'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(CAST(l_quantity AS BIGINT)) > 60)
            SELECT DISTINCT s_suppkey, s_name
            FROM supplier JOIN q ON s_suppkey = l_suppkey
            ORDER BY s_suppkey
        """,
        "nation_segment_listagg": """
            WITH d AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
            SELECT n_name,
                   string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
                   CAST(COUNT(*) AS BIGINT) AS n_segments
            FROM d JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "q21_waiting_suppliers": """
            WITH j AS (
              SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'),
            late AS (
              SELECT DISTINCT l_orderkey, l_suppkey FROM j
              WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY),
            w AS (
              SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
              WHERE EXISTS (SELECT 1 FROM j l2
                            WHERE l2.l_orderkey = l1.l_orderkey
                              AND l2.l_suppkey <> l1.l_suppkey)
                AND NOT EXISTS (SELECT 1 FROM late l3
                                WHERE l3.l_orderkey = l1.l_orderkey
                                  AND l3.l_suppkey <> l1.l_suppkey)),
            c AS (SELECT l_suppkey AS s_suppkey,
                         CAST(COUNT(*) AS BIGINT) AS numwait
                  FROM w GROUP BY 1)
            SELECT s_suppkey, s_name, numwait
            FROM c JOIN supplier USING (s_suppkey)
            ORDER BY numwait DESC, s_name
            LIMIT 25
        """,
        "q14_promo_ratio": """
            WITH j AS (
              SELECT CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4,
                     p_type = 'PROMO' AS is_promo
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-09-01'
                AND l_shipdate < TIMESTAMP '1996-10-01')
            SELECT
              CAST(COALESCE(SUM(CASE WHEN is_promo THEN rev_e4 END), 0) AS BIGINT)
                AS promo_rev_e4,
              CAST(COALESCE(SUM(rev_e4), 0) AS BIGINT) AS total_rev_e4,
              CAST(CASE WHEN COALESCE(SUM(rev_e4), 0) = 0 THEN 0
                   ELSE COALESCE(SUM(CASE WHEN is_promo THEN rev_e4 END), 0)
                        * 1000000 // SUM(rev_e4) END AS BIGINT) AS promo_ppm,
              COUNT(*) AS n_rows
            FROM j
        """,
        "events_funnel_counts": """
            WITH v AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1),
            c AS (
              SELECT e.user_id, MIN(e.ts) AS t2
              FROM events e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY 1),
            p AS (
              SELECT e.user_id, MIN(e.ts) AS t3
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY 1)
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
                     (SELECT COUNT(*) FROM v) AS n_users
              UNION ALL
              SELECT CAST(2 AS BIGINT), 'click', (SELECT COUNT(*) FROM c)
              UNION ALL
              SELECT CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM p))
        """,
        "doc_sentence_stats": r"""
            SELECT doc_id,
              CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                       x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)) <> ''))
                AS BIGINT) AS n_sentences,
              CAST(COALESCE(list_max(list_transform(
                       list_filter(regexp_split_to_array(text, '[.!?]+'),
                         x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)) <> ''),
                       x -> length(trim(x, ' ' || chr(9) || chr(10) || chr(13))))), 0)
                AS BIGINT) AS max_sentence_chars
            FROM documents
        """,
        "cust_order_dist": """
            WITH co AS (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY 1)
            SELECT c_count, COUNT(*) AS custdist
            FROM co GROUP BY 1
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
                  AS total_rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_rev_e4
            FROM rev JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
            ORDER BY s_suppkey
        """,
        "cust_idle_above_avg": """
            WITH c AS (
              SELECT c_custkey, c_mktsegment,
                     CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
              FROM customer),
            pos AS (
              SELECT COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS s
              FROM c WHERE bal_c > 0)
            SELECT c_mktsegment,
                   COUNT(*) AS n_custs,
                   CAST(SUM(bal_c) AS BIGINT) AS sum_bal_cents
            FROM c, pos
            WHERE bal_c * pos.n > pos.s
              AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-06-01')
            GROUP BY 1 ORDER BY 1
        """,
        "dedup_prefix_containment_pairs": f"""
            -- containment WITHIN opening-fingerprint buckets (the engine's
            -- candidate contract, mirrored here so parity is exact)
            WITH f AS (SELECT doc_id, text,
                md5(array_to_string(list_slice({_TOKS}, 1, 5), ' ')) AS h
              FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM f a JOIN f b ON a.h = b.h AND a.doc_id <> b.doc_id
            WHERE length(a.text) < length(b.text)
              AND starts_with(b.text, a.text)
            ORDER BY 1, 2
        """,
        "source_leakage_matrix": f"""
            WITH d AS (SELECT DISTINCT source,
                md5(array_to_string(list_slice({_TOKS}, 1, 5), ' ')) AS h
              FROM documents)
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_hashes
            FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "dedup_rate_by_source": """
            WITH pairs AS (
              SELECT source, md5(text) AS content_hash, COUNT(*) AS n_docs
              FROM documents GROUP BY 1, 2)
            SELECT source,
                   CAST(SUM(n_docs) AS BIGINT) AS n_docs,
                   COUNT(*) AS n_unique,
                   CAST((SUM(n_docs) - COUNT(*)) * 1000000 // SUM(n_docs)
                     AS BIGINT) AS dup_ppm
            FROM pairs GROUP BY 1 ORDER BY 1
        """,
        "q3_top_orders": """
            SELECT o_orderkey,
              epoch_us(o_orderdate) // 86400000000 AS o_orderdate_day,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
            ORDER BY revenue_e4 DESC, o_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "part_type_stats": """
            SELECT p_type, COUNT(*) AS n_parts,
              CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
              CAST((SUM(CAST(round(p_retailprice*100) AS BIGINT)) * 10000) // COUNT(*) AS BIGINT) AS avg_price_ppm
            FROM part GROUP BY p_type
        """,
        "top_docs_by_chars": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 50
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "semi_join_customers": """
            SELECT c_mktsegment, COUNT(*) AS n FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            GROUP BY c_mktsegment
        """,
        "anti_join_customers": """
            SELECT c_mktsegment, COUNT(*) AS n FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderdate < TIMESTAMP '1995-07-01')
            GROUP BY c_mktsegment
        """,
        "split_hash_buckets": """
            SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
                   COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "q_join_bucketed": """
            SELECT o_orderpriority,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
              COUNT(*) AS n
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "q_join_bucketed_agg": """
            SELECT o_orderkey,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4,
              COUNT(*) AS n_lines
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
        """,
        "cust_order_counts": """
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(coalesce(o.cnt, 0) AS BIGINT) AS n_orders
            FROM customer c LEFT JOIN
              (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
            ON c.c_custkey = o.o_custkey
        """,
        "top_orders_per_segment": """
            WITH j AS (
              SELECT c.c_mktsegment, o.o_orderkey,
                     CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY price_cents DESC, o_orderkey ASC) AS rank
              FROM j)
            SELECT c_mktsegment, o_orderkey, price_cents,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3
        """,
        "revenue_rollup": """
            WITH j AS (
              SELECT c.c_mktsegment AS seg, year(o.o_orderdate) AS yr,
                     CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
            SELECT coalesce(seg, 'ALL') AS c_mktsegment,
                   CAST(coalesce(yr, -1) AS BIGINT) AS o_year,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY ROLLUP(seg, yr)
        """,
        "revenue_cube": """
            WITH j AS (
              SELECT c.c_mktsegment AS seg, year(o.o_orderdate) AS yr,
                     CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
            SELECT coalesce(seg, 'ALL') AS c_mktsegment,
                   CAST(coalesce(yr, -1) AS BIGINT) AS o_year,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY CUBE(seg, yr)
        """,
        "part_pairs_top": """
            -- market-basket co-occurrence: top-20 part pairs bought in the
            -- same order (distinct parts per order; unordered pair a < b)
            WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM d a JOIN d b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, part_a, part_b
            LIMIT 20
        """,
        "part_skyline_by_brand": """
            -- per-brand Pareto frontier on (price minimize, size maximize):
            -- weak dominance with at least one strict improvement
            WITH p AS (
              SELECT p_partkey, p_brand,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
                     CAST(p_size AS BIGINT) AS p_size
              FROM part)
            SELECT p_partkey, p_brand, price_cents, p_size FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.p_brand = a.p_brand
                AND b.price_cents <= a.price_cents AND b.p_size >= a.p_size
                AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
            ORDER BY p_brand, p_partkey
        """,
        "orders_pivot_by_year": """
            SELECT c.c_mktsegment,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1992) AS BIGINT) AS y1992,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1993) AS BIGINT) AS y1993,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1994) AS BIGINT) AS y1994,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1995) AS BIGINT) AS y1995,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1996) AS BIGINT) AS y1996,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1997) AS BIGINT) AS y1997,
              CAST(COUNT(*) FILTER (WHERE year(o.o_orderdate) = 1998) AS BIGINT) AS y1998
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        "events_lag_diff": """
            SELECT event_id, user_id,
              CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id), -1)
                AS BIGINT) AS gap_us
            FROM events
        """,
        "events_moving_avg": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(round(value*100) AS BIGINT) AS cents
              FROM events)
            SELECT event_id, user_id,
              CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
              CAST(COUNT(*) OVER w AS BIGINT) AS win_n,
              CAST((SUM(cents) OVER w * 10000) // (COUNT(*) OVER w)
                AS BIGINT) AS win_avg_ppm
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "orders_above_cust_avg": """
            WITH o AS (
              SELECT o_orderkey, o_custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
              FROM orders),
            a AS (
              SELECT o_custkey, SUM(price_cents) AS s, COUNT(*) AS n
              FROM o GROUP BY 1)
            SELECT o.o_orderkey, o.o_custkey, o.price_cents
            FROM o JOIN a USING (o_custkey)
            WHERE o.price_cents * a.n > a.s
        """,
        "events_user_retention_hourly": """
            WITH p AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 3600000000 AS h
              FROM events)
            SELECT CAST(a.h AS BIGINT) AS epoch_hour,
                   CAST(COUNT(*) AS BIGINT) AS n_retained
            FROM p a JOIN p b ON a.user_id = b.user_id AND b.h = a.h + 1
            GROUP BY a.h
        """,
        "events_range_sum_1h": """
            WITH e AS (
              SELECT event_id, user_id, ts,
                     CAST(round(value*100) AS BIGINT) AS cents
              FROM events)
            SELECT event_id, user_id,
              CAST(SUM(cents) OVER w AS BIGINT) AS win_sum_cents,
              CAST(COUNT(*) OVER w AS BIGINT) AS win_n
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "events_tumbling_1h": """
            SELECT event_type,
              epoch_us(ts) // 3600000000 AS epoch_hour,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
              COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ptus
              FROM events),
            m AS (
              SELECT user_id, event_id, tus,
                     CASE WHEN ptus IS NULL OR tus - ptus > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM e),
            s AS (
              SELECT user_id,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM m),
            c AS (SELECT user_id, sid, COUNT(*) AS cnt FROM s GROUP BY 1, 2)
            SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions,
                   MAX(cnt) AS max_session_events
            FROM c GROUP BY user_id
        """,
        "events_running_total": """
            SELECT event_id, user_id,
              CAST(SUM(CAST(round(value*100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM events
        """,
        "events_hopping_1h_30m": """
            WITH fan AS (
              SELECT event_type,
                     epoch_us(ts) // 1800000000 - k AS win_start_half,
                     CAST(round(value*100) AS BIGINT) AS cents
              FROM events, (SELECT unnest([0, 1]) AS k))
            SELECT event_type, win_start_half,
                   CAST(SUM(cents) AS BIGINT) AS value_cents, COUNT(*) AS n
            FROM fan GROUP BY 1, 2
        """,
        "events_asof_last_purchase": """
            SELECT e.event_id,
                   coalesce(p.event_id, -1) AS last_purchase_id
            FROM events e
            ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events
                            WHERE event_type = 'purchase') p
            ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "events_range_join_purchase": """
            SELECT p.event_id AS purchase_id, e.event_id
            FROM events p
            JOIN events e
              ON e.user_id = p.user_id
             AND e.ts >= p.ts
             AND e.ts <= p.ts + INTERVAL 5 MINUTE
             AND e.event_id <> p.event_id
            WHERE p.event_type = 'purchase'
        """,
        "events_top_per_user": """
            SELECT user_id, event_id,
                   CAST(round(value*100) AS BIGINT) AS value_cents
            FROM (
              SELECT user_id, event_id, value,
                row_number() OVER (
                  PARTITION BY user_id
                  ORDER BY CAST(round(value*100) AS BIGINT) DESC, event_id
                ) AS rn
              FROM events)
            WHERE rn = 1
        """,
        "events_value_outliers": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(round(value*100) AS BIGINT) AS vc
                       FROM events),
            s AS (SELECT event_type,
                         CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(CAST(vc AS HUGEINT)) AS s1,
                         SUM(CAST(vc AS HUGEINT) * CAST(vc AS HUGEINT)) AS s2
                  FROM c GROUP BY 1)
            SELECT c.event_id, c.event_type, c.vc AS value_cents
            FROM c JOIN s USING (event_type)
            WHERE (CAST(c.vc AS HUGEINT) * s.n - s.s1)
                * (CAST(c.vc AS HUGEINT) * s.n - s.s1)
                > 9 * (s.n * s.s2 - s.s1 * s.s1)
        """,
        "events_new_users_hourly": """
            WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events GROUP BY 1),
            h AS (SELECT epoch_us(fts) // 3600000000 AS epoch_hour,
                         COUNT(*) AS n_new
                  FROM f GROUP BY 1)
            SELECT CAST(epoch_hour AS BIGINT) AS epoch_hour,
                   CAST(n_new AS BIGINT) AS n_new,
                   CAST(SUM(n_new) OVER (ORDER BY epoch_hour
                                         ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS cum_new
            FROM h
        """,
        "events_first_last_per_user": """
            WITH f AS (
              SELECT user_id, event_id,
                     CAST(round(value*100) AS BIGINT) AS vc,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events),
            l AS (
              SELECT user_id, event_id,
                     CAST(round(value*100) AS BIGINT) AS vc,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
            SELECT f.user_id,
                   f.event_id AS first_event_id,
                   f.vc AS first_value_cents,
                   l.event_id AS last_event_id,
                   l.vc AS last_value_cents
            FROM (SELECT * FROM f WHERE rn = 1) f
            JOIN (SELECT * FROM l WHERE rn = 1) l USING (user_id)
        """,
        "events_props_json": """
            SELECT event_id,
              CAST(coalesce(nullif(regexp_extract(props, '"k":\\s*(-?\\d+)', 1), ''), '-1') AS BIGINT) AS k
            FROM events
        """,
        "events_distinct_users_hourly": """
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS epoch_hour,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "events_value_histogram": """
            SELECT CAST(round(value*100) AS BIGINT) // 500 AS bin,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "events_session_ids": """
            WITH g AS (
              SELECT event_id, user_id, ts,
                CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id))
                     > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events)
            SELECT event_id,
              CAST(1 + SUM(brk) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS session_seq
            FROM g
        """,
        "events_top_sessions": """
            WITH g AS (
              SELECT event_id, user_id, ts,
                CAST(round(value*100) AS BIGINT) AS cents,
                CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id))
                     > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT user_id, cents,
                1 + SUM(brk) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS session_seq
              FROM g),
            sess AS (
              SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                     CAST(SUM(cents) AS BIGINT) AS session_cents,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM s GROUP BY 1, 2),
            r AS (
              SELECT *, row_number() OVER (ORDER BY session_cents DESC,
                        user_id ASC, session_seq ASC) AS rank
              FROM sess)
            SELECT user_id, session_seq, session_cents, n_events,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5
        """,
        "doc_token_stats": f"""
            SELECT doc_id, len({_TOKS}) AS n_tokens,
                   len(list_distinct({_TOKS})) AS n_uniq_tokens
            FROM documents
        """,
        "doc_top_tokens_by_lang": f"""
            WITH t AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
            c AS (SELECT lang, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
            r AS (SELECT lang, token, n,
                    row_number() OVER (PARTITION BY lang
                                       ORDER BY n DESC, token) AS rank
                  FROM c)
            SELECT lang, token, CAST(n AS BIGINT) AS n,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5
        """,
        "doc_lang_id": f"""
            WITH c AS (
              SELECT doc_id,
                len(list_filter({_TOKS}, w -> w IN ('the','and','of'))) AS en,
                len(list_filter({_TOKS}, w -> w IN ('el','la','los'))) AS es,
                len(list_filter({_TOKS}, w -> w IN ('der','und','das'))) AS de,
                len(list_filter({_TOKS}, w -> w IN ('le','les','des'))) AS fr
              FROM documents)
            SELECT doc_id, CASE
              WHEN greatest(en, es, de, fr) = 0 THEN 'und'
              WHEN en = greatest(en, es, de, fr) THEN 'en'
              WHEN es = greatest(en, es, de, fr) THEN 'es'
              WHEN de = greatest(en, es, de, fr) THEN 'de'
              ELSE 'fr' END AS lang_pred
            FROM c
        """,
        "doc_quality": f"""
            WITH c AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            r AS (
              SELECT doc_id, n_tokens,
                CASE WHEN n_tokens > 0 THEN (n_stop * 1000000) // n_tokens ELSE 0 END AS stop_ppm,
                CASE WHEN n_chars > 0 THEN (n_alpha * 1000000) // n_chars ELSE 0 END AS alpha_ppm
              FROM c)
            SELECT doc_id, n_tokens, stop_ppm, alpha_ppm,
              (4 * least(n_tokens * 10000, 1000000) + 3 * stop_ppm + 3 * alpha_ppm) // 10 AS quality_ppm
            FROM r
        """,
        "doc_fingerprint": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
              CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS n_shingles,
              CASE WHEN len(toks) >= 3 THEN
                list_min(list_transform(range(1, len(toks) - 1),
                         i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
              ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
            FROM t
        """,
        "html_visible_stats": """
            SELECT doc_id, length(text) AS raw_len,
              length(trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                         '[ \t\r\n\f\v]+', ' ', 'g'))) AS visible_len
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "dedup_keep_best": f"""
            -- keep the highest-quality duplicate (ties by min doc_id);
            -- quality_ppm is the doc_quality oracle expression verbatim
            WITH c AS (
              SELECT doc_id, md5(text) AS content_hash,
                len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id, content_hash,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END))
                // 10 AS quality_ppm
              FROM c),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY content_hash
                          ORDER BY quality_ppm DESC, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY content_hash) AS n_dups
              FROM q)
            SELECT content_hash, doc_id,
                   CAST(quality_ppm AS BIGINT) AS quality_ppm,
                   CAST(n_dups AS BIGINT) AS n_dups
            FROM r WHERE rn = 1
        """,
        "doc_pii_stats": """
            -- the synthetic corpus is PII-free, so every count is zero
            -- here; the planted-text pytest is the semantic gate (both
            -- sides run the same RE2 pattern literals)
            SELECT doc_id,
              CAST(len(regexp_extract_all(coalesce(text,''),
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
              CAST(len(regexp_extract_all(coalesce(text,''),
                '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
              CAST(len(regexp_extract_all(coalesce(text,''),
                '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn,
              CAST(len(regexp_extract_all(coalesce(text,''),
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                + len(regexp_extract_all(coalesce(text,''),
                '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                + len(regexp_extract_all(coalesce(text,''),
                '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_total
            FROM documents
        """,
        "doc_redact_terms": """
            SELECT doc_id,
              CAST(len(regexp_extract_all(coalesce(text,''),
                '\\b(customer|spark)\\b')) AS BIGINT) AS n_hits,
              regexp_replace(coalesce(text,''), '\\b(customer|spark)\\b',
                '[REDACTED]', 'g') AS text_redacted
            FROM documents
        """,
        "lineitem_weighted_median_price": """
            -- quantity-weighted median price per returnflag: smallest price
            -- whose cumulative weight reaches ceil(q * total weight); weight
            -- = quantity cents (scaling weights leaves quantiles unchanged)
            WITH v AS (
              SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(round(l_quantity * 100) AS BIGINT) AS w
              FROM lineitem),
            t AS (SELECT g, SUM(w) AS tw FROM v GROUP BY g),
            c AS (SELECT g, v, SUM(w) AS wv FROM v GROUP BY g, v),
            r AS (SELECT g, v,
                         SUM(wv) OVER (PARTITION BY g ORDER BY v) AS cum
                  FROM c)
            SELECT r.g AS l_returnflag, CAST(MIN(r.v) AS BIGINT) AS wmedian_cents
            FROM r JOIN t USING (g)
            WHERE r.cum >= (500000 * t.tw + 999999) // 1000000
            GROUP BY r.g ORDER BY r.g
        """,
        "events_value_mad_by_type": """
            -- two exact-rank medians (engine-wide lower-middle rank
            -- convention), the second over |cents - group median|
            WITH v AS (
              SELECT event_type, CAST(round(value*100) AS BIGINT) AS c
              FROM events WHERE event_type IS NOT NULL),
            r AS (
              SELECT event_type, c,
                     row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v),
            med AS (SELECT event_type, c AS med FROM r
                    WHERE rn = (500000 * n + 999999) // 1000000),
            d AS (SELECT v.event_type, abs(v.c - med.med) AS a,
                         med.med AS med
                  FROM v JOIN med USING (event_type)),
            r2 AS (
              SELECT event_type, a, med,
                     row_number() OVER (PARTITION BY event_type ORDER BY a) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM d)
            SELECT event_type, med AS median_cents, a AS mad_cents
            FROM r2 WHERE rn = (500000 * n + 999999) // 1000000
            ORDER BY event_type
        """,
        "events_value_hour_cov_by_type": """
            -- exact-integer bivariate moments (value cents vs hour of
            -- day); HUGEINT keeps the products exact and // truncates
            -- toward zero exactly like the engine's big-int trunc-div
            WITH v AS (
              SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
                     CAST(hour(ts) AS BIGINT) AS y
              FROM events WHERE event_type IS NOT NULL),
            m AS (
              SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x*y) AS sxy, SUM(y*y) AS syy
              FROM v GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
              CAST((n*sxy - sx*sy) * 1000000 // (n*n) AS BIGINT) AS cov_ppm,
              CASE WHEN n*syy - sy*sy = 0 THEN NULL
                   ELSE CAST((n*sxy - sx*sy) * 1000000 // (n*syy - sy*sy)
                             AS BIGINT) END AS slope_ppm
            FROM m ORDER BY event_type
        """,
        "corpus_filter_funnel": """
            -- cumulative filter-cascade survivor counts (stage 4 is the
            -- keeper count an exact dedup of stage-3 survivors retains)
            WITH lc AS (
              SELECT doc_id,
                len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w IN ('the','and','of'))) AS en,
                len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w IN ('el','la','los'))) AS es,
                len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w IN ('der','und','das'))) AS de,
                len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w IN ('le','les','des'))) AS fr
              FROM documents),
            l AS (
              SELECT doc_id, CASE
                WHEN greatest(en, es, de, fr) = 0 THEN 'und'
                WHEN en = greatest(en, es, de, fr) THEN 'en'
                WHEN es = greatest(en, es, de, fr) THEN 'es'
                WHEN de = greatest(en, es, de, fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
              FROM lc),
            qc AS (
              SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
                len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w IN ('the','a','and','of','to','in','is','on','for','with'))) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc),
            s AS (
              SELECT d.text,
                     (d.n_chars >= 64) AS m_min,
                     (d.n_chars >= 64 AND l.lang_pred = 'en') AS m_lang,
                     (d.n_chars >= 64 AND l.lang_pred = 'en'
                      AND q.quality_ppm >= 500000) AS m_qual
              FROM documents d
              JOIN l ON l.doc_id = d.doc_id
              JOIN q ON q.doc_id = d.doc_id)
            SELECT CAST(0 AS BIGINT) AS stage_idx, 'all' AS stage,
                   CAST(COUNT(*) AS BIGINT) AS n_docs FROM s
            UNION ALL SELECT 1, 'min_chars',
                   CAST(SUM(CASE WHEN m_min THEN 1 ELSE 0 END) AS BIGINT) FROM s
            UNION ALL SELECT 2, 'lang_en',
                   CAST(SUM(CASE WHEN m_lang THEN 1 ELSE 0 END) AS BIGINT) FROM s
            UNION ALL SELECT 3, 'quality',
                   CAST(SUM(CASE WHEN m_qual THEN 1 ELSE 0 END) AS BIGINT) FROM s
            UNION ALL SELECT 4, 'unique',
                   CAST(COUNT(DISTINCT CASE WHEN m_qual THEN text END) AS BIGINT) FROM s
            ORDER BY stage_idx
        """,
        "dedup_editdistance_pairs": """
            -- typo-grade near-dup pairs: same lang + same first-8-chars
            -- block, UTF-8-byte levenshtein <= 8 (blocking identical to
            -- the engine; edits inside the prefix are out of scope on
            -- BOTH sides by design)
            WITH b AS (
              SELECT doc_id, text, lang, substr(text, 1, 8) AS pfx
              FROM documents
              WHERE lang IS NOT NULL AND text IS NOT NULL)
            SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
                   CAST(levenshtein(a.text, c.text) AS BIGINT) AS edit_dist
            FROM b a JOIN b c
              ON a.lang = c.lang AND a.pfx = c.pfx AND a.doc_id < c.doc_id
            WHERE levenshtein(a.text, c.text) <= 8
        """,
        "dedup_lines": """
            -- C4-style global line dedup: a "line" is a fixed 16-token
            -- chunk (the corpus has no newlines); each chunk keeps only
            -- its first (doc_id, chunk_idx) occurrence corpus-wide and
            -- docs are rebuilt from their surviving chunks in order
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS w
              FROM documents),
            idx AS (
              SELECT doc_id, w,
                     unnest(generate_series(0,
                       CAST((len(w)-1)//16 AS BIGINT))) AS i
              FROM toks WHERE len(w) > 0),
            chunks AS (
              SELECT doc_id, i AS chunk_idx,
                     array_to_string(w[(i*16+1):((i+1)*16)], ' ') AS chunk
              FROM idx),
            win AS (
              SELECT doc_id, chunk_idx, chunk,
                     row_number() OVER (PARTITION BY md5(chunk)
                       ORDER BY doc_id, chunk_idx) AS rn
              FROM chunks)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CAST(rn = 1 AS INT)) AS BIGINT) AS n_kept,
                   COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END,
                            ' ' ORDER BY chunk_idx), '') AS text_clean
            FROM win GROUP BY doc_id
        """,
        "dedup_incremental_ingest": """
            WITH day1 AS (
              SELECT DISTINCT md5(text) AS h FROM documents
              WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                    AS BIGINT) < 8),
            day2 AS (
              SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
                     COUNT(*) AS n_dups
              FROM documents
              WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                    AS BIGINT) >= 8
              GROUP BY 1)
            SELECT content_hash, doc_id, n_dups FROM day2
            WHERE content_hash NOT IN (SELECT h FROM day1)
        """,
        "doc_tfidf_top_terms": f"""
            WITH t AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
            tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM t GROUP BY 1, 2),
            df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                   FROM t GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.w AS term, tf.tf,
                         tf.tf * ((SELECT n FROM n) * 1000000 // df.df) AS score
                  FROM tf JOIN df ON tf.w = df.w),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term ASC) AS rank FROM s)
            SELECT doc_id, term, tf, CAST(score AS BIGINT) AS score,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3
        """,
        "corpus_filter_funnel_gopher": f"""
            -- dataset-card retention funnel; stage-2 thresholds are the
            -- doc_repetition_stats literals (shared repetition_ppms
            -- kernel), stage 3 = distinct md5(text) of stage-2 survivors
            WITH u AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
            c AS (SELECT doc_id, w, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
            s AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS n_uniq,
                         MAX(cnt) AS top
                  FROM c GROUP BY 1),
            flags AS (
              SELECT d.doc_id, d.text,
                (s.doc_id IS NOT NULL) AS s1,
                COALESCE(s.top * 1000000 // s.n <= 200000
                         AND (s.n - s.n_uniq) * 1000000 // s.n <= 600000,
                         FALSE) AS s2
              FROM documents d LEFT JOIN s USING (doc_id))
            SELECT CAST(stage AS BIGINT) AS stage,
                   CAST(n_docs AS BIGINT) AS n_docs FROM (
              SELECT 0 AS stage, COUNT(*) AS n_docs FROM flags
              UNION ALL SELECT 1, COUNT(*) FROM flags WHERE s1
              UNION ALL SELECT 2, COUNT(*) FROM flags WHERE s2
              UNION ALL SELECT 3, COUNT(DISTINCT md5(COALESCE(text, '')))
                        FROM flags WHERE s2)
        """,
        "corpus_clean_keep": f"""
            WITH lc AS (
              SELECT doc_id,
                len(list_filter({_TOKS}, w -> w IN ('the','and','of'))) AS en,
                len(list_filter({_TOKS}, w -> w IN ('el','la','los'))) AS es,
                len(list_filter({_TOKS}, w -> w IN ('der','und','das'))) AS de,
                len(list_filter({_TOKS}, w -> w IN ('le','les','des'))) AS fr
              FROM documents),
            l AS (
              SELECT doc_id, CASE
                WHEN greatest(en, es, de, fr) = 0 THEN 'und'
                WHEN en = greatest(en, es, de, fr) THEN 'en'
                WHEN es = greatest(en, es, de, fr) THEN 'es'
                WHEN de = greatest(en, es, de, fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
              FROM lc),
            qc AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc),
            f AS (
              SELECT d.doc_id, d.text, q.quality_ppm
              FROM documents d
              JOIN l ON l.doc_id = d.doc_id
              JOIN q ON q.doc_id = d.doc_id
              WHERE l.lang_pred = 'en' AND q.quality_ppm >= 500000)
            SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
                   COUNT(*) AS n_dups, MIN(quality_ppm) AS quality_ppm
            FROM f GROUP BY 1
        """,
        "pack_sequences": f"""
            WITH t AS (
              SELECT doc_id,
                CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                CAST(strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS part
              FROM documents),
            c AS (
              SELECT doc_id, part,
                SUM(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_before
              FROM t)
            SELECT doc_id, part,
              CAST(tok_before // 2048 AS BIGINT) AS seq_id,
              CAST(tok_before % 2048 AS BIGINT) AS seq_offset
            FROM c
        """,
        "pack_fragmentation_report": f"""
            -- windows spanned by a doc starting at in-window offset o
            -- with n tokens: (o + n - 1) // 2048 + 1; zero-token docs
            -- occupy no window (pipelines/corpus.py literals)
            WITH t AS (
              SELECT doc_id,
                CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                CAST(strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS part
              FROM documents),
            c AS (
              SELECT doc_id, n_tokens,
                SUM(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS tok_before
              FROM t),
            f AS (
              SELECT ((tok_before % 2048) + n_tokens - 1) // 2048 + 1 AS w
              FROM c WHERE n_tokens > 0)
            SELECT COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN w >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_split,
              CAST(SUM(CASE WHEN w >= 2 THEN 1 ELSE 0 END) * 1000000
                   // COUNT(*) AS BIGINT) AS split_ppm,
              CAST(MAX(w) AS BIGINT) AS max_windows
            FROM f
        """,
        "pack_sequences_global": f"""
            WITH t AS (
              SELECT doc_id,
                CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                CAST(strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS part
              FROM documents),
            c AS (
              SELECT doc_id, part,
                SUM(n_tokens) OVER (ORDER BY part, doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS gbefore
              FROM t)
            SELECT doc_id, part,
              CAST(gbefore // 2048 AS BIGINT) AS seq_id,
              CAST(gbefore % 2048 AS BIGINT) AS seq_offset
            FROM c
        """,
        "ngram_jaccard_consecutive": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 3 THEN
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                     ELSE CAST([] AS VARCHAR[]) END AS sh
              FROM t)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CASE WHEN (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0
                   THEN (len(list_intersect(a.sh, b.sh)) * 1000000)
                        // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                   ELSE 0 END AS jaccard_ppm
            FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        """,
        "embedding_label_centroids": """
            WITH e AS (
              SELECT vec_id, CAST(label AS BIGINT) AS label,
                     CAST(i - 1 AS BIGINT) AS dim,
                     CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS BIGINT) AS fp
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i))
            SELECT label, dim,
                   CAST(SUM(fp) // COUNT(*) AS BIGINT) AS centroid_fp
            FROM e GROUP BY 1, 2
        """,
        "embedding_centroid_confusion": """
            WITH e AS (
              SELECT vec_id, CAST(label AS BIGINT) AS label_true,
                     CAST(i - 1 AS BIGINT) AS dim,
                     CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS BIGINT) AS fp
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)),
            c AS (
              SELECT label_true AS label, dim,
                     CAST(SUM(fp) // COUNT(*) AS BIGINT) AS cfp
              FROM e GROUP BY 1, 2),
            d AS (
              SELECT e.vec_id, ANY_VALUE(e.label_true) AS label_true,
                     c.label AS cand, SUM(e.fp * c.cfp) AS dot
              FROM e JOIN c ON c.dim = e.dim
              GROUP BY e.vec_id, c.label),
            p AS (
              SELECT vec_id, label_true, cand,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dot DESC, cand ASC) AS rn
              FROM d)
            SELECT label_true, cand AS label_pred,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM p WHERE rn = 1 GROUP BY 1, 2
        """,
        "doc_lang_confusion": f"""
            WITH lc AS (
              SELECT doc_id,
                len(list_filter({_TOKS}, w -> w IN ('the','and','of'))) AS en,
                len(list_filter({_TOKS}, w -> w IN ('el','la','los'))) AS es,
                len(list_filter({_TOKS}, w -> w IN ('der','und','das'))) AS de,
                len(list_filter({_TOKS}, w -> w IN ('le','les','des'))) AS fr
              FROM documents),
            l AS (
              SELECT doc_id, CASE
                WHEN greatest(en, es, de, fr) = 0 THEN 'und'
                WHEN en = greatest(en, es, de, fr) THEN 'en'
                WHEN es = greatest(en, es, de, fr) THEN 'es'
                WHEN de = greatest(en, es, de, fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
              FROM lc)
            SELECT d.lang AS lang_true, l.lang_pred,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents d JOIN l ON l.doc_id = d.doc_id
            GROUP BY 1, 2
        """,
        "doc_length_histogram": """
            SELECT n_chars // 200 AS bin, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        """,
        "doc_bigram_top": f"""
            WITH t AS (
              SELECT doc_id, unnest({_TOKS}) AS token,
                     generate_subscripts({_TOKS}, 1) AS pos
              FROM documents),
            b AS (
              SELECT a.token || ' ' || c.token AS bigram, COUNT(*) AS n
              FROM t a JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1
              GROUP BY 1),
            r AS (
              SELECT bigram, n,
                     row_number() OVER (ORDER BY n DESC, bigram) AS rank
              FROM b)
            SELECT bigram, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10
        """,
        "source_token_jaccard": f"""
            WITH p AS (
              SELECT DISTINCT source, unnest({_TOKS}) AS token FROM documents),
            sz AS (SELECT source, COUNT(*) AS n FROM p GROUP BY 1),
            i AS (
              SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
              FROM p a JOIN p b ON a.token = b.token AND a.source < b.source
              GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
                   CAST(sa.n + sb.n - inter AS BIGINT) AS uni,
                   CAST((inter * 1000000) // (sa.n + sb.n - inter) AS BIGINT)
                     AS jaccard_ppm
            FROM i
            JOIN sz sa ON sa.source = i.src_a
            JOIN sz sb ON sb.source = i.src_b
        """,
        "doc_ntile_by_chars": """
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                     AS rank,
                   CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                     AS tile
            FROM documents
        """,
        "vocab_freq_spectrum": f"""
            WITH t AS (SELECT unnest({_TOKS}) AS token FROM documents),
            c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY 1)
            SELECT CAST(n AS BIGINT) AS occurrences,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM c GROUP BY 1
        """,
        "q12_priority_by_returnflag": """
            -- TPC-H Q12 shape over this schema (no l_shipmode): line
            -- counts by order priority class per returnflag
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1996-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "lineitem_unpivot": """
            -- UNPIVOT (melt): the four lineitem measures as long rows
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   'quantity' AS measure,
                   CAST(round(l_quantity*100) AS BIGINT) AS value_cents
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                   'extendedprice',
                   CAST(round(l_extendedprice*100) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                   'discount',
                   CAST(round(l_discount*100) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                   'tax',
                   CAST(round(l_tax*100) AS BIGINT)
            FROM lineitem
        """,
        "events_cume_dist_by_type": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(round(value*100) AS BIGINT) AS value_cents
              FROM events),
            r AS (
              SELECT event_id, event_type, value_cents,
                     COUNT(*) OVER (PARTITION BY event_type
                                    ORDER BY value_cents) AS cum_le,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM c)
            SELECT event_id, event_type, value_cents,
                   CAST((cum_le * 1000000) // n AS BIGINT) AS cume_ppm
            FROM r
        """,
        "events_dense_rank_by_type": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(round(value*100) AS BIGINT) AS value_cents
              FROM events)
            SELECT event_id, event_type, value_cents,
                   CAST(DENSE_RANK() OVER (PARTITION BY event_type
                                           ORDER BY value_cents) AS BIGINT)
                     AS drank
            FROM c
        """,
        "events_percent_rank_by_type": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(round(value*100) AS BIGINT) AS value_cents
              FROM events),
            r AS (
              SELECT event_id, event_type, value_cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value_cents, event_id) AS rank,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM c)
            SELECT event_id, event_type, value_cents,
                   CAST(rank AS BIGINT) AS rank,
                   CAST(CASE WHEN n > 1
                        THEN ((rank - 1) * 1000000) // (n - 1)
                        ELSE 0 END AS BIGINT) AS prank_ppm
            FROM r
        """,
        "doc_oov_rate": f"""
            WITH t AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY 1),
            v AS (SELECT token FROM c ORDER BY n DESC, token LIMIT 16),
            d AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     SUM(CASE WHEN token IN (SELECT token FROM v)
                         THEN 0 ELSE 1 END) AS n_oov
              FROM t GROUP BY 1)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_oov AS BIGINT) AS n_oov,
                   CAST((n_oov * 1000000) // n_tokens AS BIGINT) AS oov_ppm
            FROM d
        """,
        "source_quality_report": f"""
            WITH lc AS (
              SELECT doc_id,
                len(list_filter({_TOKS}, w -> w IN ('the','and','of'))) AS en,
                len(list_filter({_TOKS}, w -> w IN ('el','la','los'))) AS es,
                len(list_filter({_TOKS}, w -> w IN ('der','und','das'))) AS de,
                len(list_filter({_TOKS}, w -> w IN ('le','les','des'))) AS fr
              FROM documents),
            l AS (
              SELECT doc_id, CASE
                WHEN greatest(en, es, de, fr) = 0 THEN 'und'
                WHEN en = greatest(en, es, de, fr) THEN 'en'
                WHEN es = greatest(en, es, de, fr) THEN 'es'
                WHEN de = greatest(en, es, de, fr) THEN 'de'
                ELSE 'fr' END AS lang_pred
              FROM lc),
            qc AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc)
            SELECT d.source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(DISTINCT md5(d.text)) AS BIGINT) AS n_unique,
              CAST(SUM(q.quality_ppm) // COUNT(*) AS BIGINT) AS avg_quality_ppm,
              CAST(SUM(CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_en
            FROM documents d
            JOIN l ON l.doc_id = d.doc_id
            JOIN q ON q.doc_id = d.doc_id
            GROUP BY d.source
        """,
        "source_quality_floor_keep": f"""
            WITH qc AS (
              SELECT d.source, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents d),
            q AS (
              SELECT source,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc),
            r AS (
              SELECT source, quality_ppm,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY quality_ppm) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM q),
            t AS (
              SELECT source,
                     MAX(CASE WHEN rn = (250000 * n + 999999) // 1000000
                         THEN quality_ppm END) AS threshold_ppm
              FROM r GROUP BY 1)
            SELECT r.source,
                   CAST(MAX(r.n) AS BIGINT) AS n_docs,
                   CAST(MAX(t.threshold_ppm) AS BIGINT) AS threshold_ppm,
                   CAST(SUM(CASE WHEN r.quality_ppm >= t.threshold_ppm
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
            FROM r JOIN t USING (source)
            GROUP BY 1 ORDER BY 1
        """,
        "corpus_token_budget_cut": f"""
            -- token-budget quality cut: highest quality cutoff whose docs
            -- carry >= 10000 tokens (the engine's TOKEN_BUDGET), then keep
            -- stats over docs at/above it; COALESCE fallback = keep all
            WITH qc AS (
              SELECT len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT n_tokens,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc),
            lv AS (SELECT quality_ppm, SUM(n_tokens) AS tok
                   FROM q GROUP BY quality_ppm),
            cum AS (SELECT quality_ppm,
                           SUM(tok) OVER (ORDER BY quality_ppm DESC) AS c
                    FROM lv),
            cut AS (SELECT coalesce(
                      MAX(quality_ppm) FILTER (WHERE c >= 10000),
                      (SELECT MIN(quality_ppm) FROM q)) AS cq FROM cum)
            SELECT CAST((SELECT cq FROM cut) AS BIGINT) AS cutoff_quality_ppm,
                   CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
                   CAST(SUM(q.n_tokens) AS BIGINT) AS tokens_kept
            FROM q WHERE q.quality_ppm >= (SELECT cq FROM cut)
        """,
        "source_token_weighted_median_quality": f"""
            -- per-source token-weighted median quality: smallest quality
            -- whose cumulative token mass reaches ceil(W/2); an all-zero-
            -- token source resolves at its first value (cum >= 0)
            WITH qc AS (
              SELECT d.source, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents d),
            q AS (
              SELECT source, n_tokens,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc),
            t AS (SELECT source, SUM(n_tokens) AS tw FROM q GROUP BY source),
            c AS (SELECT source, quality_ppm AS v, SUM(n_tokens) AS wv
                  FROM q GROUP BY source, quality_ppm),
            r AS (SELECT source, v,
                         SUM(wv) OVER (PARTITION BY source ORDER BY v) AS cum
                  FROM c)
            SELECT r.source,
                   CAST(MIN(r.v) AS BIGINT) AS wmedian_quality_ppm,
                   CAST(MIN(t.tw) AS BIGINT) AS n_tokens
            FROM r JOIN t USING (source)
            WHERE r.cum >= (500000 * t.tw + 999999) // 1000000
            GROUP BY r.source ORDER BY r.source
        """,
        "embedding_label_quality": f"""
            -- cross-modal join: text quality of the docs behind each
            -- embedding label; integer mean (quality non-negative)
            WITH qc AS (
              SELECT doc_id, len({_TOKS}) AS n_tokens,
                len(list_filter({_TOKS}, w -> w IN {_STOPS})) AS n_stop,
                length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
                length(text) AS n_chars
              FROM documents),
            q AS (
              SELECT doc_id,
                (4 * least(n_tokens * 10000, 1000000)
                 + 3 * (CASE WHEN n_tokens > 0
                        THEN (n_stop * 1000000) // n_tokens ELSE 0 END)
                 + 3 * (CASE WHEN n_chars > 0
                        THEN (n_alpha * 1000000) // n_chars ELSE 0 END)) // 10
                  AS quality_ppm
              FROM qc)
            SELECT CAST(e.label AS BIGINT) AS label,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(q.quality_ppm) // COUNT(*) AS BIGINT)
                     AS avg_quality_ppm
            FROM embeddings e JOIN q ON e.vec_id = q.doc_id
            GROUP BY e.label ORDER BY label
        """,
        "events_transition_counts": """
            -- Markov edges over per-user event sequences ordered by
            -- (ts, event_id); first events have no predecessor
            WITH s AS (
              SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type
              FROM events)
            SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            ORDER BY prev_type, event_type
        """,
        "events_user_streaks": """
            -- gaps-and-islands: maximal runs of consecutive active hours
            -- per user (h - ROW_NUMBER() island trick)
            WITH hours AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 3600000000 AS h
              FROM events),
            grp AS (
              SELECT user_id, h,
                     h - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h)
                       AS g
              FROM hours),
            streaks AS (
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
              FROM grp GROUP BY user_id, g)
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_streaks,
                   CAST(MAX(len) AS BIGINT) AS max_streak_hours,
                   CAST(SUM(len) AS BIGINT) AS active_hours
            FROM streaks GROUP BY user_id ORDER BY user_id
        """,
        "events_debounce_counts": """
            -- LAG-gap debounce: dropped when the same (user, type) chain
            -- fired within the previous 30 s (raw-LAG semantics, the SQL
            -- formulation — not anchored to the last KEPT event)
            WITH o AS (
              SELECT event_type,
                     epoch_us(ts) - epoch_us(LAG(ts) OVER
                       (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id)) AS gap_us
              FROM events)
            SELECT event_type,
                   CAST(COUNT(*) FILTER (WHERE gap_us IS NULL
                                            OR gap_us > 30000000)
                        AS BIGINT) AS n_kept,
                   CAST(COUNT(*) FILTER (WHERE gap_us IS NOT NULL
                                           AND gap_us <= 30000000)
                        AS BIGINT) AS n_dropped
            FROM o GROUP BY 1 ORDER BY 1
        """,
        "events_time_to_purchase": """
            WITH u AS (
              SELECT user_id, MIN(epoch_us(ts)) AS f,
                     MIN(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END) AS p
              FROM events GROUP BY 1)
            SELECT CAST(CASE WHEN p IS NULL THEN -1
                             ELSE (p - f) // 3600000000 END AS BIGINT)
                     AS hours_to_purchase,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM u GROUP BY 1 ORDER BY 1
        """,
        "events_session_size_histogram": """
            -- 30-min-gap sessionization (strictly-greater gap, the shared
            -- engine contract), then count sessions by event count
            WITH o AS (
              SELECT user_id, ts, event_id,
                     LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events),
            m AS (
              SELECT user_id,
                     SUM(CASE WHEN prev_ts IS NULL
                              OR epoch_us(ts) - epoch_us(prev_ts)
                                 > 1800000000 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid,
                     ts, event_id
              FROM o),
            z AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n
                  FROM m GROUP BY 1, 2)
            SELECT n AS session_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM z GROUP BY 1 ORDER BY 1
        """,
        "events_user_journey_paths": """
            WITH p AS (
              SELECT user_id,
                     array_to_string(
                       list_slice(list(event_type ORDER BY ts, event_id),
                                  1, 8), '>') AS path
              FROM events GROUP BY user_id)
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "events_type_drift_chi2": """
            -- exact integer chi-square per day vs the corpus type mix:
            -- identical floor-division order as the engine (per-cell
            -- (o*N - n_d*n_t)^2 // (n_d*n_t), day sum // N); HUGEINT
            -- casts keep the squared term exact
            WITH c AS (
              SELECT event_type AS t, epoch_us(ts) // 86400000000 AS d,
                     CAST(COUNT(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
            nd AS (SELECT d, SUM(o) AS n_d FROM c GROUP BY 1),
            nt AS (SELECT t, SUM(o) AS n_t FROM c GROUP BY 1),
            g AS (SELECT SUM(o) AS n FROM c),
            grid AS (
              SELECT nd.d, nt.t, nd.n_d, nt.n_t, COALESCE(c.o, 0) AS o
              FROM nd CROSS JOIN nt LEFT JOIN c ON c.d = nd.d AND c.t = nt.t)
            SELECT d AS day,
                   CAST(SUM((CAST(o AS HUGEINT) * (SELECT n FROM g)
                             - CAST(n_d AS HUGEINT) * n_t)
                            * (CAST(o AS HUGEINT) * (SELECT n FROM g)
                               - CAST(n_d AS HUGEINT) * n_t)
                            // (CAST(n_d AS HUGEINT) * n_t))
                        // (SELECT n FROM g) AS BIGINT) AS chi2_scaled
            FROM grid GROUP BY 1 ORDER BY 1
        """,
        "events_scd2_intervals": """
            -- SCD2 run compaction: LAG change marker -> running-SUM island
            -- id -> per-run aggregates -> LEAD of the next run's start;
            -- the user's final run closes at its own last event ts
            WITH e AS (
              SELECT user_id, ts, event_id, event_type,
                     LAG(event_type) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS pt
              FROM events),
            m AS (
              SELECT *, SUM(CASE WHEN pt IS NULL OR pt <> event_type
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
              FROM e),
            r AS (
              SELECT user_id, run_id, MIN(event_type) AS event_type,
                     MIN(ts) AS valid_from, MAX(ts) AS last_ts,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM m GROUP BY 1, 2)
            SELECT user_id, event_type, valid_from,
                   COALESCE(LEAD(valid_from) OVER
                              (PARTITION BY user_id ORDER BY run_id),
                            last_ts) AS valid_to,
                   n_events
            FROM r ORDER BY user_id, run_id
        """,
        "events_user_coverage": """
            -- interval union per user: event occupies [ts, ts + value sec]
            -- (exact: cents * 10000 us); cumulative-MAX window splits
            -- islands, merged intervals counted and length-summed
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts)
                       + CAST(round(value * 100) AS BIGINT) * 10000 AS e
              FROM events),
            m AS (
              SELECT user_id, s, e,
                     MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pmax
              FROM iv),
            f AS (
              SELECT user_id, s, e,
                     CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
                       AS brk
              FROM m),
            g AS (
              SELECT user_id, s, e,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS UNBOUNDED PRECEDING) AS gid
              FROM f),
            merged AS (
              SELECT user_id, MIN(s) AS ms, MAX(e) AS me
              FROM g GROUP BY user_id, gid)
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_intervals,
                   CAST(SUM(me - ms) AS BIGINT) AS covered_us
            FROM merged GROUP BY user_id ORDER BY user_id
        """,
        "events_missing_hours": """
            -- calendar-spine anti-join: hours in the corpus' global span
            -- where a type logged zero events (gap / silent-sensor shape)
            WITH b AS (
              SELECT epoch_us(min(ts)) // 3600000000 AS lo,
                     epoch_us(max(ts)) // 3600000000 AS hi
              FROM events),
            types AS (SELECT DISTINCT event_type FROM events),
            spine AS (
              SELECT t.event_type, CAST(u.h AS BIGINT) AS epoch_hour
              FROM types t,
                   (SELECT UNNEST(generate_series(lo, hi)) AS h FROM b) u),
            present AS (
              SELECT DISTINCT event_type,
                     epoch_us(ts) // 3600000000 AS epoch_hour
              FROM events)
            SELECT s.event_type, s.epoch_hour
            FROM spine s LEFT JOIN present p
              ON s.event_type = p.event_type
             AND s.epoch_hour = p.epoch_hour
            WHERE p.epoch_hour IS NULL
            ORDER BY s.event_type, s.epoch_hour
        """,
        "nation_revenue_share": """
            -- ratio-to-report: nation revenue as exact ppm of its region
            WITH rev AS (
              SELECT c.c_nationkey AS nk,
                     CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY c.c_nationkey),
            j AS (
              SELECT r.r_name, n.n_name, rev.cents,
                     SUM(rev.cents) OVER (PARTITION BY r.r_name)
                       AS region_cents
              FROM rev JOIN nation n ON rev.nk = n.n_nationkey
                       JOIN region r ON n.n_regionkey = r.r_regionkey)
            SELECT r_name, n_name,
                   CAST(cents AS BIGINT) AS revenue_cents,
                   CAST(cents * 1000000 // region_cents AS BIGINT)
                     AS share_ppm
            FROM j ORDER BY r_name, n_name
        """,
        "events_rolling_7d_users": """
            -- trailing 7-day distinct active users per day (rolling WAU):
            -- expand each distinct (user, day) to its 7 covered window
            -- days, clip at the corpus max day, count distinct pairs
            WITH p AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events),
            b AS (SELECT max(day) AS hi FROM p),
            e AS (
              SELECT DISTINCT p.user_id, p.day + t.i AS day
              FROM p, generate_series(0, 6) AS t(i), b
              WHERE p.day + t.i <= b.hi)
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM e GROUP BY day ORDER BY day
        """,
        "embedding_norm_quantiles": """
            -- exact p01/median/p99 of the SQUARED L2 norm (ppm units):
            -- elements to fixed-point ppm first, ceil(q*n) order stats.
            -- CAST AS DOUBLE before the multiply: the engine widens the
            -- float32 elements to float64 first; DuckDB's FLOAT * int
            -- stays single-precision and rounds a few elements off-by-1
            WITH v AS (
              SELECT list_sum(list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                              AS BIGINT)
                            * CAST(round(CAST(x AS DOUBLE) * 1000000)
                              AS BIGINT)))
                     // 1000000 AS v
              FROM embeddings),
            r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v)
            SELECT CAST(q.q AS BIGINT) AS q_ppm,
                   CAST((SELECT v FROM r, n
                         WHERE rn = (q.q * n.n + 999999) // 1000000)
                     AS BIGINT) AS sqnorm_fp
            FROM (VALUES (10000), (500000), (990000)) AS q(q)
            ORDER BY q_ppm
        """,
        "orders_denormalized": """
            -- star flatten: every order enriched with its customer's
            -- segment and nation/region names
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                     AS price_cents,
                   c.c_mktsegment, n.n_name, r.r_name
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "part_cheapest_supplier": """
            -- Q2's correlated min: per part, the cheapest observed unit
            -- price (exact millicents) and its supplier (ties: min key)
            WITH u AS (
              SELECT l_partkey, l_suppkey,
                CAST(round(l_extendedprice * 100) AS BIGINT) * 100000
                  // CAST(round(l_quantity * 100) AS BIGINT) AS unit_mc
              FROM lineitem),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY l_partkey
                          ORDER BY unit_mc, l_suppkey) AS rn
              FROM u)
            SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                   CAST(l_suppkey AS BIGINT) AS l_suppkey,
                   CAST(unit_mc AS BIGINT) AS unit_mc
            FROM r WHERE rn = 1
        """,
        "events_user_ltv_cohort": """
            -- cohort LTV matrix: first-activity-day cohorts x day offset
            WITH e AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events),
            f AS (SELECT user_id, min(day) AS cohort FROM e
                  GROUP BY user_id),
            j AS (
              SELECT e.user_id, f.cohort, e.day - f.cohort AS off, e.c
              FROM e JOIN f USING (user_id))
            SELECT CAST(cohort AS BIGINT) AS cohort_day,
                   CAST(off AS BIGINT) AS day_offset,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(SUM(c) AS BIGINT) AS revenue_cents
            FROM j GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_benford_first_digit": """
            -- Benford probe: leading digit of positive value cents
            WITH v AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
              WHERE round(value * 100) > 0)
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM v GROUP BY 1 ORDER BY 1
        """,
        "orders_mom_growth": """
            -- month-over-month revenue growth (signed ppm, trunc //),
            -- LAG over the month-grain aggregate; first month NULL
            WITH m AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS yyyymm,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS revenue_cents
              FROM orders GROUP BY 1)
            SELECT CAST(yyyymm AS BIGINT) AS yyyymm, n_orders,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST((revenue_cents - lag(revenue_cents)
                           OVER (ORDER BY yyyymm)) * 1000000
                        // lag(revenue_cents) OVER (ORDER BY yyyymm)
                     AS BIGINT) AS growth_ppm
            FROM m ORDER BY yyyymm
        """,
        "events_dow_hour_heatmap": """
            -- dayofweek: Sunday = 0 (matches the engine's
            -- (epoch_days + 4) % 7); tz-naive timestamps on both sides
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_user_value_decayed": """
            -- step half-life decay (1 day, functions/windows.py
            -- DECAY_HALF_LIFE_DAYS): floor-halve each event's cents once
            -- per day of age vs the corpus max ts, shift capped at 62;
            -- age in exact floor microsecond-days (NOT calendar
            -- date_diff)
            WITH m AS (SELECT MAX(ts) AS mx FROM events)
            SELECT user_id,
              CAST(SUM(CAST(round(value * 100) AS BIGINT)
                   // (CAST(1 AS BIGINT) <<
                       LEAST((epoch_us(mx) - epoch_us(ts)) // 86400000000,
                             62))) AS BIGINT) AS decayed_cents,
              COUNT(*) AS n_events
            FROM events, m GROUP BY user_id
        """,
        "events_rolling_max_24h": """
            -- sliding extrema over the hour-grain series: max hourly
            -- count in the trailing 24 present hours, per type
            WITH h AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS epoch_hour,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
            SELECT event_type, CAST(epoch_hour AS BIGINT) AS epoch_hour, n,
                   CAST(MAX(n) OVER (PARTITION BY event_type
                          ORDER BY epoch_hour
                          RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS rolling_max_n
            FROM h ORDER BY event_type, epoch_hour
        """,
        "events_hourly_spike_by_type": """
            -- screaming-sensor report: hottest hour vs mean hourly rate
            WITH h AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
                     COUNT(*) AS n
              FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(MAX(n) AS BIGINT) AS max_hour_n,
                   CAST(SUM(n) AS BIGINT) AS total_n,
                   CAST(MAX(n) * 1000000 * COUNT(*) // SUM(n) AS BIGINT)
                     AS spike_ratio_ppm
            FROM h GROUP BY event_type ORDER BY event_type
        """,
        "documents_assertions": """
            -- dbt-style row-level assertions: fixed six-row violation
            -- report (zeroes included) over the documents table
            WITH dup AS (
              SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v FROM (
                SELECT COUNT(*) AS cnt FROM documents
                WHERE doc_id IS NOT NULL
                GROUP BY doc_id HAVING COUNT(*) > 1))
            SELECT 'dup_doc_id_rows' AS check_name, v AS n_violations
            FROM dup
            UNION ALL SELECT 'empty_text',
              CAST(COUNT(*) FILTER (WHERE text = '') AS BIGINT)
              FROM documents
            UNION ALL SELECT 'n_chars_mismatch',
              CAST(COUNT(*) FILTER (WHERE text IS NOT NULL
                   AND length(text) != n_chars) AS BIGINT)
              FROM documents
            UNION ALL SELECT 'null_doc_id',
              CAST(COUNT(*) FILTER (WHERE doc_id IS NULL) AS BIGINT)
              FROM documents
            UNION ALL SELECT 'null_source',
              CAST(COUNT(*) FILTER (WHERE source IS NULL) AS BIGINT)
              FROM documents
            UNION ALL SELECT 'null_text',
              CAST(COUNT(*) FILTER (WHERE text IS NULL) AS BIGINT)
              FROM documents
            ORDER BY check_name
        """,
        "cust_rfm_segments": """
            -- RFM terciles, value-boundary convention (tier = 1 +
            -- boundaries strictly below; ceil(q*n) order-stat boundaries)
            WITH c AS (
              SELECT o_custkey,
                     max(epoch_us(o_orderdate) // 86400000000) AS r,
                     CAST(COUNT(*) AS BIGINT) AS f,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
              FROM orders GROUP BY o_custkey),
            n AS (SELECT COUNT(*) AS n FROM c),
            rr AS (SELECT r AS v, row_number() OVER (ORDER BY r) AS rn FROM c),
            ff AS (SELECT f AS v, row_number() OVER (ORDER BY f) AS rn FROM c),
            mm AS (SELECT m AS v, row_number() OVER (ORDER BY m) AS rn FROM c),
            b AS (SELECT
              (SELECT v FROM rr, n WHERE rn = (333333*n.n+999999)//1000000) AS rb1,
              (SELECT v FROM rr, n WHERE rn = (666667*n.n+999999)//1000000) AS rb2,
              (SELECT v FROM ff, n WHERE rn = (333333*n.n+999999)//1000000) AS fb1,
              (SELECT v FROM ff, n WHERE rn = (666667*n.n+999999)//1000000) AS fb2,
              (SELECT v FROM mm, n WHERE rn = (333333*n.n+999999)//1000000) AS mb1,
              (SELECT v FROM mm, n WHERE rn = (666667*n.n+999999)//1000000) AS mb2)
            SELECT
              CAST(1 + CAST(c.r > b.rb1 AS INT)
                     + CAST(c.r > b.rb2 AS INT) AS BIGINT) AS r_tier,
              CAST(1 + CAST(c.f > b.fb1 AS INT)
                     + CAST(c.f > b.fb2 AS INT) AS BIGINT) AS f_tier,
              CAST(1 + CAST(c.m > b.mb1 AS INT)
                     + CAST(c.m > b.mb2 AS INT) AS BIGINT) AS m_tier,
              CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM c, b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "cust_revenue_deciles": """
            -- Lorenz table: customers NTILE(10)-ranked by lifetime spend
            -- (ties broken by custkey), per-decile revenue share in ppm
            WITH r AS (
              SELECT o_custkey,
                     SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY o_custkey),
            t AS (
              SELECT cents,
                     ntile(10) OVER (ORDER BY cents, o_custkey) AS tile
              FROM r),
            s AS (
              SELECT tile, COUNT(*) AS n_cust, SUM(cents) AS revenue_cents
              FROM t GROUP BY tile),
            tot AS (SELECT SUM(cents) AS tc FROM r)
            SELECT CAST(tile AS BIGINT) AS tile,
                   CAST(n_cust AS BIGINT) AS n_cust,
                   CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(revenue_cents * 1000000 // tc AS BIGINT) AS share_ppm,
                   CAST(SUM(revenue_cents) OVER (ORDER BY tile
                          ROWS UNBOUNDED PRECEDING) * 1000000 // tc
                     AS BIGINT) AS cum_share_ppm
            FROM s, tot ORDER BY tile
        """,
        "events_first_touch_attribution": """
            -- first-touch attribution: sessions credited to the event
            -- type that opened them; NULL types excluded on both sides
            WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
              FROM events WHERE event_type IS NOT NULL),
            m AS (
              SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                               OR tus - lag(tus) OVER w > 1800000000
                             THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY tus, event_id)),
            s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id
                          ORDER BY tus, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM m),
            f AS (
              SELECT user_id, sid,
                     first(event_type ORDER BY tus, event_id) AS first_type,
                     COUNT(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purch
              FROM s GROUP BY user_id, sid)
            SELECT first_type,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(n_purch) AS BIGINT) AS n_purchases
            FROM f GROUP BY first_type ORDER BY first_type
        """,
        "events_session_duration_median": """
            -- sessionize (30-min gap) composed with the engine's exact
            -- ceil(q*n) median convention, duration in microseconds
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
            m AS (
              SELECT user_id, tus, event_id,
                CASE WHEN lag(tus) OVER w IS NULL
                       OR tus - lag(tus) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id
                                  ORDER BY tus, event_id)),
            s AS (
              SELECT user_id, tus,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
              FROM m),
            d AS (
              SELECT max(tus) - min(tus) AS dur
              FROM s GROUP BY user_id, sid),
            r AS (
              SELECT dur, row_number() OVER (ORDER BY dur) AS rn,
                     COUNT(*) OVER () AS n
              FROM d)
            SELECT CAST(n AS BIGINT) AS n_sessions,
                   CAST(dur AS BIGINT) AS median_duration_us
            FROM r WHERE rn = (500000 * n + 999999) // 1000000
        """,
        "events_audience_overlap": """
            -- audience-overlap matrix: Jaccard between the distinct-user
            -- sets of every two event types (co-occurring pairs only)
            WITH p AS (
              SELECT DISTINCT event_type, user_id FROM events
              WHERE event_type IS NOT NULL),
            s AS (
              SELECT event_type, COUNT(*) AS n FROM p GROUP BY event_type),
            i AS (
              SELECT a.event_type AS type_a, b.event_type AS type_b,
                     COUNT(*) AS inter
              FROM p a JOIN p b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
            SELECT type_a, type_b,
                   CAST(inter AS BIGINT) AS inter,
                   CAST(sa.n + sb.n - inter AS BIGINT) AS uni,
                   CAST(inter * 1000000 // (sa.n + sb.n - inter) AS BIGINT)
                     AS jaccard_ppm
            FROM i
            JOIN s sa ON sa.event_type = i.type_a
            JOIN s sb ON sb.event_type = i.type_b
            ORDER BY type_a, type_b
        """,
        "source_fingerprint": """
            -- order-independent per-source table checksum: sum of 60-bit
            -- full-row digests mod 2^63 (row = id|lang|source|n_chars|
            -- md5(text), digest = first 15 hex chars of its md5)
            SELECT COALESCE(source, '') AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(('0x' || substr(md5(
                       CAST(doc_id AS VARCHAR) || '|' ||
                       COALESCE(lang, '') || '|' ||
                       COALESCE(source, '') || '|' ||
                       CAST(n_chars AS VARCHAR) || '|' ||
                       md5(COALESCE(text, ''))
                     ), 1, 15)) AS BIGINT))
                     % 9223372036854775808 AS BIGINT) AS fingerprint
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "copurchase_triangles": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
                  FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
                                   AND a.l_partkey < b.l_partkey)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM e e1 JOIN e e2 ON e1.y = e2.x
                    JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles
        """,
        "copurchase_pagerank": """
            -- 2-round damped PageRank over the part co-purchase graph
            -- in exact integer ppm: edge iff two parts share >= 1
            -- order (symmetric, distinct), contrib = r // deg, r' =
            -- 150000 + (850000 * sum(contrib)) // 1e6; top-100 by
            -- (rank desc, partkey)
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
              SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM lp a JOIN lp b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey),
            d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
            r1 AS (
              SELECT e.dst AS node,
                     150000 + (850000 * SUM(1000000 // d.deg)) // 1000000 AS r
              FROM e JOIN d ON d.src = e.src GROUP BY e.dst),
            r2 AS (
              SELECT e.dst AS node,
                     150000 + (850000 * SUM(r1.r // d.deg)) // 1000000 AS r
              FROM e JOIN d ON d.src = e.src
                     JOIN r1 ON r1.node = e.src
              GROUP BY e.dst)
            SELECT r2.node AS p_partkey, CAST(r2.r AS BIGINT) AS pagerank_ppm,
                   CAST(d.deg AS BIGINT) AS degree
            FROM r2 JOIN d ON d.src = r2.node
            ORDER BY pagerank_ppm DESC, p_partkey LIMIT 100
        """,
        "orders_table_profile": """
            -- SUMMARIZE-style per-column profile of orders: exact
            -- distinct counts, NULL-excluded min/max rendered
            -- canonically (ints/cents as decimal strings, timestamps
            -- via strftime seconds); o_totalprice profiles its exact
            -- integer cents
            SELECT 'o_custkey' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(o_custkey) AS VARCHAR) AS min_repr,
                   CAST(MAX(o_custkey) AS VARCHAR) AS max_repr
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*),
                   COUNT(*) - COUNT(o_orderdate),
                   COUNT(DISTINCT o_orderdate),
                   strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
                   strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
            FROM orders
            UNION ALL
            SELECT 'o_orderkey', COUNT(*),
                   COUNT(*) - COUNT(o_orderkey),
                   COUNT(DISTINCT o_orderkey),
                   CAST(MIN(o_orderkey) AS VARCHAR),
                   CAST(MAX(o_orderkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   COUNT(*) - COUNT(o_orderpriority),
                   COUNT(DISTINCT o_orderpriority),
                   MIN(o_orderpriority), MAX(o_orderpriority)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*),
                   COUNT(*) - COUNT(o_orderstatus),
                   COUNT(DISTINCT o_orderstatus),
                   MIN(o_orderstatus), MAX(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', COUNT(*),
                   COUNT(*) - COUNT(o_totalprice),
                   COUNT(DISTINCT CAST(round(o_totalprice*100) AS BIGINT)),
                   CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS VARCHAR),
                   CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS VARCHAR)
            FROM orders
            ORDER BY column_name
        """,
        "source_lang_gini": """
            -- language-mix impurity per source: Gini 1 - sum((n_l/n)^2)
            -- in exact ppm (NULL lang counts as its own language)
            WITH c AS (
              SELECT source, lang, COUNT(*) AS n
              FROM documents GROUP BY 1, 2),
            t AS (
              SELECT source, SUM(n) AS tot, SUM(n*n) AS ss,
                     COUNT(*) AS n_langs
              FROM c GROUP BY 1)
            SELECT source, CAST(tot AS BIGINT) AS n_docs,
                   CAST(n_langs AS BIGINT) AS n_langs,
                   CAST((tot*tot - ss) * 1000000 // (tot*tot) AS BIGINT)
                     AS gini_ppm
            FROM t ORDER BY source
        """,
        "cust_order_gap_histogram": """
            -- inter-arrival cadence: days between consecutive orders of
            -- the same customer, histogrammed corpus-wide
            WITH d AS (
              SELECT o_custkey,
                     epoch_us(o_orderdate) // 86400000000 AS day,
                     o_orderkey
              FROM orders),
            g AS (
              SELECT day - lag(day) OVER
                       (PARTITION BY o_custkey
                        ORDER BY day, o_orderkey) AS gap_days
              FROM d)
            SELECT CAST(gap_days AS BIGINT) AS gap_days,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM g WHERE gap_days IS NOT NULL
            GROUP BY gap_days ORDER BY gap_days
        """,
        "cap_docs_per_source": """
            WITH h AS (
              SELECT source, doc_id,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hu
              FROM documents),
            r AS (
              SELECT source, doc_id,
                row_number() OVER (PARTITION BY source ORDER BY hu, doc_id)
                  AS rank
              FROM h)
            SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10
        """,
        "domain_mix_sample": """
            -- keep iff hash_u32 * 10^6 < rate_ppm * 2^32 (exact integers;
            -- rates mirror functions/domains.py MIX_KEEP_PPM/_DEFAULT)
            SELECT doc_id, source FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) * 1000000
                < (CASE source WHEN 'src0' THEN 1000000
                               WHEN 'src1' THEN 500000
                               WHEN 'src2' THEN 250000
                               ELSE 125000 END) * CAST(4294967296 AS BIGINT)
        """,
        "domain_mix_repeat": """
            -- n_copies = rate//1e6 + (hash_u32 * 10^6 < (rate % 1e6) * 2^32)
            -- (exact integers; rates mirror functions/domains.py
            --  MIX_REPEAT_PPM/_DEFAULT)
            WITH r AS (
              SELECT doc_id, source,
                     (CASE source WHEN 'src0' THEN 3000000
                                  WHEN 'src1' THEN 1500000
                                  ELSE 1000000 END) AS ppm
              FROM documents),
            c AS (
              SELECT doc_id, source,
                     ppm // 1000000
                     + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) * 1000000
                            < (ppm % 1000000) * CAST(4294967296 AS BIGINT)
                       THEN 1 ELSE 0 END AS n_copies
              FROM r)
            SELECT doc_id, source,
                   CAST(unnest(generate_series(1, CAST(n_copies AS BIGINT)))
                        AS BIGINT) AS copy_idx
            FROM c
        """,
        "doc_repetition_stats": f"""
            -- thresholds mirror functions/text.py REP_*_MAX_PPM
            WITH u AS (
              SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
            c AS (
              SELECT doc_id, w, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
            s AS (
              SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS n_uniq,
                     MAX(cnt) AS top
              FROM c GROUP BY 1)
            SELECT doc_id,
              CAST((n - n_uniq) * 1000000 // n AS BIGINT) AS dup_token_ppm,
              CAST(top * 1000000 // n AS BIGINT) AS top_token_ppm,
              CAST(CASE WHEN top * 1000000 // n <= 200000
                         AND (n - n_uniq) * 1000000 // n <= 600000
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM s
        """,
        "doc_lm_quality": """
            -- CCNet-style LM quality: corpus-trained char-bigram model,
            -- per-doc mean transition probability in exact integer ppm
            -- (char == byte on this ASCII corpus; functions/text.py
            -- lm_quality).  Docs with < 2 chars have no transitions.
            WITH pairs AS (
              SELECT doc_id, substr(text, i, 1) AS a, substr(text, i, 2) AS ab
              FROM documents, unnest(generate_series(1, length(text) - 1)) AS u(i)),
            big AS (SELECT ab, COUNT(*) AS c2 FROM pairs GROUP BY ab),
            pre AS (SELECT a, COUNT(*) AS c1 FROM pairs GROUP BY a),
            pppm AS (
              SELECT ab, CAST(c2 * 1000000 // c1 AS BIGINT) AS p_ppm
              FROM big JOIN pre ON substr(big.ab, 1, 1) = pre.a)
            SELECT p.doc_id, COUNT(*) AS n_trans,
                   CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS lm_score_ppm
            FROM pairs p JOIN pppm USING (ab)
            GROUP BY p.doc_id
        """,
        "doc_hashed_features": f"""
            -- hashing-trick bag-of-words: bucket = md5-u60(token) % 1024
            -- (functions/text.py FEATURE_HASH_DIM; the engine-wide
            -- str_hash_u60 string-key convention)
            WITH u AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
                        % 1024 AS BIGINT) AS feat_idx,
                   COUNT(*) AS cnt
            FROM u GROUP BY 1, 2
        """,
        "doc_lm_ppl_buckets": """
            -- CCNet head/middle/tail split per language: LM score under
            -- the doc's LANGUAGE'S bigram model (one model per lang, the
            -- CCNet convention), cut at the lang's exact tercile order
            -- statistics (ceil(q*n) ranks, LM_Q1/Q2_PPM literals), the
            -- value-boundary convention (ties share a bucket)
            WITH pairs AS (
              SELECT doc_id, lang,
                     substr(text, i, 1) AS a, substr(text, i, 2) AS ab
              FROM documents,
                   unnest(generate_series(1, length(text) - 1)) AS u(i)
              WHERE lang IS NOT NULL),
            big AS (
              SELECT lang, ab, COUNT(*) AS c2 FROM pairs GROUP BY lang, ab),
            pre AS (
              SELECT lang, a, COUNT(*) AS c1 FROM pairs GROUP BY lang, a),
            pppm AS (
              SELECT big.lang, ab,
                     CAST(c2 * 1000000 // c1 AS BIGINT) AS p_ppm
              FROM big JOIN pre
                ON substr(big.ab, 1, 1) = pre.a AND big.lang = pre.lang),
            scored AS (
              SELECT p.doc_id, p.lang,
                     CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS lm_score_ppm
              FROM pairs p JOIN pppm USING (lang, ab)
              GROUP BY p.doc_id, p.lang),
            ranked AS (
              SELECT lang, lm_score_ppm,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY lm_score_ppm) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS n
              FROM scored),
            cuts AS (
              SELECT lang,
                MAX(CASE WHEN rn = (333334 * n + 999999) // 1000000
                    THEN lm_score_ppm END) AS b1,
                MAX(CASE WHEN rn = (666667 * n + 999999) // 1000000
                    THEN lm_score_ppm END) AS b2
              FROM ranked GROUP BY lang)
            SELECT s.doc_id, s.lang, s.lm_score_ppm,
                   CASE WHEN s.lm_score_ppm > c.b2 THEN 'head'
                        WHEN s.lm_score_ppm > c.b1 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s JOIN cuts c USING (lang)
        """,
        "doc_chunks": f"""
            -- fixed-size overlapping token windows (64 every 48, the
            -- functions/text.py CHUNK_TOKS/CHUNK_STRIDE literals); chunk
            -- hash = md5 of the space-joined window, list_slice 1-based
            -- inclusive
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            c AS (
              SELECT doc_id, toks, i AS chunk_idx, i * 48 AS start_tok,
                     LEAST(64, len(toks) - i * 48) AS n_toks
              FROM t, unnest(range(0, (len(toks) + 47) // 48)) AS u(i))
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   CAST(start_tok AS BIGINT) AS start_tok,
                   CAST(n_toks AS BIGINT) AS n_toks,
                   md5(array_to_string(
                     list_slice(toks, start_tok + 1, start_tok + n_toks),
                     ' ')) AS chunk_hash
            FROM c
        """,
        "dedup_substring_spans": f"""
            -- Lee-et-al-style duplicate-substring spans: k=5-token grams
            -- occurring in >= 2 distinct docs (SUBSTR_K / SUBSTR_MIN_DOCS);
            -- key = 60-bit md5 prefix of the gram STRING (the engine
            -- groups by the same function); islands over covered 1-based
            -- token positions
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id, i AS pos,
                CAST(('0x' || substr(md5(
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                  toks[i+3] || ' ' || toks[i+4]), 1, 15)) AS BIGINT) AS key
              FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
              WHERE len(toks) >= 5),
            hot AS (SELECT key FROM g GROUP BY key
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            h AS (SELECT doc_id, pos FROM g
                  WHERE key IN (SELECT key FROM hot)),
            cov AS (SELECT DISTINCT doc_id, pos + d AS p
                    FROM h, unnest(range(0, 5)) AS u2(d)),
            isl AS (SELECT doc_id, p,
                      p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                        AS grp
                    FROM cov)
            SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
                   CAST(MAX(p) AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, grp
        """,
        "doc_dup_span_stats": f"""
            -- per-doc duplicated-token share under the
            -- dedup_substring_spans criterion (hot = 5-gram in >= 2 docs)
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
              SELECT doc_id, i AS pos,
                CAST(('0x' || substr(md5(
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                  toks[i+3] || ' ' || toks[i+4]), 1, 15)) AS BIGINT) AS key
              FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
              WHERE len(toks) >= 5),
            hot AS (SELECT key FROM g GROUP BY key
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            h AS (SELECT doc_id, pos FROM g
                  WHERE key IN (SELECT key FROM hot)),
            cov AS (SELECT DISTINCT doc_id, pos + d AS p
                    FROM h, unnest(range(0, 5)) AS u2(d)),
            dup AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov
                    GROUP BY doc_id)
            SELECT t.doc_id,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(COALESCE(dup.dup_tokens, 0) AS BIGINT) AS dup_tokens,
              CAST(COALESCE(dup.dup_tokens, 0) * 1000000 // len(toks)
                AS BIGINT) AS dup_ppm
            FROM t LEFT JOIN dup ON dup.doc_id = t.doc_id
            WHERE len(toks) >= 1
        """,
        "decontaminate_ngrams": f"""
            -- eval split: id-hash digit >= 14; key = 60-bit md5 prefix of
            -- the shingle STRING (the engine groups by the same function)
            WITH t AS (
              SELECT doc_id,
                CAST(strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS digit,
                {_TOKS} AS toks
              FROM documents),
            s AS (
              SELECT doc_id, digit,
                CASE WHEN len(toks) >= 3 THEN
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                     ELSE CAST([] AS VARCHAR[]) END AS sh
              FROM t),
            r AS (
              SELECT DISTINCT doc_id, digit,
                CAST(('0x' || substr(md5(u.shingle), 1, 15)) AS BIGINT) AS key
              FROM s, unnest(s.sh) AS u(shingle)),
            ev AS (SELECT DISTINCT key FROM r WHERE digit >= 14)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM r WHERE digit < 14 AND key IN (SELECT key FROM ev)
            GROUP BY doc_id
        """,
        "ngram_chain_groups": f"""
            -- components of the consecutive-doc jaccard chain graph:
            -- run detection via a window sum of break flags, comp = run min
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 3 THEN
                       list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                     ELSE CAST([] AS VARCHAR[]) END AS sh
              FROM t),
            j AS (
              SELECT b.doc_id AS doc_b,
                CASE WHEN (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0
                     THEN (len(list_intersect(a.sh, b.sh)) * 1000000)
                          // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                     ELSE 0 END AS jaccard_ppm
              FROM s a JOIN s b ON b.doc_id = a.doc_id + 1),
            brk AS (
              SELECT d.doc_id,
                CASE WHEN j.jaccard_ppm >= 5000 THEN 0 ELSE 1 END AS brk
              FROM documents d LEFT JOIN j ON j.doc_b = d.doc_id),
            g AS (SELECT doc_id,
                    SUM(brk) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS grp
                  FROM brk)
            SELECT doc_id,
                   CAST(MIN(doc_id) OVER (PARTITION BY grp) AS BIGINT) AS comp
            FROM g
        """,
        "embedding_knn": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 10),
            s AS (
              SELECT q.qid, e.vec_id,
                row_number() OVER (PARTITION BY q.qid
                  ORDER BY list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                           e.vec_id) AS rnk
              FROM q, embeddings e WHERE e.vec_id <> q.qid)
            SELECT qid AS query_id, vec_id AS neighbor_id,
                   CAST(rnk AS BIGINT) AS "rank"
            FROM s WHERE rnk <= 5
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE b.vec_id > a.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.30
        """,
        # h = first 8 hex digits of md5(doc_id); test iff h*3 < 16^8
        # (equivalently h <= 0x55555555, a fixed-width hex-string compare)
        "split_train_test": """
            SELECT doc_id,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <= '55555555'
                   THEN 'test' ELSE 'train' END AS split
            FROM documents
        """,
        # keep iff h * 20000 < n_chars * 16^8  (P(keep) = n_chars/20000)
        "sample_exact_k": """
            -- exact-size deterministic sample: bottom-100 by md5 of the
            -- decimal doc_id (functions/sampling.py SAMPLE_EXACT_K)
            SELECT doc_id,
                   CAST(row_number() OVER (
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                     AS BIGINT) AS sample_rank
            FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 100
        """,
        "weighted_sample": """
            SELECT doc_id, n_chars FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  * 20000 < CAST(n_chars AS BIGINT) * 4294967296
        """,
        "importance_weights": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
              CAST((CAST(n_chars AS BIGINT) * 1000000)
                // (SELECT SUM(CAST(n_chars AS BIGINT)) FROM documents) AS BIGINT) AS prob_ppm
            FROM documents
        """,
        # exact k-th order statistics, k = ceil(q_ppm*n/1e6) 1-based =
        # (q_ppm*n + 999999) // 1e6 — same integer formula as the engine
        "lineitem_price_quantiles": """
            WITH v AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS c
                       FROM lineitem),
            r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v),
            qs(q_ppm) AS (VALUES (250000),(500000),(750000),(900000))
            SELECT CAST(qs.q_ppm AS BIGINT) AS q_ppm, r.c AS value_cents
            FROM qs, n, r
            WHERE r.rn = (CAST(qs.q_ppm AS BIGINT) * n.n + 999999) // 1000000
        """,
        "lineitem_price_quartiles_interp": """
            WITH v AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS c
                       FROM lineitem),
            o AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v),
            p(pq) AS (VALUES (1),(2),(3)),
            ix AS (SELECT pq,
                          ((n.n - 1) * pq) // 4 + 1 AS ra,
                          ((n.n - 1) * pq) % 4 AS f4
                   FROM p, n)
            SELECT CAST(ix.pq * 250000 AS BIGINT) AS q_ppm,
                   CAST(4 * a.c + (COALESCE(b.c, a.c) - a.c) * ix.f4
                     AS BIGINT) AS value_qcents
            FROM ix
            JOIN o a ON a.rn = ix.ra
            LEFT JOIN o b ON b.rn = ix.ra + 1
        """,
        "events_value_quantiles": """
            WITH v AS (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events),
            r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v),
            qs(q_ppm) AS (VALUES (250000),(500000),(750000),(900000))
            SELECT CAST(qs.q_ppm AS BIGINT) AS q_ppm, r.c AS value_cents
            FROM qs, n, r
            WHERE r.rn = (CAST(qs.q_ppm AS BIGINT) * n.n + 999999) // 1000000
        """,
        "events_value_winsorized": """
            -- cut ranks mirror quantiles.WINSOR_LO/HI_PPM (p05/p95,
            -- rank = (q*n + 999999) // 1e6, 1-based kth smallest)
            WITH v AS (SELECT event_id,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
            r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v),
            cuts AS (
              SELECT
                (SELECT c FROM r, n
                 WHERE rn = (50000 * n.n + 999999) // 1000000) AS lo,
                (SELECT c FROM r, n
                 WHERE rn = (950000 * n.n + 999999) // 1000000) AS hi)
            SELECT v.event_id, v.c AS value_cents,
                   least(greatest(v.c, cuts.lo), cuts.hi) AS winsorized_cents
            FROM v, cuts
        """,
        "events_value_median_interp_by_type": """
            WITH c AS (SELECT event_type,
                              CAST(round(value*100) AS BIGINT) AS c
                       FROM events),
            o AS (SELECT event_type, c,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY c) AS rn,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM c),
            ix AS (SELECT DISTINCT event_type,
                          (n - 1) // 2 + 1 AS ra,
                          (n - 1) % 2 AS f2
                   FROM o)
            SELECT ix.event_type,
                   CAST(2 * a.c + (COALESCE(b.c, a.c) - a.c) * ix.f2
                     AS BIGINT) AS median_hcents
            FROM ix
            JOIN o a ON a.event_type = ix.event_type AND a.rn = ix.ra
            LEFT JOIN o b ON b.event_type = ix.event_type AND b.rn = ix.ra + 1
        """,
        # exact mode per type: most frequent cents value, ties -> smallest
        "events_mode_value_by_type": """
            WITH c AS (SELECT event_type,
                              CAST(round(value*100) AS BIGINT) AS c,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, c, n,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY n DESC, c ASC) AS rn
                  FROM c)
            SELECT event_type, c AS mode_cents, CAST(n AS BIGINT) AS n
            FROM r WHERE rn = 1
        """,
        "events_value_median_by_type": """
            WITH v AS (SELECT event_type,
                              CAST(round(value*100) AS BIGINT) AS c FROM events),
            r AS (SELECT event_type, c,
                         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM v)
            SELECT event_type, c AS median_cents FROM r
            WHERE rn = (500000 * n + 999999) // 1000000
        """,
        "stratified_sample_by_lang": """
            WITH r AS (SELECT lang, doc_id,
              row_number() OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents)
            SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10
        """,
        # value-boundary quartiles (NOT NTILE): 1 + #exact-quantile
        # boundaries strictly below the row's value, same rank formula
        "events_value_quartile": """
            WITH v AS (SELECT event_id,
                              CAST(round(value*100) AS BIGINT) AS c FROM events),
            r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
            n AS (SELECT COUNT(*) AS n FROM v),
            b AS (SELECT
              (SELECT c FROM r, n WHERE rn = (250000 * n.n + 999999) // 1000000) AS b1,
              (SELECT c FROM r, n WHERE rn = (500000 * n.n + 999999) // 1000000) AS b2,
              (SELECT c FROM r, n WHERE rn = (750000 * n.n + 999999) // 1000000) AS b3)
            SELECT v.event_id,
                   CAST(1 + CAST(v.c > b.b1 AS INT) + CAST(v.c > b.b2 AS INT)
                          + CAST(v.c > b.b3 AS INT) AS BIGINT) AS quartile
            FROM v, b
        """,
    }
    # salted keyed-window variants produce identical results to their
    # unsalted twins (the salting changes partitioning, not semantics)
    d["events_sessionize_salted"] = d["events_sessionize"]
    d["events_asof_salted"] = d["events_asof_last_purchase"]
    d["events_range_join_salted"] = d["events_range_join_purchase"]
    return d
