"""Tests for the dedup/similarity/text operator families."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with planted exact and near duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the engine "
        "streams arrow batches through the actor pool with backpressure"
    )
    near = base.replace("lazy dog", "sleepy dog")  # one token changed
    other = "completely different content about partitioned shuffles and manifests " * 2
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},          # exact dup of 0
        {"doc_id": 2, "text": near},           # near dup of 0
        {"doc_id": 3, "text": other},
        {"doc_id": 4, "text": other + " tail"},
    ]
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_dedup_exact_planted(ray_session, planted_dir):
    from layout_analysis_ray.functions.dedup import dedup_exact

    df = dedup_exact(planted_dir).to_pandas()
    assert len(df) == 4  # 5 docs, one exact-dup pair collapsed
    dup = df[df["n_dups"] == 2]
    assert len(dup) == 1 and dup["doc_id"].iloc[0] == 0


def test_dedup_minhash_planted(ray_session, planted_dir):
    from layout_analysis_ray.functions.dedup import dedup_minhash_pairs

    df = dedup_minhash_pairs(planted_dir).to_pandas()
    pairs = set(zip(df["doc_a"], df["doc_b"]))
    assert (0, 1) in pairs  # exact dup: jaccard 1.0
    assert (0, 2) in pairs  # near dup shares most shingles
    est = dict(zip(zip(df["doc_a"], df["doc_b"]), df["est_jaccard_ppm"]))
    assert est[(0, 1)] == 1_000_000


def test_simhash_pairs_planted(ray_session, planted_dir):
    from layout_analysis_ray.functions.dedup import simhash_pairs

    df = simhash_pairs(planted_dir).to_pandas()
    pairs = dict(zip(zip(df["doc_a"], df["doc_b"]), df["hamming"]))
    assert pairs.get((0, 1)) == 0  # exact dup: identical simhash
    assert (3, 4) in pairs or (0, 2) in pairs  # at least one near pair found
    assert all(h <= 3 for h in pairs.values())


def test_simhash_properties(planted_dir):
    from layout_analysis_ray.functions.dedup import simhash64

    a = simhash64("the quick brown fox")
    assert a == simhash64("the quick brown fox")  # deterministic
    assert simhash64("") == 0
    b = simhash64("the quick brown cat")
    ham = bin(a ^ b).count("1")
    assert ham <= 24  # near texts stay near in hamming space
    c = simhash64("zzz completely unrelated words entirely qqq xyz")
    assert bin(a ^ c).count("1") > ham


def test_knn_lsh_recall(ray_session):
    from layout_analysis_ray.functions.similarity import knn_brute, knn_lsh

    sf = "/root/testdata/sf0.001"
    brute = knn_brute(sf).to_pandas()
    lsh = knn_lsh(sf).to_pandas()
    b_pairs = set(zip(brute["query_id"], brute["neighbor_id"]))
    l_pairs = set(zip(lsh["query_id"], lsh["neighbor_id"]))
    recall = len(b_pairs & l_pairs) / len(b_pairs)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_neardup_lsh_recall_and_precision(ray_session):
    """LSH pair pipeline: every emitted pair is exact-verified (precision 1
    vs brute), recall over the brute pair set stays above the gate."""
    from layout_analysis_ray.functions.similarity import neardup_pairs, neardup_pairs_lsh

    sf = "/root/testdata/sf0.001"
    brute = neardup_pairs(sf).to_pandas()
    lsh = neardup_pairs_lsh(sf).to_pandas()
    b_pairs = set(zip(brute["vec_a"], brute["vec_b"]))
    l_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert l_pairs <= b_pairs  # exact verify: no false positives
    recall = len(l_pairs) / max(1, len(b_pairs))
    assert recall >= 0.5, f"LSH pair recall too low: {recall}"


def test_knn_brute_shape(ray_session):
    from layout_analysis_ray.functions.similarity import KNN_K, N_QUERIES, knn_brute

    df = knn_brute("/root/testdata/sf0.001").to_pandas()
    assert len(df) == KNN_K * N_QUERIES
    assert set(df.columns) == {"query_id", "neighbor_id", "rank"}
    assert (df.groupby("query_id")["rank"].max() == KNN_K).all()
    assert (df["query_id"] != df["neighbor_id"]).all()


def test_minhash_partial_batch_invariance(planted_dir):
    """Band signatures must not depend on batching."""
    from layout_analysis_ray.functions.dedup import minhash_bands_batch

    t = pq.read_table(planted_dir + "/documents.parquet")
    whole = minhash_bands_batch(t).to_pandas()
    parts = pd.concat(
        [minhash_bands_batch(t.slice(i, 2)).to_pandas() for i in range(0, 5, 2)]
    )
    key = ["doc_id", "band_id"]
    w = whole.sort_values(key).reset_index(drop=True)
    p = parts.sort_values(key).reset_index(drop=True)
    assert w.equals(p)


def test_bucketed_join_matches_pandas_merge(ray_session):
    """Explicit bucketed hash join == pandas inner merge, batching-independent."""
    import ray.data as rd

    from layout_analysis_ray.functions.joins import bucketed_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {"k": rng.randint(0, 50, 200).astype(np.int64), "lv": np.arange(200)}
    )
    right = pd.DataFrame(
        {"rk": rng.randint(0, 50, 150).astype(np.int64), "rv": np.arange(150) * 10}
    )
    got = (
        bucketed_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(3),
            "k",
            "rk",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], exp[["k", "lv", "rv"]])


def test_bucketed_join_agg_single_exchange(ray_session):
    """Bucket-layout reuse: join + groupby(o_orderkey) aggregate fused via
    post_probe runs on exactly ONE all-to-all exchange (the bucket groupby
    appears as a single Sort operator in the executed plan), and matches
    DuckDB."""
    import re

    import duckdb

    from layout_analysis_ray.functions.joins import q_join_bucketed_agg

    sf = "/root/testdata/sf0.001"
    ds = q_join_bucketed_agg(sf)
    got = (
        pd.DataFrame(ds.take_all())
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    ops = re.findall(r"Operator \d+ ([^\n:]+)", ds.stats())
    exchanges = [o for o in ops if "Sort" in o or "Aggregate" in o or "Shuffle" in o]
    assert exchanges == ["Sort"], ops
    exp = (
        duckdb.sql(
            f"""
            SELECT o_orderkey,
              CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
                  AS revenue_e4,
              COUNT(*) AS n_lines
            FROM read_parquet('{sf}/orders.parquet') o
            JOIN read_parquet('{sf}/lineitem.parquet') l
              ON l_orderkey = o_orderkey
            GROUP BY o_orderkey ORDER BY o_orderkey
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype({"revenue_e4": "int64", "n_lines": "int64"}))


def test_bucketed_join_rejects_column_collision(ray_session):
    import ray.data as rd

    from layout_analysis_ray.functions.joins import bucketed_join

    df = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="collision"):
        bucketed_join(rd.from_pandas(df), rd.from_pandas(df), "k", "k")


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    rows = ds.take(20)
    assert len(rows) > 0
    assert set(rows[0]) == {"doc_id", "kind", "text", "media_ref", "offset"}


def test_queries_oracle_keys_consistent():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)  # every oracle has a query
    # the non-SQL set is exactly the by-design rows-only group
    assert set(qs) - set(os_) == {
        "extract_spans",
        "extract_kind_counts",
        "extract_spans_skew",
        "extract_spans_cluster_order",
        "extract_spans_flood_order",
        "media_features",
        "media_features_demo",
        "media_features_png",
        "media_features_jpeg",
        "media_audio_features",
        "dedup_neardup_incremental_ingest",
        "media_deskew",
        "media_frame_sample",
        "media_overlay",
        "eval_raster_dice",
        "embedding_top_component",
        "media_phash",
        "media_phash_neardup_pairs",
        "dedup_minhash_pairs",
        "dedup_minhash_groups",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "corpus_prepare",
        "sketch_value_quantiles",
        "embedding_neardup_pairs_lsh",
        "ann_lsh_buckets",
        "ann_knn_lsh",
        "ann_ivf_assign",
        "ann_knn_ivf",
        "eval_skew_vs_happy",
        "page_xml_export",
        "extract_error_docs",
        "sketch_distinct_users",
        "sketch_source_unique",
        "sketch_heavy_tokens",
    }


def test_bloom_filter_no_false_negatives(ray_session):
    """Distributed bitmap build ORs every batch partial: every inserted key
    must test positive; disjoint probes stay near the designed fp rate."""
    import ray.data as rd

    from layout_analysis_ray.functions.filters import bloom_contains, build_bloom

    keys = np.arange(1, 50_001, dtype=np.int64) * 7919  # spread, multi-block
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
    words = build_bloom(ds, "k", nbits=1 << 19)
    assert bloom_contains(words, keys).all()
    absent = np.arange(1, 200_001, dtype=np.int64) * 7919 + 1  # none inserted
    fp = bloom_contains(words, absent).mean()
    assert fp < 0.05, fp


def test_bloom_filter_empty_build_side(ray_session):
    import ray.data as rd

    from layout_analysis_ray.functions.filters import bloom_contains, build_bloom

    ds = rd.from_arrow(pa.schema([("k", pa.int64())]).empty_table())
    words = build_bloom(ds, "k")
    assert not bloom_contains(words, np.array([1, 2, 3], dtype=np.int64)).any()


def test_q3_bloom_prefilter_identical(ray_session):
    """The Bloom semi-join pushdown may only drop rows the join would drop:
    results must be bit-identical with and without it."""
    from layout_analysis_ray.pipelines.relational import q3_top_orders

    sf = "/root/testdata/sf0.001"
    base = q3_top_orders(sf, use_bloom=False).to_pandas()
    bloom = q3_top_orders(sf, use_bloom=True).to_pandas()
    pd.testing.assert_frame_equal(base, bloom)


def test_pack_sequences_invariants(ray_session):
    """Packing is concat-and-chunk per partition: offsets stay below the
    budget, coordinates are non-decreasing in doc_id, and each doc's start
    equals the partition's running token total before it."""
    from layout_analysis_ray.pipelines.corpus import (
        PACK_BUDGET_TOKENS,
        pack_sequences,
    )

    got = pack_sequences("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 500
    assert (got["seq_offset"] >= 0).all() and (
        got["seq_offset"] < PACK_BUDGET_TOKENS
    ).all()
    for _, g in got.groupby("part"):
        g = g.sort_values("doc_id")
        start = g["seq_id"].to_numpy() * PACK_BUDGET_TOKENS + g["seq_offset"].to_numpy()
        assert (np.diff(start) >= 0).all()
        assert start[0] == 0  # first doc of each partition starts at 0


def test_pack_sequences_global_stitch(ray_session):
    """Global packing is local packing shifted by a per-partition constant
    (the cumulative token total of all earlier partitions): within each
    part the offset delta is constant, deltas are non-decreasing in part
    order, part 0's delta is 0, and the whole corpus packs gap-free."""
    from layout_analysis_ray.pipelines.corpus import (
        PACK_BUDGET_TOKENS,
        pack_sequences,
        pack_sequences_global,
    )

    sf = "/root/testdata/sf0.001"
    local = pack_sequences(sf).to_pandas().set_index("doc_id").sort_index()
    glob = pack_sequences_global(sf).to_pandas().set_index("doc_id").sort_index()
    assert len(glob) == len(local) == 500
    pd.testing.assert_series_equal(glob["part"], local["part"])
    l_start = local["seq_id"] * PACK_BUDGET_TOKENS + local["seq_offset"]
    g_start = glob["seq_id"] * PACK_BUDGET_TOKENS + glob["seq_offset"]
    delta = (g_start - l_start).groupby(glob["part"]).unique()
    assert all(len(d) == 1 for d in delta)  # constant shift per part
    shifts = delta.map(lambda d: d[0]).sort_index()
    assert shifts.iloc[0] == 0
    assert (shifts.diff().dropna() >= 0).all()
    # gap-free: each part's shift equals the previous part's shift plus
    # the previous part's total token count (= its max start + last doc len);
    # weaker but representation-only check: the global max start is >= every
    # local max start + shift, and parts tile without overlap.
    part_max = (g_start).groupby(glob["part"]).max().sort_index()
    part_min = (g_start).groupby(glob["part"]).min().sort_index()
    assert (part_min.iloc[1:].to_numpy() > part_max.iloc[:-1].to_numpy()).all()


def test_corpus_prepare_composition(ray_session):
    """corpus_prepare == pack(clean keepers minus minhash non-keepers):
    the doc set matches the recomposed set exactly and every partition's
    coordinates equal the pack kernel re-run on that set's token counts."""
    from layout_analysis_ray.functions.graph import dedup_minhash_groups
    from layout_analysis_ray.pipelines.corpus import (
        PACK_BUDGET_TOKENS,
        _token_triples,
        corpus_clean_keep,
        corpus_prepare,
    )

    sf = "/root/testdata/sf0.001"
    got = corpus_prepare(sf).to_pandas()
    keep_ids = set(corpus_clean_keep(sf).to_pandas()["doc_id"])
    groups = dedup_minhash_groups(sf).to_pandas()
    in_graph = set(groups["doc_id"])
    # representative re-picked among CLEAN cluster members (sequential
    # pipeline semantics): min clean doc_id per comp, or nobody if the
    # whole cluster failed cleaning
    clean_members = groups[groups["doc_id"].isin(keep_ids)]
    reps = set(clean_members.groupby("comp")["doc_id"].min())
    exp_ids = (keep_ids - in_graph) | reps
    assert set(got["doc_id"]) == exp_ids and len(got) == len(exp_ids)

    triples = (
        _token_triples(sf, lambda ids: np.zeros(len(ids), dtype=np.int64))
        .to_pandas()
        .set_index("doc_id")
    )
    for part, g in got.groupby("part"):
        g = g.sort_values("doc_id")
        ntok = triples.loc[g["doc_id"], "n_tokens"].to_numpy(dtype=np.int64)
        assert (triples.loc[g["doc_id"], "part"].to_numpy() == part).all()
        before = np.cumsum(ntok) - ntok
        start = g["seq_id"].to_numpy() * PACK_BUDGET_TOKENS + g["seq_offset"].to_numpy()
        assert (start == before).all()


def test_corpus_clean_keep_subset_of_dedup(ray_session):
    """Every kept doc must be a lang/quality survivor and the min doc_id of
    its hash group among survivors."""
    from layout_analysis_ray.functions.text import lang_id, quality
    from layout_analysis_ray.pipelines.corpus import (
        CLEAN_LANG,
        CLEAN_MIN_QUALITY_PPM,
        corpus_clean_keep,
    )

    sf = "/root/testdata/sf0.001"
    kept = corpus_clean_keep(sf).to_pandas()
    langs = lang_id(sf).to_pandas().set_index("doc_id")["lang_pred"]
    quals = quality(sf).to_pandas().set_index("doc_id")["quality_ppm"]
    assert len(kept) > 0
    assert (langs.loc[kept["doc_id"]] == CLEAN_LANG).all()
    assert (quals.loc[kept["doc_id"]] >= CLEAN_MIN_QUALITY_PPM).all()
    assert (kept["quality_ppm"].to_numpy() == quals.loc[kept["doc_id"]].to_numpy()).all()
    assert kept["content_hash"].is_unique


def test_first_last_per_user_ties_and_batching(ray_session, tmp_path):
    """Duplicate timestamps resolve by lowest event_id for first / highest
    for last, and the per-batch partial pick is batching-invariant (forced
    1-row batches == one batch)."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import first_last_event_per_user

    t = pa.table(
        {
            "event_id": pa.array([5, 3, 9, 1, 7, 2], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "ts": pa.array([100, 100, 50, 10, 10, 10], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=1)
    got = (
        first_last_event_per_user(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # user 1: first = ts50/eid9, last = ts100 tie -> max eid 5
    assert list(got.loc[1]) == [9, 300, 5, 100]
    # user 2: all ts tie -> first eid 1, last eid 7
    assert list(got.loc[2]) == [1, 400, 7, 500]


def test_new_users_hourly_consistency(ray_session):
    """cum_new is the prefix sum of n_new, the final cumulative equals the
    distinct-user count, and each user's first-event hour (from
    first_last_event_per_user) lands in the funnel exactly once."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import (
        HOUR_US,
        first_last_event_per_user,
        new_users_hourly,
    )

    sf = "/root/testdata/sf0.001"
    got = new_users_hourly(sf).to_pandas()
    assert (got["cum_new"] == got["n_new"].cumsum()).all()
    assert got["epoch_hour"].is_monotonic_increasing

    ev = pq.read_table(f"{sf}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    assert got["cum_new"].iloc[-1] == ev["user_id"].nunique()
    first_hours = (
        ev.assign(tus=ev["ts"].astype("datetime64[us]").astype(np.int64))
        .groupby("user_id")["tus"]
        .min()
        // HOUR_US
    )
    exp = first_hours.value_counts().sort_index()
    assert dict(zip(got["epoch_hour"], got["n_new"])) == exp.to_dict()


def test_new_relational_ops_match_duckdb(ray_session):
    """Grouped top-k, rollup, pivot, and tf-idf vs their committed SQL
    oracles at sf0.001 (the same compare the driver runs at sf0.01)."""
    import duckdb

    import __ray_entry__ as entrymod
    from tools.check_parity import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders", "customer", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in (
        "top_orders_per_segment",
        "revenue_rollup",
        "orders_pivot_by_year",
        "doc_tfidf_top_terms",
    ):
        got = canon(to_pandas(qs[name](sf)))
        exp = canon(con.sql(oracles[name]).df())
        pd.testing.assert_frame_equal(got, exp, check_dtype=True, obj=name)


def test_corpus_prepare_mixed_cluster_repick(ray_session, tmp_path):
    """A near-dup cluster whose min-doc_id member FAILS cleaning must
    survive through its lowest-id clean member (sequential-pipeline
    semantics), not vanish: doc 1 (quality-killed variant) clusters with
    doc 2 (clean); the kept set is {2, 3}, never {3} alone."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.pipelines.corpus import corpus_prepare

    base = (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "to the forest where many animals live in peace and they all share "
        "the food that nature gives them every day of the year with joy and "
        "the sun shines on the green trees while birds sing their songs in "
        "the morning light and rivers flow gently to the sea"
    )
    other = (
        "completely different clean text about the weather and the ocean "
        "with the wind and the waves that crash on the shore all day long "
        "under the bright sky and the boats that sail far away from the "
        "harbor while the people watch them go with wonder and the evening "
        "comes slowly as the light fades over the calm water of the bay and "
        "the stars appear one by one in the clear night air above the town"
    )
    variant = base + " " + " ".join(["99##"] * 400)  # same shingles + junk
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
            "text": [variant, base, other, "der schnelle braune fuchs springt"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(variant), len(base), len(other), 33],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    got = corpus_prepare(str(tmp_path)).to_pandas()
    assert set(got["doc_id"]) == {2, 3}
    assert (got["seq_id"] == 0).all() and (got["seq_offset"] >= 0).all()


def test_orders_above_cust_avg_paths_agree(ray_session, monkeypatch):
    """The broadcast cutover and the hash-join path must produce identical
    rows (the same guarantee the q3 bloom toggle test pins)."""
    import layout_analysis_ray.pipelines.relational as rel

    sf = "/root/testdata/sf0.001"
    b = rel.orders_above_cust_avg(sf).to_pandas()  # broadcast (default)
    monkeypatch.setattr(rel, "AVG_BROADCAST_MAX_CUST", 0)
    j = rel.orders_above_cust_avg(sf).to_pandas()  # forced join path
    key = lambda d: d.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(b), key(j)[b.columns])


def test_skyline_kernel_bruteforce_and_associativity():
    """_skyline_kernel (per-brand Pareto frontier) vs an O(n^2) dominance
    scan, plus the partial-frontier merge property the distributed plan
    relies on: frontier(union) == frontier(concat of block frontiers),
    for any block split."""
    import numpy as np
    import pandas as pd

    from layout_analysis_ray.pipelines.relational import _skyline_kernel

    rng = np.random.default_rng(23)
    for trial in range(5):
        n = int(rng.integers(1, 800))
        df = pd.DataFrame(
            {
                "p_partkey": np.arange(n, dtype=np.int64),
                "p_brand": rng.choice(["B1", "B2", "B3"], n),
                "price_cents": rng.integers(100, 100 + int(rng.integers(5, 500)), n).astype(np.int64),
                "p_size": rng.integers(1, 20, n).astype(np.int64),
            }
        )
        keep = []
        for i in range(n):
            a = df.iloc[i]
            dom = (
                (df.p_brand == a.p_brand)
                & (df.price_cents <= a.price_cents)
                & (df.p_size >= a.p_size)
                & ((df.price_cents < a.price_cents) | (df.p_size > a.p_size))
            )
            if not dom.any():
                keep.append(i)
        exp = df.iloc[keep].sort_values(["p_brand", "p_partkey"]).reset_index(drop=True)
        got = (
            _skyline_kernel(df)
            .sort_values(["p_brand", "p_partkey"])
            .reset_index(drop=True)
        )
        assert got.equals(exp), f"trial {trial}: kernel != brute force"

        parts = np.array_split(df.sample(frac=1, random_state=trial).reset_index(drop=True), 5)
        merged = _skyline_kernel(
            pd.concat([_skyline_kernel(p) for p in parts], ignore_index=True)
        )
        merged = merged.sort_values(["p_brand", "p_partkey"]).reset_index(drop=True)
        assert merged.equals(exp), f"trial {trial}: partial merge != frontier"


def test_skyline_kernel_null_brand_rows_all_survive():
    """SQL dominance semantics: 'b.p_brand = a.p_brand' never matches NULL,
    so NULL-brand rows are neither dominated nor dominating — every one
    survives, while non-null groups still prune."""
    import numpy as np
    import pandas as pd

    from layout_analysis_ray.pipelines.relational import _skyline_kernel

    df = pd.DataFrame(
        {
            "p_partkey": np.arange(4, dtype=np.int64),
            "p_brand": pd.array([None, None, "B1", "B1"], dtype=object),
            "price_cents": np.array([100, 200, 100, 200], dtype=np.int64),
            "p_size": np.array([10, 5, 10, 5], dtype=np.int64),
        }
    )
    got = _skyline_kernel(df)
    # both NULL rows survive; B1's (200, 5) is dominated by (100, 10)
    assert sorted(got["p_partkey"].tolist()) == [0, 1, 2]


def test_pagerank_reduce_tiers_identical(ray_session):
    """The dense-vector driver reduce and the partial_then_global exchange
    tier must produce bit-identical ranks (integer sums are associative;
    a fork here would silently change the oracle-checked result)."""
    from layout_analysis_ray.pipelines.relational import copurchase_pagerank

    sf = "/root/testdata/sf0.001"
    a = copurchase_pagerank(sf, dense_reduce=True).to_pandas()
    b = copurchase_pagerank(sf, dense_reduce=False).to_pandas()
    assert a.equals(b)
