"""Exact distributed order statistics (histogram narrowing) vs numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _mk(arr):
    import ray.data as rd

    return lambda: rd.from_arrow(pa.table({"v": pa.array(arr, pa.int64())}))


def test_kth_smallest_adversarial(ray_session):
    """Ties, negatives, and a 1e12-wide domain (forces 3 narrowing passes)."""
    from layout_analysis_ray.functions.quantiles import kth_smallest

    rng = np.random.default_rng(7)
    arr = np.concatenate(
        [np.full(1000, 5), rng.integers(-50, 50, 3000), np.full(10, 10**12)]
    ).astype(np.int64)
    sv = np.sort(arr)
    ranks = [1, 2, len(arr) // 2, len(arr) - 1, len(arr)]
    got = kth_smallest(_mk(arr), ranks)
    assert got == {k: int(sv[k - 1]) for k in ranks}


def test_kth_smallest_constant_column(ray_session):
    from layout_analysis_ray.functions.quantiles import kth_smallest

    got = kth_smallest(_mk(np.full(100, 42, dtype=np.int64)), [1, 50, 100])
    assert got == {1: 42, 50: 42, 100: 42}


def test_kth_smallest_rank_bounds(ray_session):
    from layout_analysis_ray.functions.quantiles import kth_smallest

    with pytest.raises(ValueError):
        kth_smallest(_mk(np.arange(10)), [0])
    with pytest.raises(ValueError):
        kth_smallest(_mk(np.arange(10)), [11])


def test_quantiles_match_numpy_sf0001(ray_session):
    """End-to-end query vs a full in-memory sort at sf0.001."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.quantiles import (
        DEFAULT_QS_PPM,
        lineitem_price_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    got = lineitem_price_quantiles(sf).to_pandas()
    col = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])[
        "l_extendedprice"
    ]
    v = np.sort(pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64()).to_numpy())
    n = len(v)
    exp = {q: int(v[(q * n + 999_999) // 1_000_000 - 1]) for q in DEFAULT_QS_PPM}
    assert dict(zip(got["q_ppm"], got["value_cents"])) == exp


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200
    )
)
def test_interp_quartiles_property(ray_session, vals):
    """Quarter-cent interpolated quartiles == numpy quantile(linear)*4 on
    random arrays (incl. n=1 and tie-heavy inputs)."""
    from layout_analysis_ray.functions.quantiles import _interp_quartiles

    arr = np.asarray(vals, dtype=np.int64)
    got = _interp_quartiles(_mk(arr)).to_pandas()
    sv = np.sort(arr)
    n = len(sv)
    exp = {}
    for pq in (1, 2, 3):
        lo0, f4 = divmod((n - 1) * pq, 4)
        a = int(sv[lo0])
        b = int(sv[min(lo0 + 1, n - 1)]) if f4 else a
        exp[pq * 250_000] = 4 * a + (b - a) * f4
    assert dict(zip(got["q_ppm"], got["value_qcents"])) == exp
    # cross-check against numpy's own linear interpolation (scaled by 4)
    npq = np.quantile(sv, [0.25, 0.5, 0.75], method="linear") * 4
    assert np.allclose(sorted(exp.values()), np.sort(npq))


def test_grouped_median_matches_numpy(ray_session):
    """Per-group narrowing vs per-group sort, including a 1-row group and a
    huge-domain group resolved in the same passes as the others."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile

    rng = np.random.default_rng(11)
    gs, vs = [], []
    for g, arr in {
        "a": rng.integers(-1000, 1000, 501),
        "b": np.full(100, 7),
        "c": np.array([10**12]),
        "d": rng.integers(0, 10**9, 64),
    }.items():
        gs += [g] * len(arr)
        vs.append(arr.astype(np.int64))
    vals = np.concatenate(vs)
    t = pa.table({"g": pa.array(gs, pa.string()), "v": pa.array(vals, pa.int64())})

    got = grouped_quantile(lambda: rd.from_arrow(t), 500_000)
    exp = {}
    for g in set(gs):
        v = np.sort(vals[np.asarray(gs) == g])
        k = (500_000 * len(v) + 999_999) // 1_000_000
        exp[g] = int(v[k - 1])
    assert got == exp


def test_grouped_interp_median_matches_numpy(ray_session):
    """Half-cent interpolated per-group median == numpy median*2, with odd,
    even, and single-row groups."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.quantiles import (
        events_value_median_interp_by_type,
    )

    sf = "/root/testdata/sf0.001"
    got = events_value_median_interp_by_type(sf).to_pandas()
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"])
    df = t.to_pandas()
    df["c"] = np.round(df["value"] * 100).astype(np.int64)
    exp = {
        g: int(round(np.median(sub["c"].to_numpy()) * 2))
        for g, sub in df.groupby("event_type")
    }
    assert dict(zip(got["event_type"], got["median_hcents"])) == exp


def test_grouped_interp_median_group_sizes(ray_session):
    """Explicit odd/even/1-row groups via an in-memory dataset."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile

    t = pa.table(
        {
            "g": pa.array(["odd"] * 3 + ["even"] * 4 + ["one"], pa.string()),
            "v": pa.array([1, 5, 9, 2, 4, 6, 8, 42], pa.int64()),
        }
    )
    mk = lambda: rd.from_arrow(t)
    lo = grouped_quantile(mk, 0, rank_fn=lambda n: (n - 1) // 2 + 1, return_counts=True)
    hi = grouped_quantile(
        mk, 0, rank_fn=lambda n: min((n - 1) // 2 + 1 + ((n - 1) % 2), n)
    )
    med = {g: 2 * a + (hi[g] - a) * ((n - 1) % 2) for g, (a, n) in lo.items()}
    assert med == {"odd": 10, "even": 10, "one": 84}  # 5, 5.0, 42 in half-units


def test_stratified_sample_batch_invariance(ray_session):
    """The per-batch partial head must not change the final sample: running
    on 1 block and on many blocks gives identical (lang, doc_id, rn) rows."""
    import ray.data as rd

    from layout_analysis_ray.functions.sampling import stratified_sample_by_lang

    sf = "/root/testdata/sf0.001"
    base = stratified_sample_by_lang(sf).to_pandas()

    # same partial+merge plan, but with the input forced into 17 tiny blocks
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"])

    def run_on(ds):
        import hashlib as _h

        def partial(batch):
            ids = batch.column("doc_id").to_pylist()
            df = pd.DataFrame(
                {
                    "lang": batch.column("lang").to_pylist(),
                    "doc_id": ids,
                    "h": [_h.md5(str(i).encode()).hexdigest() for i in ids],
                }
            )
            return pa.Table.from_pandas(
                df.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(10),
                preserve_index=False,
            )

        def merge(g):
            top = g.sort_values(["h", "doc_id"]).head(10)
            return pd.DataFrame(
                {
                    "lang": top["lang"].to_numpy(),
                    "doc_id": top["doc_id"].to_numpy(),
                    "rn": np.arange(1, len(top) + 1, dtype=np.int64),
                }
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(merge, batch_format="pandas")
            .to_pandas()
        )

    alt = run_on(rd.from_arrow(t).repartition(17))
    key = lambda d: sorted(map(tuple, d[["lang", "doc_id", "rn"]].to_numpy()))
    assert key(alt) == key(base)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**15), max_value=10**15), min_size=1, max_size=300
    ),
    st.data(),
)
def test_kth_smallest_property(ray_session, vals, data):
    """Random arrays + random rank subsets, full int64-ish domain."""
    from layout_analysis_ray.functions.quantiles import kth_smallest

    arr = np.asarray(vals, dtype=np.int64)
    n = len(arr)
    ranks = data.draw(
        st.lists(st.integers(min_value=1, max_value=n), min_size=1, max_size=5)
    )
    sv = np.sort(arr)
    got = kth_smallest(_mk(arr), sorted(set(ranks)))
    assert got == {k: int(sv[k - 1]) for k in set(ranks)}


def test_winsorize_reconciles_with_numpy(ray_session):
    """The clip bounds must equal the rank-convention p05/p95 of the raw
    cents, every row must be clipped into them, and in-range rows must
    pass through untouched."""
    from layout_analysis_ray.functions.numeric import cents_np
    from layout_analysis_ray.functions.quantiles import events_value_winsorized

    sf = "/root/testdata/sf0.001"
    out = events_value_winsorized(sf).to_pandas()
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{sf}/events.parquet", columns=["value"])
    c = np.sort(cents_np(raw["value"].to_numpy(zero_copy_only=False)))
    n = len(c)
    lo = c[(50_000 * n + 999_999) // 1_000_000 - 1]
    hi = c[(950_000 * n + 999_999) // 1_000_000 - 1]
    w = out["winsorized_cents"].to_numpy()
    v = out["value_cents"].to_numpy()
    assert len(out) == n
    assert w.min() == lo and w.max() == hi
    inside = (v >= lo) & (v <= hi)
    assert (w[inside] == v[inside]).all()
    assert (w[v < lo] == lo).all() and (w[v > hi] == hi).all()


def test_grouped_weighted_quantile_vs_bruteforce(ray_session):
    """Weighted median per group vs a brute-force cumulative-weight scan:
    smallest v whose running weight over sorted values reaches
    ceil(q * total_weight) — ties, skewed weights, and a singleton group."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile

    rng = np.random.default_rng(11)
    n = 4000
    g = rng.choice(["a", "b", "c"], n).tolist() + ["solo"]
    v = np.concatenate(
        [np.repeat(rng.integers(-100, 100, n // 4), 4)[:n], [7]]
    ).astype(np.int64)
    w = np.concatenate([rng.integers(1, 50, n), [3]]).astype(np.int64)
    tbl = pa.table(
        {
            "g": pa.array(g, pa.string()),
            "v": pa.array(v, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )

    def make_ds():
        return rd.from_arrow(tbl).repartition(7)

    for q_ppm in (250_000, 500_000, 900_000):
        got = grouped_quantile(make_ds, q_ppm, weighted=True)
        for key in set(g):
            m = np.array([x == key for x in g])
            order = np.argsort(v[m], kind="stable")
            sv, sw = v[m][order], w[m][order]
            k = (q_ppm * int(sw.sum()) + 999_999) // 1_000_000
            exp = int(sv[np.searchsorted(np.cumsum(sw), k)])
            assert got[key] == exp, (q_ppm, key)


def test_grouped_weighted_quantile_overflow_guard(ray_session):
    """Weights big enough that a block's bin-sum could pass 2^53 must fail
    LOUDLY instead of silently walking the narrowing to a wrong value."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 4, pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
            "w": pa.array([2**52, 2**52, 1, 1], pa.int64()),
        }
    )
    with pytest.raises((ValueError, Exception)) as ei:
        grouped_quantile(lambda: rd.from_arrow(tbl), 500_000, weighted=True)
    assert "2^53" in str(ei.value) or "2^53" in repr(ei.value)


def test_grouped_weighted_quantile_zero_weight_group(ray_session):
    """An all-zero-weight group resolves to its min value (the SQL
    `cum >= 0` contract) without a histogram pass, alongside groups with
    real weight."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile

    tbl = pa.table(
        {
            "g": pa.array(["z", "z", "a", "a", "a"], pa.string()),
            "v": pa.array([9, 4, 1, 2, 3], pa.int64()),
            "w": pa.array([0, 0, 1, 1, 2], pa.int64()),
        }
    )
    got = grouped_quantile(lambda: rd.from_arrow(tbl), 500_000, weighted=True)
    # 'a': W=4, k=2 -> cum(1)=1 < 2, cum(2)=2 -> median 2; 'z': min v = 4
    assert got == {"a": 2, "z": 4}


def test_grouped_quantile_multi_vs_bruteforce(ray_session):
    """Several ranks per group resolve in ONE shared narrowing and match the
    per-group sorted brute force — wide domains, a 1-row group, and ranks
    that diverge into different bins (the disjoint-slot path) all together."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile_multi

    rng = np.random.default_rng(23)
    gs, vs = [], []
    for g, arr in {
        "a": rng.integers(-(10**9), 10**9, 701),
        "b": np.full(50, 13),
        "c": np.array([10**12]),
        "d": rng.integers(0, 1000, 256),
    }.items():
        gs += [g] * len(arr)
        vs.append(arr.astype(np.int64))
    vals = np.concatenate(vs)
    t = pa.table({"g": pa.array(gs, pa.string()), "v": pa.array(vals, pa.int64())})

    q_ppms = {"p10": 100_000, "p50": 500_000, "p90": 900_000}
    rank_fns = {
        lbl: (lambda q: lambda n: (q * n + 999_999) // 1_000_000)(q)
        for lbl, q in q_ppms.items()
    }
    by_label, counts = grouped_quantile_multi(
        lambda: rd.from_arrow(t).repartition(5), rank_fns
    )
    garr = np.asarray(gs)
    for g in set(gs):
        sv = np.sort(vals[garr == g])
        assert counts[g] == len(sv)
        for lbl, q in q_ppms.items():
            k = (q * len(sv) + 999_999) // 1_000_000
            assert by_label[lbl][g] == int(sv[k - 1]), (g, lbl)


def test_grouped_quantile_multi_weighted_vs_bruteforce(ray_session):
    """Weighted multi-rank: two cumulative-weight thresholds per group in one
    narrowing, including an all-zero-weight group (resolves to min v)."""
    import ray.data as rd

    from layout_analysis_ray.functions.quantiles import grouped_quantile_multi

    rng = np.random.default_rng(7)
    n = 2000
    g = rng.choice(["a", "b"], n).tolist() + ["z", "z"]
    v = np.concatenate([rng.integers(-500, 500, n), [9, 4]]).astype(np.int64)
    w = np.concatenate([rng.integers(1, 20, n), [0, 0]]).astype(np.int64)
    tbl = pa.table(
        {
            "g": pa.array(g, pa.string()),
            "v": pa.array(v, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )
    q_ppms = {"q25": 250_000, "q75": 750_000}
    rank_fns = {
        lbl: (lambda q: lambda n_: (q * n_ + 999_999) // 1_000_000)(q)
        for lbl, q in q_ppms.items()
    }
    by_label, _ = grouped_quantile_multi(
        lambda: rd.from_arrow(tbl).repartition(7), rank_fns, weighted=True
    )
    garr = np.asarray(g)
    for key in ("a", "b"):
        m = garr == key
        order = np.argsort(v[m], kind="stable")
        sv, sw = v[m][order], w[m][order]
        for lbl, q in q_ppms.items():
            k = (q * int(sw.sum()) + 999_999) // 1_000_000
            exp = int(sv[np.searchsorted(np.cumsum(sw), k)])
            assert by_label[lbl][key] == exp, (key, lbl)
    assert by_label["q25"]["z"] == 4 and by_label["q75"]["z"] == 4


def test_grouped_quantile_multi_put_tier(ray_session, monkeypatch):
    """Force the slot table over GROUPED_BROADCAST_ROWS so the ray.put
    graduation path runs; results must match the closure tier exactly."""
    import ray.data as rd

    from layout_analysis_ray.functions import quantiles as Q

    rng = np.random.default_rng(31)
    gs = [f"g{i:03d}" for i in rng.integers(0, 40, 3000)]
    vs = rng.integers(-(10**6), 10**6, 3000).astype(np.int64)
    t = pa.table({"g": pa.array(gs, pa.string()), "v": pa.array(vs, pa.int64())})
    rank_fns = {
        "p25": lambda n: (250_000 * n + 999_999) // 1_000_000,
        "p75": lambda n: (750_000 * n + 999_999) // 1_000_000,
    }
    base, _ = Q.grouped_quantile_multi(lambda: rd.from_arrow(t), rank_fns)
    monkeypatch.setattr(Q, "GROUPED_BROADCAST_ROWS", 1)
    put, _ = Q.grouped_quantile_multi(
        lambda: rd.from_arrow(t).repartition(4), rank_fns
    )
    assert put == base
