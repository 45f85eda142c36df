"""Exact distributed quantiles via iterative histogram narrowing.

The scale-path alternative to ``ds.sort()`` for order statistics: a global
sort is an all-to-all shuffle of every row, while the k-th smallest element
of an integer column can be found in a handful of STREAMING passes that
shuffle nothing — each pass maps the column to a bounded histogram whose
partials merge through a native Sum aggregate, and the driver only ever
sees one merged histogram (<= N_BUCKETS x intervals rows) per pass.

Algorithm (classic parallel selection, cf. external-memory k-th element):
  pass 0: native Min/Max/Count aggregate;
  pass i: bucket every in-interval value into N_BUCKETS equal-width bins,
          merge bin counts distributed, locate the bin containing each
          requested rank, recurse into that bin's value range.
Each pass shrinks the candidate range by N_BUCKETS x, so cent-scale domains
(~1e9) resolve exactly in <= 3 full-column scans regardless of row count.
Ranks sharing a bin share the next pass's histogram (intervals are deduped),
so the per-pass cost is one map over the column + a tiny aggregate.

Quantile convention (mirrored exactly by the SQL oracle, integer math):
rank k of quantile q_ppm over n rows is ceil(q_ppm * n / 1e6) 1-based =
(q_ppm * n + 999_999) // 1_000_000, i.e. the smallest value v such that at
least k values are <= v.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_BUCKETS = 4096
DEFAULT_QS_PPM = (250_000, 500_000, 750_000, 900_000)
# above this many unresolved groups the per-pass interval table is shipped
# once via ray.put instead of riding in every task closure
GROUPED_BROADCAST_ROWS = 100_000


from .numeric import cents_arrow as _cents  # noqa: E402 — shared convention


def _min_max_count(make_ds) -> tuple[int, int, int]:
    """(min, max, count) of column ``v`` in one native-aggregate pass.
    (Count() must ride along with Min/Max: a bare ``aggregate(Count())``
    returns 0 in this Ray version.)"""
    from ray.data.aggregate import Count, Max, Min

    stats = make_ds().aggregate(Min("v"), Max("v"), Count())
    n = int(stats["count()"])
    if n == 0:
        raise ValueError("empty column")
    return int(stats["min(v)"]), int(stats["max(v)"]), n


def kth_smallest(make_ds, ranks: list[int], _stats=None) -> dict[int, int]:
    """Exact k-th smallest (1-based ranks) of the int64 column ``v`` of the
    dataset built by ``make_ds()`` (a factory: each histogram pass consumes
    one fresh streaming execution of the underlying read+map plan).

    Returns {rank: value}.  Ranks must be within [1, row_count].
    """
    from ray.data.aggregate import Sum

    if not ranks:
        return {}
    lo_all, hi_all, n = _stats if _stats is not None else _min_max_count(make_ds)
    bad = [k for k in ranks if not 1 <= k <= n]
    if bad:
        raise ValueError(f"ranks out of range 1..{n}: {bad}")

    # state per rank: (lo, hi, offset) — offset = #values < lo globally
    state = {k: (lo_all, hi_all, 0) for k in ranks}
    resolved: dict[int, int] = {}

    while True:
        for k, (lo, hi, _off) in list(state.items()):
            if lo == hi:
                resolved[k] = lo
                del state[k]
        if not state:
            return resolved

        # dedupe intervals so ranks narrowed into the same bin share a scan
        intervals = sorted({(lo, hi) for (lo, hi, _o) in state.values()})
        iv_id = {iv: i for i, iv in enumerate(intervals)}
        widths = [
            max(1, -((-(hi - lo + 1)) // N_BUCKETS)) for lo, hi in intervals
        ]  # ceil division

        iv_arr = np.array([[lo, hi] for lo, hi in intervals], dtype=np.int64)
        w_arr = np.array(widths, dtype=np.int64)

        def hist(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            out_iv, out_b, out_c = [], [], []
            for i in range(len(iv_arr)):
                lo, hi = iv_arr[i]
                sel = v[(v >= lo) & (v <= hi)]
                if not len(sel):
                    continue
                b = (sel - lo) // w_arr[i]
                binc = np.bincount(b)
                nzb = np.nonzero(binc)[0]
                out_iv.append(np.full(len(nzb), i, dtype=np.int64))
                out_b.append(nzb.astype(np.int64))
                out_c.append(binc[nzb].astype(np.int64))
            if not out_iv:
                return pa.table(
                    {
                        "iv": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "iv": pa.array(np.concatenate(out_iv)),
                    "bucket": pa.array(np.concatenate(out_b)),
                    "cnt": pa.array(np.concatenate(out_c)),
                }
            )

        merged = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow")
            .groupby(["iv", "bucket"])
            .aggregate(Sum("cnt"))
            .take_all()
        )  # <= N_BUCKETS x len(intervals) tiny rows: the merged histogram

        counts = {}
        for r in merged:
            counts.setdefault(int(r["iv"]), {})[int(r["bucket"])] = int(r["sum(cnt)"])

        for k, (lo, hi, off) in list(state.items()):
            i = iv_id[(lo, hi)]
            w = int(w_arr[i])
            binc = counts.get(i, {})
            cum = 0
            target = k - off  # rank within this interval
            for b in sorted(binc):
                c = binc[b]
                if cum + c >= target:
                    new_lo = lo + b * w
                    new_hi = min(hi, new_lo + w - 1)
                    state[k] = (new_lo, new_hi, off + cum)
                    break
                cum += c
            else:  # pragma: no cover — rank <= count guarantees a bin
                raise AssertionError("rank not found in histogram")


def _pin(make_ds):
    """Materialize the narrow dataset once (8-17 B/row, spillable) and
    return a thunk over the pinned blocks.  The histogram-narrowing
    passes are sequential, so the materialize barrier is free — the
    stats pass and every narrowing pass then scan object-store blocks
    instead of re-decoding parquet (or re-running an upstream derive
    map) per pass.  Measured interleaved at sf0.1/32 CPUs: 2.72-2.87 s
    vs 3.16-3.62 s streaming (BASELINE.md round-5 notes)."""
    ds = make_ds().materialize()
    return lambda: ds


def _quantile_table(make_ds, qs_ppm) -> pa.Table:
    pinned = _pin(make_ds)
    stats = _min_max_count(pinned)
    n = stats[2]
    ranks = {q: (q * n + 999_999) // 1_000_000 for q in qs_ppm}
    vals = kth_smallest(pinned, sorted(set(ranks.values())), _stats=stats)
    return pa.table(
        {
            "q_ppm": pa.array(sorted(qs_ppm), pa.int64()),
            "value_cents": pa.array(
                [vals[ranks[q]] for q in sorted(qs_ppm)], pa.int64()
            ),
        }
    )


def lineitem_price_quantiles(sf_dir: str, qs_ppm=DEFAULT_QS_PPM) -> pa.Table:
    """Exact (q_ppm, value_cents) quantiles of l_extendedprice over the
    biggest table — ~3 streaming scans, no sort, no shuffle of rows."""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        ).map_batches(
            lambda b: pa.table({"v": _cents(b["l_extendedprice"])}),
            batch_format="pyarrow",
        )

    return _quantile_table(make_ds, qs_ppm)


def events_value_quantiles(sf_dir: str, qs_ppm=DEFAULT_QS_PPM) -> pa.Table:
    """Exact (q_ppm, value_cents) quantiles of events.value."""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["value"]
        ).map_batches(
            lambda b: pa.table({"v": _cents(b["value"])}), batch_format="pyarrow"
        )

    return _quantile_table(make_ds, qs_ppm)

# winsorization cut ranks (p05 / p95), mirrored in the oracle SQL
WINSOR_LO_PPM = 50_000
WINSOR_HI_PPM = 950_000


def events_value_winsorized(sf_dir: str) -> "object":
    """Outlier clipping at exact p05/p95: every event row with its value
    and the value clipped into [p05, p95] cents.

    Scale shape: the two cut values come from the shared histogram-
    narrowing machinery (<= ~3 streaming scans, no row sort, no row
    shuffle); the clip itself is ONE map-only pass with the 16-byte cut
    pair riding the task closure.  Total: zero shuffles at any scale.
    """
    import ray.data as rd

    from .schema import ensure_schema

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["value"]
        ).map_batches(
            lambda b: pa.table({"v": _cents(b["value"])}), batch_format="pyarrow"
        )

    pinned = _pin(make_ds)
    stats = _min_max_count(pinned)
    n = stats[2]
    ranks = {
        q: (q * n + 999_999) // 1_000_000
        for q in (WINSOR_LO_PPM, WINSOR_HI_PPM)
    }
    vals = kth_smallest(pinned, sorted(set(ranks.values())), _stats=stats)
    lo_cut = vals[ranks[WINSOR_LO_PPM]]
    hi_cut = vals[ranks[WINSOR_HI_PPM]]

    def clip(batch: pa.Table) -> pa.Table:
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "value_cents": pa.array(v, pa.int64()),
                "winsorized_cents": pa.array(
                    np.clip(v, lo_cut, hi_cut), pa.int64()
                ),
            }
        )

    return ensure_schema(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"]
        ).map_batches(clip, batch_format="pyarrow"),
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("value_cents", pa.int64()),
                ("winsorized_cents", pa.int64()),
            ]
        ),
    )


def _interp_quartiles(make_ds) -> pa.Table:
    """PERCENTILE_CONT / quantile_cont quartiles in EXACT integer
    arithmetic: position of quartile pq/4 over n rows is pos = (n-1) * pq
    quarter-steps, so the interpolated value is
        4*a + (b - a) * (pos % 4)   in quarter-cent units,
    where a, b are the (pos//4 + 1)-th and next order statistics.  The six
    (deduped) ranks resolve in ONE shared ``kth_smallest`` narrowing —
    adjacent ranks land in the same histogram bin, so the pass count stays
    ~log_B(range).  No floats anywhere, so the oracle hash matches
    bit-for-bit."""
    make_ds = _pin(make_ds)
    stats = _min_max_count(make_ds)
    n = stats[2]
    want: dict[int, tuple[int, int, int]] = {}
    ranks: set[int] = set()
    for pq in (1, 2, 3):
        lo0, f4 = divmod((n - 1) * pq, 4)
        ra = lo0 + 1
        rb = min(ra + 1, n) if f4 else ra
        want[pq] = (ra, rb, f4)
        ranks |= {ra, rb}
    vals = kth_smallest(make_ds, sorted(ranks), _stats=stats)
    return pa.table(
        {
            "q_ppm": pa.array([pq * 250_000 for pq in (1, 2, 3)], pa.int64()),
            "value_qcents": pa.array(
                [
                    4 * vals[want[pq][0]]
                    + (vals[want[pq][1]] - vals[want[pq][0]]) * want[pq][2]
                    for pq in (1, 2, 3)
                ],
                pa.int64(),
            ),
        }
    )


def lineitem_price_quartiles_interp(sf_dir: str) -> pa.Table:
    """Interpolated (quantile_cont) quartiles of l_extendedprice in exact
    quarter-cent integers — the continuous sibling of
    ``lineitem_price_quantiles`` (which is the discrete smallest-rank
    convention).  Same streaming histogram narrowing, no sort."""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        ).map_batches(
            lambda b: pa.table({"v": _cents(b["l_extendedprice"])}),
            batch_format="pyarrow",
        )

    return _interp_quartiles(make_ds)


# ---------------------------------------------------------------------------
# Per-group exact quantiles (same narrowing, histogram keyed by group)
# ---------------------------------------------------------------------------

def grouped_quantile_multi(
    make_ds, rank_fns: dict, *, weighted=False, _stats_rows=None,
):
    """Exact MULTI-rank quantiles PER GROUP of a dataset with columns
    (g: string, v: int64): one grouped Min/Max/Count aggregate, then
    histogram passes where every unresolved (label, group) pair narrows
    its own interval — ALL labels and ALL groups advance in the SAME
    pass, so the scan count stays ~log_B(range) regardless of how many
    quantiles are requested (the whole point: callers needing two or
    three boundaries per group pay for one narrowing, not two or three).

    ``rank_fns`` maps label -> (n -> 1-based rank).  Returns
    ``(by_label, counts_by_g)`` where ``by_label[label][g]`` is the
    label's order statistic for group g and ``counts_by_g[g]`` is the
    group's row count (total weight when ``weighted``).

    Interval bookkeeping: within one group, every label starts on the
    same [min, max] interval and each pass replaces an interval with one
    bin of ITS OWN equal-width grid — so by induction all of a group's
    live intervals are pairwise equal-or-disjoint.  Deduping equal ones
    leaves <= len(rank_fns) disjoint "slots" per group, and each row
    lands in at most one slot: the hist kernel stays one vectorized
    (rows x slots-per-group) compare, slots-per-group a small constant.

    The per-pass driver state is one merged histogram of <= N_BUCKETS x
    live-slots rows and the slot table is ~24 B/slot (broadcast inside
    the map closure; swapped to ray.put above ~10^5 slots).  For very
    high group cardinality shrink N_BUCKETS — more passes, bounded
    driver rows.

    With ``weighted=True`` the dataset carries a third int64 column ``w``
    (positive weights) and ranks count CUMULATIVE WEIGHT: the smallest v
    whose running weight reaches rank_fn(W), W the group's total weight —
    the SQL ``SUM(w) OVER (ORDER BY v)`` threshold.  The histogram pass
    bin-sums weights (exact: per-block weight sums stay far below 2^53,
    and the cross-block merge is a native int64 Sum).
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    rows = (
        _stats_rows
        if _stats_rows is not None
        else make_ds()
        .groupby("g")
        .aggregate(Min("v"), Max("v"), Sum("w") if weighted else Count())
        .take_all()
    )
    # state per (label, group): (lo, hi, offset, target_rank)
    state = {}
    counts_by_g: dict[str, int] = {}
    for r in rows:
        n = int(r["sum(w)"] if weighted else r["count()"])
        counts_by_g[r["g"]] = n
        for lbl, fn in rank_fns.items():
            k = fn(n)
            if weighted and n == 0:
                # all-zero-weight group: the SQL threshold `cum >= 0` is
                # met at the group's first value, so it resolves to min(v)
                # with no histogram pass (the weighted hist would never
                # emit its bins)
                state[(lbl, r["g"])] = (int(r["min(v)"]), int(r["min(v)"]), 0, k)
            else:
                state[(lbl, r["g"])] = (int(r["min(v)"]), int(r["max(v)"]), 0, k)
    resolved: dict[tuple, int] = {}

    while True:
        for key, (lo, hi, _o, _k) in list(state.items()):
            if lo == hi:
                resolved[key] = lo
                del state[key]
        if not state:
            by_label = {lbl: {} for lbl in rank_fns}
            for (lbl, g), v in resolved.items():
                by_label[lbl][g] = v
            return by_label, counts_by_g

        # dedupe each group's live intervals into disjoint slots
        slot_map: dict[str, list] = {}
        for (lbl, g), (lo, hi, _o, _k) in state.items():
            ivs = slot_map.setdefault(g, [])
            if (lo, hi) not in ivs:
                ivs.append((lo, hi))
        groups = sorted(slot_map)
        g_idx = {g: i for i, g in enumerate(groups)}
        for g in groups:
            slot_map[g].sort()
        n_slots = max(len(slot_map[g]) for g in groups)
        # padded (group x slot) matrices; pad rows are the empty range
        # lo=0 > hi=-1 so no value ever matches a pad slot
        lo_mat = np.zeros((len(groups), n_slots), dtype=np.int64)
        hi_mat = np.full((len(groups), n_slots), -1, dtype=np.int64)
        for g in groups:
            for s, (lo, hi) in enumerate(slot_map[g]):
                lo_mat[g_idx[g], s] = lo
                hi_mat[g_idx[g], s] = hi
        w_mat = np.maximum(1, -((-(hi_mat - lo_mat + 1)) // N_BUCKETS))
        # type-inferred: group keys are strings for the per-key queries,
        # a constant int64 for single-group weighted callers
        group_arr = pa.array(groups)

        # slot table travels in the task closure while it's tiny; above
        # the documented bound it graduates to one object-store put so huge
        # group counts aren't re-shipped per task.
        if lo_mat.size > GROUPED_BROADCAST_ROWS:
            import ray

            _ref = ray.put((group_arr, lo_mat, hi_mat, w_mat))

            def _fetch():
                import ray as _ray

                return _ray.get(_ref)

        else:
            _local = (group_arr, lo_mat, hi_mat, w_mat)

            def _fetch():
                return _local

        def hist(batch: pa.Table) -> pa.Table:
            ga, lo_m, hi_m, w_m = _fetch()
            # Arrow hash-kernel group lookup — no Python-object conversion
            idx = pc.index_in(batch["g"], value_set=ga)
            known = np.asarray(pc.is_valid(idx).to_numpy(zero_copy_only=False))
            gi = np.asarray(
                pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False)
            # (rows x slots-per-group) containment — slots are disjoint,
            # so each row matches at most one
            vs = v[:, None]
            in_slot = (vs >= lo_m[gi]) & (vs <= hi_m[gi])
            s = in_slot.argmax(axis=1)
            inr = known & in_slot.any(axis=1)
            if not inr.any():
                return pa.table(
                    {
                        "iv": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            gis, ss = gi[inr], s[inr]
            b = (v[inr] - lo_m[gis, ss]) // w_m[gis, ss]
            slot_global = gis * np.int64(lo_m.shape[1]) + ss
            comp = slot_global * np.int64(N_BUCKETS) + b
            if weighted:
                wv = batch["w"].to_numpy(zero_copy_only=False)
                ws = wv[inr]
                # float64 bin-sum is exact while every intermediate sum
                # stays below 2^53; each bin's running sum is bounded by
                # the block total, so bound that LOUDLY (silent drift here
                # would walk the narrowing to a wrong quantile)
                if len(ws) and int(ws.max()) * len(ws) >= 2**53:
                    raise ValueError(
                        "per-block weight total may exceed 2^53 — shrink "
                        "blocks or rescale weights before grouped_quantile"
                    )
                binc = np.rint(np.bincount(comp, weights=ws))
            else:
                binc = np.bincount(comp)
            nz = np.nonzero(binc)[0]
            return pa.table(
                {
                    "iv": pa.array(nz // N_BUCKETS),
                    "bucket": pa.array(nz % N_BUCKETS),
                    "cnt": pa.array(binc[nz].astype(np.int64)),
                }
            )

        merged = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow")
            .groupby(["iv", "bucket"])
            .aggregate(Sum("cnt"))
            .take_all()
        )
        counts: dict[int, dict[int, int]] = {}
        for r in merged:
            counts.setdefault(int(r["iv"]), {})[int(r["bucket"])] = int(r["sum(cnt)"])

        for key in list(state):
            lo, hi, off, k = state[key]
            g = key[1]
            i = g_idx[g] * n_slots + slot_map[g].index((lo, hi))
            w = int(w_mat.flat[i])
            cum = 0
            target = k - off
            for b in sorted(counts.get(i, {})):
                c = counts[i][b]
                if cum + c >= target:
                    new_lo = lo + b * w
                    state[key] = (new_lo, min(hi, new_lo + w - 1), off + cum, k)
                    break
                cum += c
            else:  # pragma: no cover
                raise AssertionError(f"rank not found for {key!r}")


def grouped_quantile(
    make_ds, q_ppm: int, rank_fn=None, return_counts=False, _stats_rows=None,
    weighted=False,
):
    """Exact q-quantile PER GROUP — the single-rank wrapper over
    ``grouped_quantile_multi`` (see there for the narrowing machinery).

    ``rank_fn(n) -> 1-based rank`` overrides the default ceil(q_ppm*n/1e6)
    convention (used by the interpolated variants, which need the two
    adjacent order statistics).  With ``return_counts`` the result is
    {g: (value, n)} instead of {g: value}.  ``_stats_rows`` (the grouped
    Min/Max/Count take_all rows) lets callers running several narrowings
    over the same dataset pay for that first scan once — though callers
    wanting several RANKS should pass them all to
    ``grouped_quantile_multi`` and share the histogram passes too.
    """
    fn = rank_fn if rank_fn is not None else (
        lambda n: (q_ppm * n + 999_999) // 1_000_000
    )
    by_label, counts_by_g = grouped_quantile_multi(
        make_ds, {"q": fn}, weighted=weighted, _stats_rows=_stats_rows
    )
    res = by_label["q"]
    if return_counts:
        return {g: (v, counts_by_g[g]) for g, v in res.items()}
    return res


def events_value_median_by_type(sf_dir: str) -> pa.Table:
    """Exact per-event-type median of events.value (cents) — grouped
    histogram narrowing, no per-group sort."""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(
            lambda b: pa.table({"g": b["event_type"], "v": _cents(b["value"])}),
            batch_format="pyarrow",
        )

    med = grouped_quantile(_pin(make_ds), 500_000)
    keys = sorted(med)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "median_cents": pa.array([med[k] for k in keys], pa.int64()),
        }
    )


def events_value_median_interp_by_type(sf_dir: str) -> pa.Table:
    """PERCENTILE_CONT(0.5) per event type in exact HALF-CENT integers —
    the interpolated sibling of ``events_value_median_by_type``.  For a
    group of n values the median position is (n-1)/2, so the value is
        2*a + (b - a) * ((n-1) % 2)
    where a is the ((n-1)//2 + 1)-th order statistic and b the next one.
    ONE multi-rank grouped narrowing resolves both order statistics for
    every group in the same histogram passes (``grouped_quantile_multi``
    slot bookkeeping); no per-group sort, no floats."""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(
            lambda b: pa.table({"g": b["event_type"], "v": _cents(b["value"])}),
            batch_format="pyarrow",
        )

    by_label, counts = grouped_quantile_multi(
        _pin(make_ds),
        {
            "lo": lambda n: (n - 1) // 2 + 1,
            "hi": lambda n: min((n - 1) // 2 + 1 + ((n - 1) % 2), n),
        },
    )
    lo_stat, hi_stat = by_label["lo"], by_label["hi"]
    keys = sorted(lo_stat)
    med = []
    for g in keys:
        a, n = lo_stat[g], counts[g]
        b = hi_stat[g]
        med.append(2 * a + (b - a) * ((n - 1) % 2))
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "median_hcents": pa.array(med, pa.int64()),
        }
    )


def events_value_quartile(sf_dir: str):
    """Row-level quartile assignment composed from the exact quantile
    kernel: the three boundary values come from ``kth_smallest`` (streaming
    scans), then one map assigns quartile = 1 + #boundaries strictly below
    the row's value — boundaries broadcast as three ints, rows never
    shuffle.  (NOT SQL NTILE, which splits ties by row count; this is the
    value-boundary definition, mirrored exactly by the oracle.)"""
    import ray.data as rd

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["value"]
        ).map_batches(
            lambda b: pa.table({"v": _cents(b["value"])}), batch_format="pyarrow"
        )

    pinned = _pin(make_ds)
    stats = _min_max_count(pinned)
    n = stats[2]
    ranks = {q: (q * n + 999_999) // 1_000_000 for q in (250_000, 500_000, 750_000)}
    vals = kth_smallest(pinned, sorted(set(ranks.values())), _stats=stats)
    b1, b2, b3 = (vals[ranks[q]] for q in (250_000, 500_000, 750_000))

    def assign(batch: pa.Table) -> pa.Table:
        c = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        quart = 1 + (c > b1).astype(np.int64) + (c > b2) + (c > b3)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "quartile": pa.array(quart.astype(np.int64), pa.int64()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(assign, batch_format="pyarrow")


def events_value_mad_by_type(sf_dir: str) -> pa.Table:
    """Median absolute deviation per event type, exact in cents: the
    grouped histogram-narrowing median runs twice — once over value
    cents, once over |cents − group median| with the tiny per-group
    median table riding the map closure (group count is the broadcast
    bound, same as ``grouped_quantile``'s own interval table).  Both
    passes use the engine-wide exact-rank convention
    (500000·n + 999999) // 10⁶, so even-count groups take the lower
    middle value rather than interpolating — mirrored verbatim in the
    SQL oracle.  NULL event_type rows are excluded on both sides.
    """
    import ray.data as rd

    def base(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["event_type"]))
        return pa.table({"g": b["event_type"], "v": _cents(b["value"])})

    def make_ds():
        return rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(base, batch_format="pyarrow")

    # one pin serves BOTH narrowings: the abs-deviation pass derives from
    # the pinned (g, v) blocks (cheap numpy sub/abs) instead of re-decoding
    # and re-filtering parquet per pass
    pinned = _pin(make_ds)
    med = grouped_quantile(pinned, 500_000)
    keys = sorted(med)
    key_arr = pa.array(keys, pa.string())
    med_arr = np.array([med[k] for k in keys], dtype=np.int64)

    def absdev(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["g"], value_set=key_arr)
        gi = np.asarray(
            pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        v = b["v"].to_numpy(zero_copy_only=False)
        return pa.table({"g": b["g"], "v": pa.array(np.abs(v - med_arr[gi]))})

    def make_abs_ds():
        return pinned().map_batches(absdev, batch_format="pyarrow")

    mad = grouped_quantile(make_abs_ds, 500_000)
    return pa.table(
        {
            "event_type": key_arr,
            "median_cents": pa.array(med_arr, pa.int64()),
            "mad_cents": pa.array([mad[k] for k in keys], pa.int64()),
        }
    )


def lineitem_weighted_median_price(sf_dir: str) -> pa.Table:
    """Quantity-WEIGHTED median of l_extendedprice (cents) per returnflag:
    the smallest price whose cumulative quantity reaches half the group's
    total quantity — the curation-pipeline shape for token-weighted
    quality thresholds (weight = doc token count) expressed on the star
    schema.  Weight = quantity cents (scaling all weights by 100 leaves
    every weighted quantile unchanged and keeps the shared _cents
    convention on both engine and oracle sides).

    Same histogram-narrowing scan shape as the unweighted grouped median
    (no row sort, <= ~3 passes, weights merged as native int64 Sums), but
    the (g, v, w) narrow table is MATERIALIZED once: the weighted passes
    need 3 decoded parquet columns each instead of 1, so paying ~17 B/row
    of object store to decode once wins (measured interleaved: 5.1-7.8 s
    materialized vs 6.5-9.0 s streaming per pass set at sf0.1/32 CPUs) —
    the source_quality_floor_keep trade, not the unweighted family's
    rescan-the-column one."""
    import ray.data as rd

    narrow = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice", "l_quantity"],
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "g": b["l_returnflag"],
                    "v": _cents(b["l_extendedprice"]),
                    "w": _cents(b["l_quantity"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    med = grouped_quantile(lambda: narrow, 500_000, weighted=True)
    keys = sorted(med)
    return pa.table(
        {
            "l_returnflag": pa.array(keys, pa.string()),
            "wmedian_cents": pa.array([med[k] for k in keys], pa.int64()),
        }
    )
