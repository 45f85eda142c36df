"""The shared mutable dedup index (raw-actor tier): membership must
survive across ingests, results must be invariant to shard count, and
the keeper within an increment must be the min doc_id — all pinned
against the SQL-oracled two-day query."""

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _sorted(df):
    return df.sort_values("content_hash").reset_index(drop=True)


def test_index_remembers_across_ingests(ray_session):
    from layout_analysis_ray.state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=3)
    first = idx.ingest(_ds([(1, "alpha"), (2, "beta"), (3, "alpha")])).to_pandas()
    assert len(first) == 2
    # same content again: everything already recorded
    again = idx.ingest(_ds([(9, "alpha"), (10, "beta")])).to_pandas()
    assert len(again) == 0
    # new content still admitted, old still blocked
    mixed = idx.ingest(_ds([(20, "gamma"), (21, "alpha")])).to_pandas()
    assert mixed["doc_id"].tolist() == [20]
    assert sum(idx.sizes()) == 3  # alpha, beta, gamma


def test_within_increment_keeper_is_min_doc_id(ray_session):
    from layout_analysis_ray.state.dedup_index import DedupIndex

    out = (
        DedupIndex(num_shards=2)
        .ingest(_ds([(42, "dup"), (7, "dup"), (99, "dup"), (50, "solo")]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [7, 50]
    assert out.loc[0, "n_dups"] == 3


@pytest.mark.parametrize("nsh", [1, 5])
def test_shard_count_invariance(ray_session, nsh):
    from layout_analysis_ray.state.dedup_index import (
        DEFAULT_SHARDS,
        dedup_incremental_ingest,
    )

    base = _sorted(dedup_incremental_ingest(SF, DEFAULT_SHARDS).to_pandas())
    got = _sorted(dedup_incremental_ingest(SF, nsh).to_pandas())
    pd.testing.assert_frame_equal(got, base)
    assert len(base) > 0


def test_cross_day_duplicates_are_dropped(ray_session):
    """Every day-2 row the query returns must have content no day-1 doc
    carries (direct recomputation from the raw table)."""
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.hashing import id_bucket_digit, md5_hex
    from layout_analysis_ray.state.dedup_index import dedup_incremental_ingest

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    digit = id_bucket_digit(docs["doc_id"].to_numpy(zero_copy_only=False))
    hashes = md5_hex(docs["text"]).to_pylist()
    day1 = {h for h, d in zip(hashes, digit) if d < 8}

    out = dedup_incremental_ingest(SF).to_pandas()
    assert len(out) > 0
    assert not any(h in day1 for h in out["content_hash"])


def test_ingest_replay_is_idempotent(ray_session):
    """A Ray task retry or a second consumption of the lazy ingest
    Dataset re-probes the same (hash, epoch) pairs; epoch-first-wins
    semantics must return the identical verdicts, not drop the rows."""
    import ray

    from layout_analysis_ray.state.dedup_index import DedupIndex, _IndexShard

    # actor-level contract: replaying an epoch repeats its verdicts
    shard = ray.remote(_IndexShard).options(num_cpus=0).remote()
    first = ray.get(shard.check_and_add.remote(["a", "b"], 1))
    replay = ray.get(shard.check_and_add.remote(["a", "b"], 1))
    assert first == replay == [True, True]
    later = ray.get(shard.check_and_add.remote(["a", "c"], 2))
    assert later == [False, True]

    # dataset-level contract: consuming the same ingest twice agrees
    idx = DedupIndex(num_shards=2)
    idx.ingest(_ds([(1, "alpha")])).to_pandas()
    day2 = idx.ingest(_ds([(5, "alpha"), (6, "beta")]))
    once = day2.to_pandas()
    twice = day2.to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(once), _sorted(twice)
    )
    assert once["doc_id"].tolist() == [6]


def test_empty_increment(ray_session):
    """An empty increment must flow through (groupby + actor check) as
    zero rows, not a crash — and must not poison the index."""
    from layout_analysis_ray.state.dedup_index import DedupIndex

    idx = DedupIndex(num_shards=2)
    out = idx.ingest(_ds([])).to_pandas()
    assert len(out) == 0
    assert sum(idx.sizes()) == 0
    follow = idx.ingest(_ds([(1, "x")])).to_pandas()
    assert follow["doc_id"].tolist() == [1]


def test_decontaminate_tiers_agree(ray_session):
    """The broadcast (eval keys via object store, zero shuffle) and
    distributed (key-hash partition) tiers must return identical rows
    on the full sf0.001 corpus."""
    from layout_analysis_ray.functions.dedup import decontaminate_ngrams

    def norm(df):
        return df.sort_values("doc_id").reset_index(drop=True)

    broad = norm(decontaminate_ngrams(SF).to_pandas())
    dist = norm(decontaminate_ngrams(SF, broadcast_max_keys=-1).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) > 0


def test_decontaminate_ngrams_planted(ray_session, tmp_path):
    """Planted contamination: shared 3-grams (and the short-doc fallback
    shingle) between chosen eval-digit and training-digit docs must come
    back with exact distinct-shingle counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.dedup import (
        DECON_EVAL_MIN_DIGIT,
        decontaminate_ngrams,
    )
    from layout_analysis_ray.functions.hashing import id_bucket_digit

    ids = np.arange(600, dtype=np.int64)
    digit = id_bucket_digit(ids)
    ev = ids[digit >= DECON_EVAL_MIN_DIGIT][:2]
    tr = ids[digit < DECON_EVAL_MIN_DIGIT][:4]
    rows = {
        int(ev[0]): "alpha beta gamma delta",   # shingles: abg, bgd
        int(ev[1]): "alpha beta",               # fallback shingle "alpha beta"
        int(tr[0]): "alpha beta gamma zzz",     # shares abg -> 1
        int(tr[1]): "alpha beta gamma delta",   # shares abg + bgd -> 2
        int(tr[2]): "nothing in common here",   # -> absent
        int(tr[3]): "alpha beta",               # shares the fallback -> 1
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "text": pa.array(list(rows.values()), pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    want = {int(tr[0]): 1, int(tr[1]): 2, int(tr[3]): 1}
    for max_keys in (None, -1):  # broadcast tier, then distributed tier
        kw = {} if max_keys is None else {"broadcast_max_keys": max_keys}
        out = (
            decontaminate_ngrams(str(tmp_path), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert dict(zip(out["doc_id"], out["n_shared"])) == want, max_keys


# ---------------------------------------------------------------------------
# NearDupIndex (incremental MinHash-band index, VERDICT r4 item 6)
# ---------------------------------------------------------------------------

_BASE = "the quick brown fox jumps over the lazy dog again and again " * 15
_VARIANT = _BASE + "plus one extra trailing clause"
_OTHER = "completely different prose about streaming ray data pipelines " * 15
_FRESH = "yet another unrelated document mentioning arrow tables and actors " * 15


def test_neardup_one_increment_equals_batch_groups(ray_session):
    """A single ingest over the whole corpus must keep exactly the batch
    pipeline's keep set: isolated docs + each LSH cluster's min doc_id."""
    from layout_analysis_ray.functions.dedup import _read_docs
    from layout_analysis_ray.functions.graph import dedup_minhash_groups
    from layout_analysis_ray.state.dedup_index import NearDupIndex

    got = set(
        NearDupIndex(num_shards=4)
        .ingest(_read_docs(SF, ["doc_id", "text"]))
        .to_pandas()["doc_id"]
    )
    groups = dedup_minhash_groups(SF).to_pandas()
    dropped = set(groups.loc[~groups["keep"], "doc_id"])
    all_ids = set(_read_docs(SF, ["doc_id"]).to_pandas()["doc_id"])
    assert got == all_ids - dropped
    assert dropped  # the fixture really has near-dup clusters


def test_neardup_cross_increment_planted(ray_session):
    from layout_analysis_ray.state.dedup_index import NearDupIndex

    idx = NearDupIndex(num_shards=3)
    day1 = idx.ingest(_ds([(1, _BASE), (2, _OTHER)])).to_pandas()
    assert set(day1["doc_id"]) == {1, 2}
    # day 2: the near-dup of day-1's doc 1 is dropped, fresh content kept
    day2 = idx.ingest(_ds([(10, _VARIANT), (11, _FRESH)])).to_pandas()
    assert set(day2["doc_id"]) == {11}


def test_neardup_within_increment_keeper_is_min(ray_session):
    from layout_analysis_ray.state.dedup_index import NearDupIndex

    out = (
        NearDupIndex(num_shards=2)
        .ingest(_ds([(42, _BASE), (7, _VARIANT), (99, _OTHER)]))
        .to_pandas()
    )
    assert set(out["doc_id"]) == {7, 99}


@pytest.mark.parametrize("nsh", [1, 5])
def test_neardup_shard_count_invariance(ray_session, nsh):
    from layout_analysis_ray.state.dedup_index import (
        dedup_neardup_incremental_ingest,
    )

    out = dedup_neardup_incremental_ingest(SF, num_shards=nsh).to_pandas()
    outs = sorted(out["doc_id"].tolist())
    ref = sorted(
        dedup_neardup_incremental_ingest(SF, num_shards=2)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert outs == ref
    assert len(outs) > 0


def test_neardup_replay_is_idempotent(ray_session):
    from layout_analysis_ray.state.dedup_index import NearDupIndex

    idx = NearDupIndex(num_shards=3)
    idx.ingest(_ds([(1, _BASE)])).count()
    second = idx.ingest(_ds([(5, _VARIANT), (6, _FRESH)]))
    a = sorted(second.to_pandas()["doc_id"].tolist())
    # consuming the SAME lazy ingest Dataset again re-probes identical
    # (key, epoch) pairs and must repeat the verdicts
    b = sorted(second.to_pandas()["doc_id"].tolist())
    assert a == b == [6]
