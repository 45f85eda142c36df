"""Distributed Bloom filter for semi-join pushdown (sideways information
passing).

The reference engine has no joins at all (SURVEY.md §2.4 J-ops are this
repo's additions); at 100 TB the dominant cost of a fact-fact equi-join is
the all-to-all shuffle, and most shuffled probe rows never match.  The
classic fix is to build a Bloom filter over the build side's keys and drop
non-matching probe rows BEFORE they enter the exchange: the join result is
unchanged (the hash join still verifies every candidate; Bloom errors are
one-sided), but the shuffle moves only `match_rate + fp_rate` of the probe
side.

Shape (same 2-level merge tree as the CMS sketch in ``sketches.py``):

1. each build-side batch sets its keys' bits in a private bitmap and emits
   ONE fixed-size binary row (``nbits/8`` bytes, content-addressed merge
   partition);
2. bitmaps OR-merge associatively in a two-level ``groupby`` tree — no
   per-batch bitmap ever reaches the driver;
3. the single merged bitmap is ``ray.put`` once and probed inside
   ``map_batches`` with vectorized bit tests.

Sizing: ~10 bits/key and 4 hashes gives ~1-2% false positives; at 10^9
build keys that is a 1.2 GB broadcast — large but shippable once per
job, versus shuffling the 10-100x larger non-matching probe volume.
Wired into ``pipelines.relational.q3_top_orders(use_bloom=True)``
(oracle-checked: the prefilter provably cannot change the join result).

When it pays: the build side must materialize BEFORE the probe scan
starts, which serializes two scans that otherwise pipeline, and the win
is shuffle bytes NOT shuffled.  On this single-node sandbox the exchange
is in-memory, so the barrier costs more than the savings (interleaved
sf0.1 window: q3 4.8-5.9 s without vs 6.2-6.3 s with) — ``use_bloom``
therefore defaults to False here.  On a multi-node cluster the exchange
is network-bound and the probe side is 10-100x the build side, which is
the regime this exists for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# distinct odd multipliers + the splitmix64 finalizer => 4 independent,
# process-independent hash functions over int64 keys
_BLOOM_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

DEFAULT_NBITS = 1 << 20  # 128 KiB bitmap; size ~10 bits/key at real scale
_MERGE_FANIN = 32


def _bit_positions(keys: np.ndarray, nbits: int) -> list[np.ndarray]:
    """One int64 position array per hash function (deterministic, no
    Python ``hash()``; uint64 wrap-around multiply is well-defined)."""
    x0 = keys.astype(np.uint64)
    out = []
    for seed in _BLOOM_SEEDS:
        x = x0 * seed
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
        out.append((x % np.uint64(nbits)).astype(np.int64))
    return out


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words, pos >> 6, np.left_shift(np.uint64(1), (pos & 63).astype(np.uint64))
    )


def bloom_contains(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True = maybe present (one-sided error),
    False = definitely absent."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    nbits = words.size * 64
    mask = np.ones(keys.size, dtype=bool)
    for pos in _bit_positions(keys, nbits):
        bits = np.right_shift(words[pos >> 6], (pos & 63).astype(np.uint64))
        mask &= (bits & np.uint64(1)).astype(bool)
    return mask


def build_bloom(ds, col: str, nbits: int = DEFAULT_NBITS) -> np.ndarray:
    """OR-merge per-block bitmaps of ``ds[col]`` (int keys) into one
    uint64-word bitmap via a native global ``Dataset.aggregate``: the
    accumulator is the bitmap itself, set per block and tree-merged by the
    engine — one streaming pass, no extra exchange, and only the final
    merged bitmap reaches the driver."""
    from ray.data.aggregate import AggregateFn

    nwords = nbits // 64

    def acc_block(words: np.ndarray, block) -> np.ndarray:
        if isinstance(block, pa.Table):
            keys = block[col].to_numpy(zero_copy_only=False)
        else:  # pandas block (shuffle round trips)
            keys = block[col].to_numpy()
        if len(keys):
            for pos in _bit_positions(keys.astype(np.int64), nbits):
                _set_bits(words, pos)
        return words

    fn = AggregateFn(
        init=lambda k: np.zeros(nwords, dtype=np.uint64),
        merge=lambda a, b: np.bitwise_or(a, b),
        accumulate_block=acc_block,
        name="bloom",
    )
    res = ds.aggregate(fn)
    words = None if res is None else res.get("bloom")
    if words is None:  # empty dataset: engine may skip init entirely
        return np.zeros(nwords, dtype=np.uint64)
    return np.asarray(words, dtype=np.uint64)
