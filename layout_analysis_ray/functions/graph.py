"""Distributed connected components over a pair (edge) Dataset.

The missing piece between pair emission (MinHash / SimHash / embedding
near-dup) and actual deduplication: pairs say "a duplicates b", components
say "keep one doc per duplicate CLUSTER".  The reference has no analogue
(its dedup is per-file rectangle merging, ``/root/reference/src/
Postprocessing.py``); this is the standard web-scale group-assignment step.

Algorithm: min-label propagation with pointer doubling.  Every node starts
labeled with itself; each round takes, per node, the min over (own label,
neighbor labels, label-of-label).  Labels are monotonically non-increasing
and converge to the component's min node id; pointer doubling
(label-of-label) makes the round count O(log diameter) instead of
O(diameter).  Convergence test: the global label SUM — monotone decrease
means an unchanged sum IS a fixpoint, and the driver only ever sees that
one scalar per round.

Scale shape: the edge set is the candidate-pair set (duplicates only),
orders of magnitude smaller than the corpus; each round is hash joins +
a groupby-Min over (node, label) pairs — all-to-all exchanges over pair
rows, nothing corpus-sized, nothing on the driver.  The label table is
materialized once per round (it is the iteration state, bounded by the
node count of the PAIR GRAPH, not the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CC_MAX_ROUNDS = 50
# pair graphs are small next to the corpus; partition count is a knob the
# caller raises for genuinely huge duplicate graphs
CC_NUM_PARTITIONS = 4
# below this edge count the whole graph is pulled to the driver and solved
# with vectorized numpy label propagation: each DISTRIBUTED round costs ~6
# fixed exchange latencies (2 joins + union + groupby + repartition +
# convergence aggregate), which dwarfs the compute when the duplicate graph
# is thousands of rows.  64 MiB of edges is a conservative driver bound;
# genuinely huge graphs take the round loop below.
CC_DRIVER_MAX_EDGES = 4_000_000


def _cc_driver(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Vectorized min-label propagation on the driver: O(E) numpy per round,
    pointer doubling, O(log diameter) rounds.  Labels are indices into the
    SORTED node array, so the min label IS the min node id."""
    uniq = np.unique(np.concatenate([u, v]))
    cu = np.searchsorted(uniq, u)
    cv = np.searchsorted(uniq, v)
    lab = np.arange(len(uniq), dtype=np.int64)
    prev = None
    while True:
        np.minimum.at(lab, cu, lab[cv])
        np.minimum.at(lab, cv, lab[cu])
        while True:  # pointer doubling to a per-round fixpoint
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        cur = int(lab.sum())
        if cur == prev:
            break
        prev = cur
    return pa.table(
        {"node": pa.array(uniq, pa.int64()), "comp": pa.array(uniq[lab], pa.int64())}
    )


def _pairs_to_edges(pairs, col_a: str, col_b: str):
    """Symmetrize (a, b) pair rows into directed (u, v) edge rows."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch[col_a]
        b = batch[col_b]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "u": pa.chunked_array([a, b]).combine_chunks(),
                "v": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    return pairs.map_batches(sym, batch_format="pyarrow")


def connected_components(
    pairs,
    nodes=None,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    node_col: str = "node",
    max_rounds: int = CC_MAX_ROUNDS,
    num_partitions: int = CC_NUM_PARTITIONS,
    driver_max_edges: int = CC_DRIVER_MAX_EDGES,
):
    """(node, comp) for every node, comp = min node id of its component.

    ``pairs``: Dataset of int64 (col_a, col_b) edge rows.  ``nodes``
    (optional): Dataset with ``node_col`` covering ALL nodes — isolated
    nodes (no edges) then appear as their own singleton component.
    Isolated nodes never enter the propagation rounds (their label cannot
    change): iteration state is bounded by the PAIR-GRAPH node count, and
    the corpus-sized node set joins in exactly once at the end
    (left_outer, null comp -> self).
    """
    from ray.data.aggregate import Min, Sum

    edges = _pairs_to_edges(pairs, col_a, col_b).materialize()

    def to_node_label(batch: pa.Table) -> pa.Table:
        n = batch["u"]
        return pa.table({"node": n, "label": n})

    def finish_min(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": batch["node"],
                "label": pc.cast(batch["min(label)"], pa.int64()),
            }
        )

    # edgeless graph: every node is its own component; the join path would
    # feed Ray's hash shuffle column-less empty blocks (known quirk)
    n_edges = edges.count()
    rounds = max_rounds if n_edges else 0
    if 0 < n_edges <= driver_max_edges:
        # small-graph cutover: solve on the driver (identical output — min
        # node id per component) instead of paying ~6 fixed exchange
        # latencies per distributed round on a graph that is thousands of
        # rows.  The duplicate graph is already orders of magnitude smaller
        # than the corpus; above the bound the round loop below takes over.
        import ray.data as rd

        e = edges.to_pandas()
        labels = rd.from_arrow(
            _cc_driver(
                e["u"].to_numpy().astype(np.int64),
                e["v"].to_numpy().astype(np.int64),
            )
        ).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["comp"]}),
            batch_format="pyarrow",
        )
    else:
        seeds = edges.map_batches(to_node_label, batch_format="pyarrow")
        labels = (
            seeds.groupby("node")
            .aggregate(Min("label"))
            .map_batches(finish_min, batch_format="pyarrow")
            .materialize()
        )
        prev_sum = None
        for _round in range(rounds):
            # neighbor messages: for edge (u, v), v learns label(u)
            neigh = edges.join(
                labels,
                "inner",
                num_partitions=num_partitions,
                on=("u",),
                right_on=("node",),
            ).map_batches(
                lambda b: pa.table({"node": b["v"], "label": b["label"]}),
                batch_format="pyarrow",
            )
            # pointer doubling: node learns label(label(node))
            hop = labels.join(
                labels.map_batches(
                    lambda b: pa.table({"node2": b["node"], "label2": b["label"]}),
                    batch_format="pyarrow",
                ),
                "inner",
                num_partitions=num_partitions,
                on=("label",),
                right_on=("node2",),
            ).map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["label2"]}),
                batch_format="pyarrow",
            )
            # repartition before materializing: the aggregate's shuffle can
            # emit COLUMN-LESS empty blocks (the schema.py quirk) which
            # map_batches skips and the next round's hash join rejects;
            # repartition rebuilds typed blocks from the dataset schema
            labels = (
                labels.union(neigh)
                .union(hop)
                .groupby("node")
                .aggregate(Min("label"))
                .map_batches(finish_min, batch_format="pyarrow")
                .repartition(num_partitions)
                .materialize()
            )
            # labels only ever decrease -> unchanged sum == fixpoint
            cur = labels.aggregate(Sum("label"))
            cur_sum = int(cur["sum(label)"])
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            if rounds:  # pragma: no cover — log-round doubling converges early
                raise RuntimeError(f"no convergence in {max_rounds} rounds")

    comp = labels.map_batches(
        lambda b: pa.table({"node": b["node"], "comp": b["label"]}),
        batch_format="pyarrow",
    )
    if nodes is None:
        return comp

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"onode": batch[node_col]})

    all_nodes = nodes.map_batches(node_rows, batch_format="pyarrow")
    if not rounds:  # edgeless: every node a singleton (skip the quirky join)
        return all_nodes.map_batches(
            lambda b: pa.table({"node": b["onode"], "comp": b["onode"]}),
            batch_format="pyarrow",
        )

    def fill_isolated(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": batch["onode"],
                "comp": pc.cast(
                    pc.coalesce(batch["comp"], batch["onode"]), pa.int64()
                ),
            }
        )

    # corpus-sized node set touches exactly ONE join, after convergence
    return all_nodes.join(
        comp,
        "left_outer",
        num_partitions=num_partitions,
        on=("onode",),
        right_on=("node",),
    ).map_batches(fill_isolated, batch_format="pyarrow")


NGRAM_CHAIN_PPM = 5_000


def ngram_chain_groups(sf_dir: str, threshold_ppm: int = NGRAM_CHAIN_PPM):
    """Duplicate-cluster assignment over the consecutive-doc jaccard graph:
    edges where ``ngram_jaccard_consecutive`` >= threshold, components via
    :func:`connected_components`, every doc labeled (doc_id, comp) with
    comp = min doc of its chain run.  Chain-shaped on purpose — components
    of a path graph are SQL-expressible (window-function run detection), so
    the generic operator gets a bit-exact DuckDB oracle; random-graph
    correctness is property-tested in tests/test_graph.py."""
    import pyarrow.compute as pc

    from .dedup import ngram_jaccard_consecutive, _read_docs

    pairs = ngram_jaccard_consecutive(sf_dir).filter(
        expr=f"jaccard_ppm >= {threshold_ppm}"
    )
    nodes = _read_docs(sf_dir, ["doc_id"])
    out = connected_components(pairs, nodes=nodes, node_col="doc_id")
    return out.map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"], "comp": pc.cast(b["comp"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def dedup_minhash_groups(sf_dir: str, pairs=None):
    """The full near-dedup story composed end to end: MinHash-LSH verified
    pairs (``dedup.dedup_minhash_pairs``) -> duplicate CLUSTERS via
    :func:`connected_components` -> (doc_id, comp, keep) where comp is the
    cluster's min doc id and keep marks the one document per cluster a
    dedup pass would retain.  Only pair-graph docs appear (docs with no
    near-duplicate are implicitly kept); deterministic, golden-pinned.

    ``pairs`` (optional): a precomputed verified-pair Dataset — fused
    scans (``corpus_prepare``) pass the pairs they derived from their own
    single corpus read so this never re-reads the corpus.
    """
    import pyarrow.compute as pc

    from .dedup import dedup_minhash_pairs

    if pairs is None:
        pairs = dedup_minhash_pairs(sf_dir)
    out = connected_components(pairs)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["node"],
                "comp": batch["comp"],
                "keep": pc.equal(batch["node"], batch["comp"]),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
