"""Connected components: distributed min-label propagation vs a local
union-find ground truth, on random graphs and the pathological chain."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from layout_analysis_ray.functions.graph import connected_components


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp: dict[int, list[int]] = {}
    for v in n_nodes:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def _run(edges, nodes, driver_max_edges=None):
    import ray.data as rd

    from layout_analysis_ray.functions.graph import CC_DRIVER_MAX_EDGES

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    nds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    out = connected_components(
        pairs,
        nodes=nds,
        driver_max_edges=(
            CC_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
        ),
    )
    return {r["node"]: r["comp"] for r in out.take_all()}


import pytest


@pytest.mark.parametrize("driver_max_edges", [None, 0])
def test_cc_random_graphs(ray_session, driver_max_edges):
    """Sparse + medium + dense random graphs over DISJOINT node ranges,
    merged into one call — one disconnected graph covers all three regimes
    while paying the propagation rounds once.  Runs BOTH the driver
    small-graph cutover (default) and the distributed round loop
    (driver_max_edges=0)."""
    rng = np.random.RandomState(11)
    nodes: list[int] = []
    edges: list[tuple[int, int]] = []
    for base, m in ((0, 5), (1000, 40), (2000, 90)):
        part = list((base + rng.choice(500, size=40, replace=False)).astype(int))
        nodes += part
        edges += [
            (int(part[rng.randint(40)]), int(part[rng.randint(40)]))
            for _ in range(m)
        ]
    got = _run(edges, nodes, driver_max_edges=driver_max_edges)
    assert got == _union_find(nodes, edges)


@pytest.mark.parametrize("driver_max_edges", [None, 0])
def test_cc_chain_and_isolated(ray_session, driver_max_edges):
    """A 40-node chain (worst diameter — exercises pointer doubling) plus
    isolated nodes that must come back as singleton components."""
    chain = list(range(100, 140))
    edges = list(zip(chain[:-1], chain[1:]))
    nodes = chain + [7, 9]
    got = _run(edges, nodes, driver_max_edges=driver_max_edges)
    assert got == {**{v: 100 for v in chain}, 7: 7, 9: 9}


def test_cc_no_edges(ray_session):
    got = _run([], [3, 1, 2])
    assert got == {1: 1, 2: 2, 3: 3}
