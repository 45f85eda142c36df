"""Pluggable block-ordering strategies (SURVEY.md §2.10).

The reference swaps interchangeable clustering strategies with one edited
line (`label_clustering` / DBSCAN `clustering` / watershed —
``/root/reference/src/DocumentAnalyzer.py:61-75,111-115``,
``src/detect.py:40-47``, swap site ``src/fit_separator.py:61-62``).  Here
the same surface is an explicit registry: every strategy maps
``rects -> index permutation`` and plugs into the assembly stage via
``extract_pipeline(..., order_strategy=...)``.

- ``xycut`` (default): the conformance ordering the oracle pins
  (``conformance.xycut_order``).
- ``cluster``: the DBSCAN-analogue — greedy proximity clustering of blocks
  (single-linkage on bbox gaps <= CLUSTER_EPS), clusters emitted in raster
  order of their top-left corner, blocks within a cluster raster-ordered.
  Same output SET of blocks, different reading order (tests pin both).
- ``flood``: the watershed analogue — seeded region growth: flood from the
  raster-first block, repeatedly absorbing the nearest (bbox-gap) unvisited
  block; when the nearest is farther than FLOOD_EPS the basin is exhausted
  and a new seed starts at the raster-first unvisited block.  Completes the
  reference's three-strategy swap surface.
"""

from __future__ import annotations

CLUSTER_EPS = 120.0  # max bbox gap (px) for two blocks to share a cluster
FLOOD_EPS = 200.0  # basin boundary: growth stops past this gap


def cluster_order(rects: list) -> list[int]:
    n = len(rects)
    if n == 0:
        return []

    def gap(a, b) -> float:
        dx = max(0.0, max(a[0], b[0]) - min(a[2], b[2]))
        dy = max(0.0, max(a[1], b[1]) - min(a[3], b[3]))
        return max(dx, dy)

    # single-linkage union-find over pairwise gaps
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if gap(rects[i], rects[j]) <= CLUSTER_EPS:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    clusters: dict[int, list[int]] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)

    def cluster_key(members):
        return (
            min(rects[i][1] for i in members),
            min(rects[i][0] for i in members),
        )

    out: list[int] = []
    for members in sorted(clusters.values(), key=cluster_key):
        out.extend(sorted(members, key=lambda i: (rects[i][1], rects[i][0], i)))
    return out


def flood_order(rects: list) -> list[int]:
    n = len(rects)
    if n == 0:
        return []

    def gap(a, b) -> float:
        dx = max(0.0, max(a[0], b[0]) - min(a[2], b[2]))
        dy = max(0.0, max(a[1], b[1]) - min(a[3], b[3]))
        return max(dx, dy)

    def raster_first(candidates):
        return min(candidates, key=lambda i: (rects[i][1], rects[i][0], i))

    unvisited = set(range(n))
    out: list[int] = []
    frontier: list[int] = []
    while unvisited:
        if not frontier:  # new basin seed
            seed = raster_first(unvisited)
            unvisited.discard(seed)
            out.append(seed)
            frontier = [seed]
        # nearest unvisited block to ANY flooded block of this basin
        best, best_d = None, None
        for u in unvisited:
            d = min(gap(rects[u], rects[f]) for f in frontier)
            if best_d is None or (d, u) < (best_d, best):
                best, best_d = u, d
        if best is None or best_d > FLOOD_EPS:
            frontier = []  # basin exhausted
            continue
        unvisited.discard(best)
        out.append(best)
        frontier.append(best)
    return out


def get_strategy(name: str):
    from .. import conformance as C

    registry = {
        "xycut": C.xycut_order,
        "cluster": cluster_order,
        "flood": flood_order,
    }
    try:
        return registry[name]
    except KeyError:
        raise ValueError(
            f"unknown order strategy {name!r}; available: {sorted(registry)}"
        ) from None
