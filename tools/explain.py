"""Per-stage execution stats for any queries() entry — the "measure,
don't guess" loop: run one query and print Ray Data's operator-level
wall time / block counts so a slow stage is attributed, not assumed.

Usage: python tools/explain.py <query> [sf_dir]
       (sf_dir defaults to /root/testdata/sf0.01)

Only Dataset-returning queries have stage stats; driver-bounded
pa.Table results print timing only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)[:10]}...")
        return 2
    t0 = time.perf_counter()
    res = qs[name](sf_dir)
    if isinstance(res, rd.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n += b.num_rows
        wall = time.perf_counter() - t0
        print(res.stats())
        print(f"\n== {name}: {n} rows in {wall:.2f}s ==")
    else:
        wall = time.perf_counter() - t0
        nrows = getattr(res, "num_rows", None) or len(res)
        print(
            f"== {name}: {nrows} rows in {wall:.2f}s "
            "(driver-bounded result; per-stage stats are consumed "
            "internally by the query) =="
        )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
