"""Regenerate tests/goldens_sf0001.json — frozen value hashes for the
rows-only (no-SQL-oracle) queries that are nonetheless fully deterministic.

Run from /root/repo:  python tools/make_goldens.py

The hashes are tied to the driver-generated /root/testdata/sf0.001 fixture
(fixed seed); if the fixture ever changes, regenerate and review the diff —
a changed hash with an unchanged fixture is a real regression.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens_sf0001.json")

# deterministic rows-only queries worth a value gate.  Excluded on purpose:
# sketch_heavy_tokens (local-candidate sets depend on batch boundaries)
# stays pytest-gated.  ann_knn_ivf became goldenable once the Lloyd merge
# switched to fixed-point partials (integer adds are order-independent).
GOLDEN_QUERIES = [
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_minhash_pairs",
    "ann_lsh_buckets",
    "ann_ivf_assign",
    "media_features",
    "media_features_demo",
    "media_features_png",
    "media_features_jpeg",
    "media_deskew",
    "media_frame_sample",
    "media_overlay",
    "eval_raster_dice",
    "page_xml_export",
    "extract_error_docs",
    "extract_spans_flood_order",
    "extract_spans",
    "extract_spans_skew",
    "extract_spans_cluster_order",
    "extract_kind_counts",
    "eval_skew_vs_happy",
    "sketch_distinct_users",
    "embedding_neardup_pairs_lsh",
    "ann_knn_ivf",
    "ann_knn_lsh",
    "dedup_minhash_groups",
    "corpus_prepare",
    "sketch_value_quantiles",
]


def canon_hash(df) -> tuple[int, str]:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False).encode()
    return len(df), hashlib.md5(payload).hexdigest()


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod
    from tools.check_parity import to_pandas

    qs = entrymod.queries()
    out = {}
    for name in GOLDEN_QUERIES:
        rows, digest = canon_hash(to_pandas(qs[name](SF)))
        out[name] = {"rows": rows, "md5": digest}
        print(f"{name}: rows={rows} md5={digest}")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
