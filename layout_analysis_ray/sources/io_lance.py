"""Lance-or-Parquet IO shim (SURVEY.md §7.3).

The BASELINE.json input is a Lance table; `ray.data.read_lance` /
`Dataset.write_lance` exist in Ray 2.49 but need the `lance` package, which
is not installable in this sandbox (no network).  All table IO in the engine
goes through this module: with `lance` importable it uses the Lance path
unchanged; otherwise it falls back to a Parquet-fragment layout whose
checkpoint/lineage semantics are identical (one file per fragment + the
JSON manifests of ``state.checkpoint``), so nothing else in the codebase
cares which format is underneath.
"""

from __future__ import annotations


def lance_available() -> bool:
    try:  # pragma: no cover - lance not installable here
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(uri: str, *, columns=None, override_num_blocks=None):
    """Ray Dataset over a Lance dataset (if available) or Parquet path."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    if uri.endswith(".lance") and lance_available():  # pragma: no cover
        return rd.read_lance(uri, columns=columns, **kwargs)
    if columns is not None:
        kwargs["columns"] = list(columns)
    return rd.read_parquet(uri, **kwargs)


def write_table(ds, uri: str):
    """Write a Ray Dataset as Lance (if available) or partitioned Parquet."""
    if uri.endswith(".lance") and lance_available():  # pragma: no cover
        return ds.write_lance(uri)
    return ds.write_parquet(uri)
