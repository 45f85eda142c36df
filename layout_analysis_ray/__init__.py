"""Ray-Data-native layout/main-content extraction engine (see SURVEY.md).

Public API (lazy imports so `import layout_analysis_ray` stays cheap and
Ray-free until a pipeline is actually built):

    from layout_analysis_ray import extract_pipeline, resumable_write
"""

def _stub_fsspec_http() -> None:
    """Pre-register a finished ``fsspec.implementations.http`` stub when
    aiohttp is absent (as in this sandbox).  Ray Data's path resolution
    retries ``from fsspec.implementations.http import HTTPFileSystem`` on
    EVERY ``read_parquet`` (failed imports are never negatively cached);
    under concurrent driver threads — the all-oracles parity gate checks
    four queries at once — sibling threads can observe the module
    mid-initialization and die with ``ImportError: cannot import name
    'HTTPFileSystem'`` or deadlock on the per-module import locks.  A
    finished stub turns that import into a race-free ``sys.modules`` hit;
    its ``HTTPFileSystem`` is a fresh sentinel class no real filesystem is
    an instance of, so Ray's ``_is_http_filesystem`` correctly stays
    False (HTTP filesystems are impossible without aiohttp anyway)."""
    import sys
    import types

    if "fsspec.implementations.http" in sys.modules:
        return
    try:
        import aiohttp  # noqa: F401

        return  # real module importable; no stub needed
    except ImportError:
        pass
    try:
        import fsspec.implementations
    except ImportError:
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: nothing is ever an instance
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


_stub_fsspec_http()


__all__ = [
    "extract_pipeline",
    "extract_pipeline_skew",
    "resumable_write",
    "read_output",
    "evaluate_extraction",
    "docs_from_parquet",
]


def __getattr__(name):
    if name in ("extract_pipeline",):
        from .pipelines.extract import extract_pipeline

        return extract_pipeline
    if name == "extract_pipeline_skew":
        from .stages.skew import extract_pipeline_skew

        return extract_pipeline_skew
    if name in ("resumable_write", "read_output"):
        from .state import checkpoint

        return getattr(checkpoint, name)
    if name == "evaluate_extraction":
        from .functions.evaluate import evaluate_extraction

        return evaluate_extraction
    if name == "docs_from_parquet":
        from .sources.synth import docs_from_parquet

        return docs_from_parquet
    raise AttributeError(name)
