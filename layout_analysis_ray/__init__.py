"""Ray-Data-native layout/main-content extraction engine (see SURVEY.md).

Public API (lazy imports so `import layout_analysis_ray` stays cheap and
Ray-free until a pipeline is actually built):

    from layout_analysis_ray import extract_pipeline, resumable_write
"""

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
