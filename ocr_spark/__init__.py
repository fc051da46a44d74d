"""ocr_spark — a PySpark-native document/main-content extraction engine.

A from-scratch re-expression of the docketanalyzer/ocr extraction dataflow
(reference at /root/reference, read-only) as DataFrame operators plus
vectorized Arrow UDF stages: parse → probe → needs-OCR routing → OCR
fallback → spatial consolidation → SQL postprocess → document reassembly,
with checkpointed lineage + metrics for resume, a streaming surface, and
training-data operators (dedup / similarity / text analysis / multimodal).
"""

__version__ = "0.2.0"

from .pipeline import (  # noqa: F401
    PipelineConfig,
    extract,
    extract_from_path,
    flatten_lines,
    read_pages,
)

__all__ = [
    "PipelineConfig",
    "extract",
    "extract_from_path",
    "flatten_lines",
    "read_pages",
]
