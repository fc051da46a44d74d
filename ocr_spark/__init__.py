"""ocr_spark — a PySpark-native document/main-content extraction engine.

A from-scratch re-expression of the docketanalyzer/ocr extraction dataflow
(reference at /root/reference, read-only) as DataFrame operators plus
vectorized Arrow UDF stages: parse → page explode → layout/native probe →
needs-OCR routing → OCR fallback → spatial consolidation → SQL postprocess →
document reassembly, with checkpointed lineage + metrics for resume.
"""

__version__ = "0.1.0"
