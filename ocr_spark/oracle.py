"""Pure-Python reference oracle: the full extraction pipeline with no Spark.

Mirrors ``PDFDocument.process()`` (reference document.py:553-623) stage by
stage using the same kernels the Spark UDFs use.  Tests assert the Spark
pipeline's output is byte-identical to this oracle per url (the analogue of
the reference's golden-fixture compare, tests/conftest.py:25-34).
"""

from __future__ import annotations

from typing import Any

from .extract import heuristic as hx
from .kernels.postprocess import block_text, doc_text, page_text, postprocess_blocks


def extract_document(
    html: bytes, lang: str = "en", postprocess: bool = True
) -> dict[str, Any]:
    """Run the whole per-document pipeline sequentially.

    Returns the nested ``extracted`` row shape (SURVEY.md §1.3):
    ``{"text", "pages": [{"i", "blocks": [{"i","bbox","type","lines":
    [{"i","bbox","content"}]}]}], "n_pages", "n_blocks", "ocr_pages"}``.
    """
    doc = hx.decode_doc(html)
    dpi = doc["dpi"]
    out_pages = []
    ocr_pages = 0
    n_blocks = 0
    for page in doc["pages"]:
        info = hx.analyze_page(page, dpi)
        if info["needs_ocr"]:
            lines = hx.extract_ocr_text(page, dpi, lang)
            ocr_pages += 1
        else:
            lines = info["native_lines"]
        blocks = hx.finish_page(lines, info["layout"])
        if postprocess:
            blocks = postprocess_blocks(blocks)
        n_blocks += len(blocks)
        out_pages.append(
            {
                "i": page["i"],
                "blocks": [
                    {
                        "i": bi,
                        "bbox": [float(c) for c in b["bbox"]],
                        "type": b["type"],
                        "lines": [
                            {
                                "i": li,
                                "bbox": [float(c) for c in ln["bbox"]],
                                "content": ln["content"],
                            }
                            for li, ln in enumerate(b["lines"])
                        ],
                    }
                    for bi, b in enumerate(blocks)
                ],
            }
        )
    return {
        "text": doc_text(
            [p["blocks"] for p in out_pages]
        ),
        "pages": out_pages,
        "n_pages": len(out_pages),
        "n_blocks": n_blocks,
        "ocr_pages": ocr_pages,
        # decode-guard lineage (giant-HTML truncation, htmlpage.py): HTML
        # docs have at most one virtual page, so the doc flag IS the count
        "truncated_pages": int(bool(doc.get("truncated"))),
    }


def flat_lines(extracted: dict[str, Any], url: str) -> list[tuple]:
    """Flatten one extracted doc to (url, page_i, block_i, type, line_i,
    content) rows — the golden-compare key space (tests/conftest.py:25-34)."""
    rows = []
    for p in extracted["pages"]:
        for b in p["blocks"]:
            for ln in b["lines"]:
                rows.append((url, p["i"], b["i"], b["type"], ln["i"], ln["content"]))
    return rows


__all__ = [
    "extract_document",
    "flat_lines",
    "block_text",
    "page_text",
    "doc_text",
]
