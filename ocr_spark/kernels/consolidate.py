"""Routing + consolidation kernels.

- ``page_needs_ocr``: the embedded-text-layer coverage probe that routes a
  page to the native path or the OCR fallback (reference document.py:21-55).
- ``consolidate_blocks``: the order-dependent spatial join that absorbs text
  lines into layout blocks (reference document.py:58-88).
- ``sort_blocks``: stable y-sort that assigns final block indexes
  (reference document.py:438-454).

The sequential line-pool mutation in consolidation and the ``+=`` coverage
accumulation are order-dependent, so both run as exact loops; the O(B×L)
pair geometry is numpy-vectorized per block with elementwise ops whose
float64 results are bit-identical to the scalar kernel.
"""

from __future__ import annotations

import numpy as np

from .geometry import box_overlap_pct, merge_boxes, overlap_pct_matrix

MIN_COVERAGE = 0.5  # reference document.py:24 ``min_overlap=0.5``
LINE_ABSORB_THRESHOLD = 0.5  # reference document.py:72 ``> 0.5``


def page_needs_ocr(
    layout: list[dict], lines: list[dict], min_overlap: float = MIN_COVERAGE
) -> bool:
    """Coverage probe: area-weighted fraction of layout covered by native
    text lines; below ``min_overlap`` ⇒ page needs OCR.

    Mirrors reference document.py:40-55: per block, per-line overlap pct with
    the BLOCK area as denominator, summed sequentially then clamped to 1.0.
    A page with no layout blocks is routed to OCR (the reference would divide
    by zero; no-layout pages do not occur in its corpus).
    """
    if not layout:
        return True
    total_area = 0.0
    covered_area = 0.0
    block_boxes = np.array([b["bbox"] for b in layout], dtype=np.float64)
    line_boxes = (
        np.array([ln["bbox"] for ln in lines], dtype=np.float64)
        if lines
        else np.zeros((0, 4), dtype=np.float64)
    )
    # ONE numpy dispatch for the whole page (B×L matrix, block area as
    # denominator) — each lane bit-identical to the scalar kernel
    pct_rows = overlap_pct_matrix(block_boxes, line_boxes).tolist()
    for block, pcts in zip(layout, pct_rows):
        x1_min, y1_min, x1_max, y1_max = block["bbox"]
        block_area = (x1_max - x1_min) * (y1_max - y1_min)
        block_coverage = 0.0
        # the += fold stays strictly sequential over Python floats (same
        # rounding as document.py:46-51 — numpy's pairwise sum would
        # round differently, so no np.sum here)
        for p in pcts:
            block_coverage += p
        block_coverage = min(block_coverage, 1.0)
        total_area += block_area
        covered_area += block_area * block_coverage
    if total_area == 0:
        return True
    return covered_area / total_area < min_overlap


def consolidate_blocks(lines: list[dict], layout: list[dict]) -> list[dict]:
    """Absorb text lines into layout blocks; leftovers become singleton
    ``text`` blocks.  Exact replication of reference document.py:58-88:

    - blocks scan the SHARED line pool in layout order; absorbed lines are
      removed, so an earlier block shadows later ones (order-dependent);
    - the overlap test uses the block's ORIGINAL bbox for the whole scan
      (``block["bbox"]`` is rebound only after the loop body computes
      new_bbox, but the test at :72 reads the rebound value — see below);
    - the block bbox grows by union with each absorbed line (:75) and the
      rebinding at :76 happens INSIDE the line loop, so later lines in the
      same scan test against the grown bbox;
    - blocks that absorbed nothing are dropped (:78-79).
    """
    pool = list(lines)
    blocks: list[dict] = []
    for block in layout:
        absorbed: list[dict] = []
        drop: list[int] = []
        new_bbox = block["bbox"]
        bbox = block["bbox"]
        for li, line in enumerate(pool):
            # :72 tests block["bbox"], rebound each iteration at :76
            lb = line["bbox"]
            # inline disjointness pre-test: exactly the kernel's own
            # empty-intersection condition (touching edges count as
            # empty), so skipped pairs are precisely the pct == 0.0
            # pairs — bit-identical results, ~2x fewer kernel calls on
            # realistic pages (most line/block pairs don't overlap)
            if (
                lb[0] >= bbox[2]
                or lb[2] <= bbox[0]
                or lb[1] >= bbox[3]
                or lb[3] <= bbox[1]
            ):
                continue
            if box_overlap_pct(bbox, lb) > LINE_ABSORB_THRESHOLD:
                absorbed.append(line)
                drop.append(li)
                new_bbox = merge_boxes(new_bbox, lb)
            bbox = new_bbox
        dropped = set(drop)
        pool = [line for li, line in enumerate(pool) if li not in dropped]
        if absorbed:
            blocks.append({"bbox": new_bbox, "type": block["type"], "lines": absorbed})
    for line in pool:
        blocks.append({"bbox": line["bbox"], "type": "text", "lines": [line]})
    return blocks


def sort_blocks(blocks: list[dict]) -> list[dict]:
    """Stable sort by y1 — assigns final block order/indexes.

    Reference document.py:444 (``sorted(blocks, key=lambda x: x["bbox"][1])``,
    Python sort is stable so ties keep consolidation order).
    """
    return sorted(blocks, key=lambda x: x["bbox"][1])
