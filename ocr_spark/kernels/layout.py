"""Layout-block kernels: class vocabulary, px→pt scaling, greedy overlap merge.

Reference: layout.py:18-29 (classes), layout.py:150-154 (int-cast-then-scale),
layout.py:32-89 (order-dependent greedy merge fixpoint).  The merge is NOT a
relational join — matched blocks are absorbed in list order and the winner
keeps scanning from its own position — so it runs as a small-N in-UDF loop
(blocks/page is typically 5-15).
"""

from __future__ import annotations

from .geometry import box_overlap_pct, merge_boxes

# Closed class vocabulary, id -> name (reference layout.py:18-29).
LAYOUT_CHOICES: dict[int, str] = {
    1: "text",
    0: "title",
    2: "abandon",
    3: "figure",
    4: "figure_caption",
    5: "table",
    6: "table_caption",
    7: "table_footnote",
    8: "isolate_formula",
    9: "formula_caption",
}

# Merge priority = insertion order of LAYOUT_CHOICES.values() (layout.py:50-52).
TYPE_PRIORITY: dict[str, int] = {t: i for i, t in enumerate(LAYOUT_CHOICES.values())}

# "ignore" is added only by postprocessing (document.py:641); never detected.
BLOCK_TYPES = [*LAYOUT_CHOICES.values(), "ignore"]


def px_to_pt(xyxy: list[float], dpi: int) -> list[float]:
    """Detector pixel box -> PDF points.

    The int cast happens BEFORE scaling (truncation is observable in output
    bboxes) — reference layout.py:150-154.  Note the reference passes the
    *document* dpi here even when the raster was re-rendered at 72 dpi by the
    4500-px safety cap (document.py:407-416), so capped pages get shrunken
    layout boxes; we preserve that quirk.
    """
    return [int(p) * (72 / dpi) for p in xyxy]


def merge_overlapping_blocks(blocks: list[dict]) -> list[dict]:
    """Greedy fixpoint merge of overlapping blocks; winner type = higher
    priority; bbox = running union; final sort by (y1, x1).

    Exact replication of reference layout.py:32-89, including:
    - FIFO pop of the current seed block,
    - rescan-from-0 after every absorption (``merged`` flag),
    - overlap test against the *running* merged bbox,
    - strictly-greater-than-0.5 threshold on min-area-denominator overlap.
    """
    if not blocks:
        return []

    unprocessed = [dict(block) for block in blocks]
    result: list[dict] = []

    while unprocessed:
        current = unprocessed.pop(0)
        current_bbox = current["bbox"]

        merged = True
        while merged:
            merged = False
            i = 0
            while i < len(unprocessed):
                other = unprocessed[i]
                ob = other["bbox"]
                # inline disjointness pre-test: exactly the kernel's own
                # empty-intersection condition (touching edges count as
                # empty → pct 0.0, which can never pass the > 0.5 gate),
                # so skipped pairs are bit-identically non-merges — same
                # trick as consolidate_blocks (r3), measured on the same
                # profile
                if (
                    ob[0] >= current_bbox[2]
                    or ob[2] <= current_bbox[0]
                    or ob[1] >= current_bbox[3]
                    or ob[3] <= current_bbox[1]
                ):
                    i += 1
                    continue
                if box_overlap_pct(current_bbox, ob) > 0.5:
                    if TYPE_PRIORITY[other["type"]] < TYPE_PRIORITY[current["type"]]:
                        current["type"] = other["type"]
                    current_bbox = merge_boxes(current_bbox, other["bbox"])
                    current["bbox"] = current_bbox
                    unprocessed.pop(i)
                    merged = True
                else:
                    i += 1

        result.append(current)

    result.sort(key=lambda x: (x["bbox"][1], x["bbox"][0]))
    return result
