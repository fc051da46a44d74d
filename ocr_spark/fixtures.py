"""Seed-deterministic synthetic pages-table generator (FIXTURES.md §1).

Every value is derivable from the url alone (md5-seeded RNG) — no wall
clock, no uuid, no global seed state — so any slice of the corpus can be
regenerated independently and the golden oracle output is stable across
runs, processes, and partitionings.

Payload kinds (FIXTURES.md §1.1), keyed by k % 10:
- A (0-5): healthy native text layer → coverage ≥ 0.5 → native path; includes
  boilerplate blocks (court heading / page numbers / short-abandon) for the
  postprocess predicates (reference document.py:625-642), whitespace-only
  lines (ocr.py:94) and multi-span lines (ocr.py:93).
- B (6-8): stripped/shrunk text layer → coverage < 0.5 → OCR fallback.
- C (9): adversarial geometry — mutually-overlapping mixed-type layout blocks
  (greedy merge fixpoint, layout.py:32-89), lines straddling blocks
  (consolidation order-dependence, document.py:58-88), and one oversized page
  that trips the 4500-px raster cap (document.py:412-413).
- Giant-doc skew: k % 997 == 0 → 60-200 pages (others 1-5).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
from pathlib import Path

from .payload import encode_doc

EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

VOCAB = (
    "the court order motion filed party plaintiff defendant exhibit record "
    "judge counsel notice hearing document page section state claim relief "
    "pursuant evidence witness trial appeal brief ruling statute federal "
    "district action judgment opinion argument finding discovery deposition"
).split()

LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

PAGE_W, PAGE_H = 612.0, 792.0
GIANT_PAGE_W = 1700.0  # 1700pt @200dpi = 4722px > 4500 → 72-dpi fallback


def url_for(k: int) -> str:
    return f"https://example.org/doc/{k:08d}"


def _rng(url: str, salt: str = "") -> random.Random:
    h = hashlib.md5((url + "|" + salt).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def _text_block(
    rng: random.Random, y: float, n_lines: int, btype: str = "text",
    x1: float = 72.0, width: float = 468.0,
) -> tuple[dict, list[dict], float]:
    """A layout block at y with n_lines native lines laid inside it.

    Block height = 14*n + 6 so per-line coverage ≈ 0.85 (robustly ≥ 0.5)."""
    h = 14.0 * n_lines + 6.0
    bbox = [x1, y, x1 + width, y + h]
    lines = []
    for j in range(n_lines):
        ly = y + 3.0 + 14.0 * j
        lines.append(
            {
                "bbox": [x1 + 2.0, ly, x1 + width - 2.0, ly + 12.0],
                "spans": [_words(rng, rng.randint(4, 10))],
            }
        )
    return {"type": btype, "bbox": bbox}, lines, y + h + 10.0


def make_page(url: str, page_i: int, kind: str, giant_page: bool = False) -> dict:
    rng = _rng(url, f"page{page_i}")
    width = GIANT_PAGE_W if giant_page else PAGE_W
    height = PAGE_H
    layout: list[dict] = []
    native: list[dict] = []
    ocr: list[dict] = []
    y = 72.0

    if kind == "A":
        # Court heading (P3) on page 0 of ~half the docs.
        if page_i == 0 and rng.random() < 0.5:
            blk, lines, y = _text_block(rng, y, 1, "title")
            n = rng.randint(1, 20)
            lines[0]["spans"] = [
                f"Case 1:2{rng.randint(0,9)}-cv-{rng.randint(1000,9999)}-ABC "
                f"Document {rng.randint(1,99)} Page {page_i + 1} of {n + 1}"
            ]
            layout.append(blk)
            native.extend(lines)
        # Body blocks.
        for _ in range(rng.randint(2, 4)):
            btype = "title" if rng.random() < 0.2 else "text"
            blk, lines, y = _text_block(rng, y, rng.randint(2, 6), btype)
            layout.append(blk)
            native.extend(lines)
        # Multi-span line (P2/F9) + whitespace-only line (P1) inside one block.
        blk, lines, y = _text_block(rng, y, 3)
        lines[0]["spans"] = [_words(rng, 3) + " ", _words(rng, 2)]
        lines[1]["spans"] = ["   ", "\t"]  # dropped by the strip filter
        layout.append(blk)
        native.extend(lines)
        # Short-abandon boilerplate (P5).
        if rng.random() < 0.6:
            blk, lines, y = _text_block(rng, y, 1, "abandon")
            lines[0]["spans"] = [rng.choice(["ab", "x1", "§3", "::"])]
            layout.append(blk)
            native.extend(lines)
        # Page-number block (P4): digit-only text.
        blk, lines, y = _text_block(rng, PAGE_H - 40.0, 1, "abandon")
        lines[0]["spans"] = [str(page_i + 1)]
        layout.append(blk)
        native.extend(lines)

    elif kind == "B":
        # Scanned: layout present, text layer stripped or shrunk.
        for _ in range(rng.randint(2, 4)):
            blk, lines, y = _text_block(rng, y, rng.randint(2, 5))
            layout.append(blk)
            for ln in lines:
                ocr.append({"bbox": ln["bbox"], "content": "ocr " + ln["spans"][0]})
        if rng.random() < 0.5 and layout:
            # One surviving tiny native line → nonzero but sub-threshold coverage.
            b = layout[0]["bbox"]
            native.append(
                {
                    "bbox": [b[0] + 2.0, b[1] + 2.0, b[0] + 60.0, b[1] + 10.0],
                    "spans": [_words(rng, 2)],
                }
            )

    else:  # kind C — adversarial geometry
        # Overlap chain for the greedy merge fixpoint: A∩B > .5, and the
        # merged bbox then swallows C (which overlapped neither alone > .5).
        layout.append({"type": "title", "bbox": [72.0, y, 300.0, y + 60.0]})
        layout.append({"type": "text", "bbox": [80.0, y + 10.0, 310.0, y + 70.0]})
        layout.append({"type": "figure", "bbox": [290.0, y + 20.0, 420.0, y + 65.0]})
        for j in range(4):
            ly = y + 6.0 + 13.0 * j
            native.append(
                {
                    "bbox": [74.0, ly, 416.0, ly + 11.0],
                    "spans": [_words(rng, 6)],
                }
            )
        y += 90.0
        # Straddling line: overlaps both following blocks; absorbed by the
        # FIRST in layout order (order-dependent pool removal).
        layout.append({"type": "text", "bbox": [72.0, y, 300.0, y + 40.0]})
        layout.append({"type": "text", "bbox": [72.0, y + 35.0, 300.0, y + 80.0]})
        native.append(
            {"bbox": [74.0, y + 30.0, 298.0, y + 44.0], "spans": [_words(rng, 5)]}
        )
        for j in range(2):
            ly = y + 4.0 + 13.0 * j
            native.append(
                {"bbox": [74.0, ly, 298.0, ly + 11.0], "spans": [_words(rng, 4)]}
            )
        native.append(
            {"bbox": [74.0, y + 48.0, 298.0, y + 60.0], "spans": [_words(rng, 4)]}
        )
        y += 100.0
        # A block whose lines force bbox growth (line sticks out left/right).
        layout.append({"type": "text", "bbox": [200.0, y, 400.0, y + 30.0]})
        native.append(
            {"bbox": [150.0, y + 4.0, 450.0, y + 16.0], "spans": [_words(rng, 8)]}
        )
        ocr.extend(
            {
                "bbox": [72.0, 600.0 + 15.0 * j, 540.0, 612.0 + 15.0 * j],
                "content": "ocr " + _words(rng, 5),
            }
            for j in range(3)
        )

    return {
        "i": page_i,
        "width": width,
        "height": height,
        "layout": layout,
        "native_lines": native,
        "ocr_lines": ocr,
    }


def n_pages_for(k: int) -> int:
    if k % 997 == 0:
        return 60 + (k % 141)  # giant-doc skew knob
    return 1 + (k % 5)


def kind_for(k: int) -> str:
    m = k % 10
    if m <= 5:
        return "A"
    if m <= 8:
        return "B"
    return "C"


def make_doc(k: int) -> dict:
    """One pages-table row: url, warc_ts, html, text, lang."""
    url = url_for(k)
    kind = kind_for(k)
    npg = n_pages_for(k)
    pages = []
    for i in range(npg):
        giant = kind == "C" and i == 0
        pages.append(make_page(url, i, kind, giant_page=giant))
    html = encode_doc(pages, dpi=200, kind=kind)
    warc_ts = EPOCH + dt.timedelta(days=k % 365, seconds=k % 86400)
    lang = LANGS[k % 10]
    return {"url": url, "warc_ts": warc_ts, "html": html, "lang": lang}


def crawl_text_for(k: int, html: bytes, lang: str) -> str:
    """The crawl-provided ``text`` column: exact for 30 %, dirty for 40 %,
    empty for 30 % (FIXTURES.md §1) — exercises needs-extraction decisions."""
    from .oracle import extract_document

    m = k % 10
    if m < 3:
        return extract_document(html, lang)["text"]
    if m < 7:
        t = extract_document(html, lang)["text"]
        rng = _rng(url_for(k), "dirty")
        cut = rng.randint(0, max(len(t) - 1, 0))
        return t[:cut] + " […trunc]"
    return ""


def generate_pages_rows(
    n_docs: int, with_crawl_text: bool = True
) -> list[dict]:
    rows = []
    for k in range(n_docs):
        row = make_doc(k)
        row["text"] = (
            crawl_text_for(k, row["html"], row["lang"]) if with_crawl_text else ""
        )
        rows.append(row)
    return rows


HTML_PAGE_W = 612.0


def html_url_for(k: int) -> str:
    return f"https://example.org/page/{k:08d}.html"


def _esc(s: str) -> str:
    """HTML-escape the three structural chars (matched by parser unescape)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_html_doc(k: int) -> dict:
    """One HTML pages-table row (url, warc_ts, html, lang) — deterministic
    Common-Crawl-style page bytes exercising the boilerplate-strip /
    DOM-heuristics path (htmlpage.py).  Variants by k % 5:

    - 0: full semantic page (head scripts, header/nav chrome, main + h1,
      footer) — the canonical strip case;
    - 1: div soup — no semantic containers; class/id-marked chrome divs
      (the attr-heuristic strip), a link-farm div that must be dropped by
      link density, a <br>-split address block;
    - 2: entities, nested inline markup, a table;
    - 3: malformed markup (unclosed <p>, stray close tag, uppercase tags);
    - 4: boilerplate-heavy; every 17th is PURE boilerplate → zero-page doc.
    """
    url = html_url_for(k)
    rng = _rng(url)
    v = k % 5
    paras = [
        _esc(_words(rng, rng.randint(8, 40))) for _ in range(rng.randint(1, 4))
    ]
    head = (
        "<head><title>t</title><script>var x = '<p>not text</p>';</script>"
        "<style>.c{color:red}</style></head>"
    )
    chrome = (
        '<header><h1>Site Banner</h1></header>'
        '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a>'
        "</li></ul></nav>"
    )
    footer = "<footer><p>© 2026 example.org</p></footer>"
    linkfarm = (
        "<div>"
        + " ".join(f'<a href="/{i}">{_words(rng, 2)}</a>' for i in range(6))
        + "</div>"
    )
    if v == 0:
        body = (
            chrome
            + f"<main><h1>{_esc(_words(rng, 4).title())}</h1>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + "</main>"
            + footer
        )
    elif v == 1:
        body = (
            '<div class="top-banner"><p>SALE! fifty percent off</p></div>'
            + linkfarm
            + "".join(f"<div class=c>{p}</div>" for p in paras)
            + f"<div>{_esc(_words(rng, 3))}<br>{_esc(_words(rng, 3))}</div>"
            + '<div id="page-footer"><p>terms privacy contact</p></div>'
        )
    elif v == 2:
        cells = "".join(
            f"<tr><td>{_esc(_words(rng, 2))}</td><td>{k + i}</td></tr>"
            for i in range(2)
        )
        body = (
            f"<h2>Q&amp;A &lt;{k}&gt;</h2>"
            + f"<p>{paras[0]} <b>bold <i>ital</i></b> &amp; tail</p>"
            + f"<table>{cells}</table>"
        )
    elif v == 3:
        body = (
            f"<P>{paras[0]}"  # unclosed, uppercase
            + "</div>"  # stray close
            + f"<p>{_esc(_words(rng, 5))}<br/>{_esc(_words(rng, 5))}"
            + "<blockquote>quoted text</blockquote>"
        )
    else:
        body = chrome + linkfarm + footer
        if k % 17 != 4:  # every 17th stays pure boilerplate
            body += f"<article><p>{paras[0]}</p></article>"
    html = f"<!DOCTYPE html>\n<html>{head}<body>{body}</body></html>".encode()
    warc_ts = EPOCH + dt.timedelta(days=k % 365, seconds=(k * 7) % 86400)
    return {"url": url, "warc_ts": warc_ts, "html": html, "lang": LANGS[k % 10]}


def generate_html_rows(n_docs: int, with_crawl_text: bool = True) -> list[dict]:
    """Deterministic HTML slice of the pages table (same schema as
    generate_pages_rows; url namespace disjoint so corpora mix freely)."""
    from .oracle import extract_document

    rows = []
    for k in range(n_docs):
        row = make_html_doc(k)
        row["text"] = (
            extract_document(row["html"], row["lang"])["text"]
            if with_crawl_text and k % 3 == 0
            else ""
        )
        rows.append(row)
    return rows


def write_rows_parquet(path: str | Path, rows: list[dict]) -> Path:
    """Write pages-table rows (input_hint schema) as parquet (pyarrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, path)
    return path


def write_pages_parquet(
    path: str | Path, n_docs: int, with_crawl_text: bool = True
) -> Path:
    """Write the synthetic-PDF pages table as parquet (no Spark needed)."""
    return write_rows_parquet(path, generate_pages_rows(n_docs, with_crawl_text))
