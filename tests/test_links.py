"""Outlink / page-metadata extraction and the host web graph.

Pure-Python scan semantics first (the same function runs inside the
Spark UDF and any oracle), then the Spark operators, then the graph
math.  The scan walks the SAME tokenizer as the block parser, so the
rawtext/comment/guard behavior pinned in test_html.py carries over —
here we pin the link-specific rules: base-href resolution, implied
anchor close, scheme skips, chrome scoping, the per-document link cap,
and PageRank's bit-reproducibility across partitionings.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_spark.htmlpage import (
    MAX_HTML_LINKS,
    scan_links,
    scan_meta,
)
from ocr_spark.operators import links as L

URL = "http://h1.example.com/a/b/page.html"


class TestScanLinks:
    def test_resolution_and_flags(self):
        html = (
            b'<html><body><nav><a href="/menu">Menu</a></nav>'
            b'<p><a href="https://ext.org/p?q=1#frag" rel="NoFollow x">'
            b"the <b>ext</b> page</a> now.</p>"
            b'<a href="rel.html">Relative</a>'
            b'<a href="//proto.example.org/x">Proto-rel</a>'
            b'<a href="/about">About</a></body></html>'
        )
        links, capped = scan_links(html, URL)
        assert not capped
        assert [r["dst"] for r in links] == [
            "http://h1.example.com/menu",
            "https://ext.org/p?q=1",  # fragment dropped
            "http://h1.example.com/a/b/rel.html",
            "http://proto.example.org/x",  # scheme-relative
            "http://h1.example.com/about",
        ]
        assert [r["link_i"] for r in links] == list(range(5))
        assert [r["anchor"] for r in links] == [
            "Menu", "the ext page", "Relative", "Proto-rel", "About"]
        assert [r["nofollow"] for r in links] == [
            False, True, False, False, False]
        assert [r["chrome"] for r in links] == [
            True, False, False, False, False]
        assert [r["internal"] for r in links] == [
            True, False, True, False, True]

    def test_base_href_first_wins_and_resolves_against_page(self):
        html = (
            b'<base href="/sub/"><base href="http://other.net/">'
            b'<a href="x.html">X</a>'
        )
        links, _ = scan_links(html, URL)
        # first <base> wins; itself resolved against the page url
        assert links[0]["dst"] == "http://h1.example.com/sub/x.html"
        assert links[0]["internal"]

    def test_skipped_schemes_and_fragment_only(self):
        html = (
            b'<a href="javascript:void(0)">j</a><a href="#top">t</a>'
            b'<a href="mailto:a@b.c">m</a><a href="tel:+1">p</a>'
            b'<a href="data:text/plain,x">d</a><a href="">e</a>'
            b'<a>noattr</a><a href="ftp://f.example/x">f</a>'
        )
        links, _ = scan_links(html, URL)
        assert links == []

    def test_implied_close_and_eof_anchor(self):
        # a new <a> closes the previous one; an anchor open at EOF emits
        html = b'<a href="/one">first <a href="/two">second'
        links, _ = scan_links(html, URL)
        assert [(r["dst"], r["anchor"]) for r in links] == [
            ("http://h1.example.com/one", "first"),
            ("http://h1.example.com/two", "second"),
        ]

    def test_rawtext_and_comments_do_not_leak_links(self):
        html = (
            b'<script>document.write(\'<a href="http://t.example/">x</a>\')'
            b"</script><!-- <a href='http://c.example/'>c</a> -->"
            b'<style>a{content:"<a href=http://s.example/>"}</style>'
            b'<a href="/real">Real</a>'
        )
        links, _ = scan_links(html, URL)
        assert [r["dst"] for r in links] == ["http://h1.example.com/real"]

    def test_anchor_text_strips_tags_and_collapses_ws(self):
        html = b'<a href="/x">  A&amp;B\n <span>c</span>\td </a>'
        links, _ = scan_links(html, URL)
        assert links[0]["anchor"] == "A&B c d"

    def test_link_cap_flag(self):
        html = b"".join(
            b'<a href="/p%d">x</a>' % i for i in range(10)
        )
        links, capped = scan_links(html, URL, max_links=4)
        assert len(links) == 4 and capped
        links, capped = scan_links(html, URL, max_links=None)
        assert len(links) == 10 and not capped
        assert MAX_HTML_LINKS == 2048

    def test_byte_guard_drops_tail_links(self):
        head = b'<a href="/kept">K</a>' + b"x" * 200
        tail = b'<a href="/dropped">D</a>'
        links, _ = scan_links(head + tail, URL, max_bytes=len(head) + 4)
        assert [r["dst"] for r in links] == ["http://h1.example.com/kept"]

    def test_internal_is_host_case_insensitive(self):
        links, _ = scan_links(
            b'<a href="http://H1.EXAMPLE.com/z">Z</a>', URL)
        assert links[0]["internal"]

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def test_total_and_deterministic(self, data):
        a = scan_links(data, URL)
        assert a == scan_links(data, URL)
        for rec in a[0]:
            assert rec["dst"].lower().startswith(("http://", "https://"))


class TestScanMeta:
    def test_fields(self):
        html = (
            b'<html LANG="EN-us"><head><title> My &amp;\n Page </title>'
            b'<meta name="description" content="A  test desc">'
            b'<meta name="robots" content="NOINDEX, nofollow">'
            b'<link rel="canonical" href="https://example.com/canon">'
            b"</head><body><title>second</title></body></html>"
        )
        m = scan_meta(html)
        assert m == {
            "title": "My & Page",
            "description": "A test desc",
            "canonical": "https://example.com/canon",
            "lang": "en-us",
            "noindex": True,
            "nofollow_page": True,
        }

    def test_missing_fields_are_none(self):
        m = scan_meta(b"<p>no head</p>")
        assert m["title"] is None and m["description"] is None
        assert m["canonical"] is None and m["lang"] is None
        assert m["noindex"] is False and m["nofollow_page"] is False

    def test_robots_none_token_and_follow(self):
        assert scan_meta(b'<meta name=robots content="none">')["noindex"]
        m = scan_meta(b'<meta name=robots content="index, follow">')
        assert not m["noindex"] and not m["nofollow_page"]

    def test_title_in_rawtext_not_taken(self):
        m = scan_meta(
            b"<script><title>fake</title></script><title>real</title>")
        assert m["title"] == "real"

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def test_total_and_deterministic(self, data):
        assert scan_meta(data) == scan_meta(data)


@pytest.fixture(scope="module")
def link_pages(spark):
    rows = []
    for i in range(12):
        url = f"http://h{i % 3}.example.com/d/{i}/index.html"
        html = (
            f'<html lang="en"><head><title>T{i}</title></head><body>'
            f'<nav><a href="/menu">Menu</a></nav>'
            f'<a href="https://ext{i % 2}.org/p/{i}">ref {i}</a>'
            f'<a href="/about">About</a>'
            f'<a rel="nofollow" href="http://spam.net/x">Ad</a>'
            f"</body></html>"
        ).encode()
        rows.append((url, bytearray(html)))
    return spark.createDataFrame(rows, "url string, html binary")


class TestSparkOperators:
    def test_extract_outlinks_rows(self, spark, link_pages):
        ol = L.extract_outlinks(link_pages)
        rows = ol.filter(
            F.col("url") == "http://h1.example.com/d/1/index.html"
        ).orderBy("link_i").collect()
        assert [r.dst for r in rows] == [
            "http://h1.example.com/menu",
            "https://ext1.org/p/1",
            "http://h1.example.com/about",
            "http://spam.net/x",
        ]
        assert [r.chrome for r in rows] == [True, False, False, False]
        assert [r.nofollow for r in rows] == [False, False, False, True]
        assert not any(r.links_capped for r in rows)

    def test_links_capped_column(self, spark, link_pages):
        capped = L.extract_outlinks(link_pages, max_links=2)
        rows = capped.filter(
            F.col("url") == "http://h0.example.com/d/0/index.html"
        ).collect()
        assert len(rows) == 2 and all(r.links_capped for r in rows)

    def test_page_metadata(self, spark, link_pages):
        pm = L.page_metadata(link_pages)
        r = pm.filter(
            F.col("url") == "http://h2.example.com/d/2/index.html"
        ).collect()[0]
        assert r.title == "T2" and r.lang_attr == "en"
        assert r.description is None and not r.noindex

    def test_non_html_payload_yields_no_links(self, spark):
        pages = spark.createDataFrame(
            [("http://x.example/a", bytearray(b"%PDF-1.4 binary junk"))],
            "url string, html binary",
        )
        assert L.extract_outlinks(pages).count() == 0
        m = L.page_metadata(pages).collect()[0]
        assert m.title is None

    def test_host_edges_and_degrees(self, spark, link_pages):
        edges = L.host_edges(L.extract_outlinks(link_pages))
        e = {(r.src_host, r.dst_host): r.w for r in edges.collect()}
        # nofollow (spam.net) excluded; menu+about self-loop weight 2/doc
        assert ("h0.example.com", "spam.net") not in e
        assert e[("h0.example.com", "h0.example.com")] == 8  # 4 docs × 2
        # h1 docs are i ∈ {1,4,7,10}; ext host alternates with i%2
        assert e[("h1.example.com", "ext1.org")] == 2
        deg = {r.host: r for r in L.host_degrees(edges).collect()}
        assert deg["ext0.org"].out_w == 0 and deg["ext0.org"].in_w == 6
        assert deg["h0.example.com"].out_hosts == 3  # self + ext0 + ext1

    def test_chrome_exclusion(self, spark, link_pages):
        edges = L.host_edges(
            L.extract_outlinks(link_pages), include_chrome=False)
        e = {(r.src_host, r.dst_host): r.w for r in edges.collect()}
        assert e[("h0.example.com", "h0.example.com")] == 4  # about only


class TestPageRank:
    def test_bit_identical_across_partitionings_and_folds(
        self, spark, link_pages
    ):
        edges = L.host_edges(L.extract_outlinks(link_pages))
        a = L.pagerank(edges, iters=3).orderBy("host").collect()
        b = L.pagerank(edges.repartition(7), iters=3).orderBy(
            "host").collect()
        assert [(r.host, r.rank) for r in a] == [
            (r.host, r.rank) for r in b]
        s = L.pagerank(edges, iters=3, fold="sum").orderBy(
            "host").collect()
        for x, y in zip(a, s):
            assert x.rank == pytest.approx(y.rank, abs=1e-12)

    def test_mass_and_base_rank(self, spark, link_pages):
        edges = L.host_edges(L.extract_outlinks(link_pages))
        ranks = {r.host: r.rank for r in L.pagerank(
            edges, iters=2).collect()}
        n = len(ranks)
        # simplified formulation: dangling hosts (pure sinks) keep > base
        base = 0.15 / n
        assert all(r >= base - 1e-15 for r in ranks.values())
        # sinks receive mass, sources end at base exactly after enough
        # rounds; with self-loops the h-hosts keep feeding themselves
        assert ranks["ext0.org"] > base

    def test_iteration_budget_guard(self, spark, link_pages):
        edges = L.host_edges(L.extract_outlinks(link_pages))
        with pytest.raises(ValueError):
            L.pagerank(edges, iters=0)
        with pytest.raises(ValueError):
            L.pagerank(edges, iters=101)
        with pytest.raises(ValueError):
            L.pagerank(edges, fold="bogus")

    def test_no_cartesian_in_plans(self, spark, link_pages):
        edges = L.host_edges(L.extract_outlinks(link_pages))
        for fold in ("sorted", "sum"):
            plan = L.pagerank(
                edges, iters=2, fold=fold
            )._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan


class TestMetaAndCapEdgeCases:
    """r5 fourth-pass review fixes over the scan_meta/scan_links walks."""

    def test_svg_title_never_becomes_page_title(self):
        from ocr_spark.htmlpage import scan_meta

        html = (
            b"<html><body><svg><title>menu icon</title></svg>"
            b"<p>content</p></body></html>"
        )
        assert scan_meta(html)["title"] is None
        # a real head title still wins with svg present
        html2 = (
            b"<html><head><title>Real Title</title></head>"
            b"<body><svg><title>icon</title></svg></body></html>"
        )
        assert scan_meta(html2)["title"] == "Real Title"

    def test_unclosed_title_does_not_swallow_page(self):
        from ocr_spark.htmlpage import MAX_TITLE_CHARS, scan_meta

        page_text = b"word " * 5000
        html = b"<html><head><title>Foo</head><body>" + page_text
        title = scan_meta(html)["title"]
        assert title is not None
        assert title.startswith("Foo")
        assert len(title) <= MAX_TITLE_CHARS + 1

    def test_duplicate_charset_attr_first_wins(self):
        from ocr_spark.htmlpage import decode_html_bytes

        # HTML5: repeated attributes are ignored; last-wins would decode
        # this page as koi8-r and mojibake the text
        html = (
            '<html><head><meta charset="utf-8" charset="koi8-r"></head>'
            "<body><p>résumé</p></body></html>"
        ).encode("utf-8")
        assert "résumé" in decode_html_bytes(html)

    def test_links_capped_only_for_keepable_links(self):
        from ocr_spark.htmlpage import scan_links

        body = "".join(
            f'<a href="http://t.example/{i}">k{i}</a>' for i in range(3)
        )
        # over-cap anchors that would be dropped anyway (fragment, js)
        body += '<a href="#top">top</a><a href="javascript:x()">js</a>'
        html = f"<html><body>{body}</body></html>".encode()
        links, capped = scan_links(html, "http://t.example/", max_links=3)
        assert len(links) == 3
        assert capped is False  # nothing keepable was dropped
        # one more KEEPABLE link past the cap flips the flag
        body += '<a href="http://t.example/extra">x</a>'
        html = f"<html><body>{body}</body></html>".encode()
        links, capped = scan_links(html, "http://t.example/", max_links=3)
        assert len(links) == 3 and capped is True
