"""Golden E2E: the Spark pipeline must be byte-identical to the pure-Python
oracle per url — the analogue of the reference's golden-fixture compare
(tests/conftest.py:25-34: strict zip, equality on line text + block type)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.oracle import extract_document, flat_lines
from ocr_spark.pipeline import (
    PipelineConfig,
    extract,
    flatten_lines,
    read_pages,
)


@pytest.fixture(scope="module")
def extracted(spark, pages_parquet):
    return extract(read_pages(spark, pages_parquet)).cache()


@pytest.fixture(scope="module")
def goldens(spark, pages_parquet):
    src = spark.read.parquet(pages_parquet).select("url", "html", "lang").toPandas()
    return {
        r.url: extract_document(bytes(r.html), r.lang) for r in src.itertuples()
    }


class TestGoldenE2E:
    def test_all_urls_present(self, extracted, goldens):
        urls = {r.url for r in extracted.select("url").collect()}
        assert urls == set(goldens)

    def test_text_byte_identical(self, extracted, goldens):
        for r in extracted.select("url", "text").collect():
            assert r.text == goldens[r.url]["text"], r.url

    def test_metrics_match(self, extracted, goldens):
        rows = extracted.select(
            "url", "n_pages", "n_blocks", "ocr_pages", "status"
        ).collect()
        for r in rows:
            g = goldens[r.url]
            assert (r.n_pages, r.n_blocks, r.ocr_pages) == (
                g["n_pages"],
                g["n_blocks"],
                g["ocr_pages"],
            ), r.url
            assert r.status == "COMPLETED"

    def test_full_tree_strict_join(self, extracted, goldens):
        """Strict compare on (url, page_i, block_i, line_i): content + type,
        exactly the reference equality oracle (conftest.py:29-33)."""
        got = {
            (r.url, r.page_i, r.block_i, r.line_i): (r.block_type, r.content)
            for r in flatten_lines(extracted).collect()
        }
        want = {}
        for url, g in goldens.items():
            for u, p, b, t, li, c in flat_lines(g, url):
                want[(u, p, b, li)] = (t, c)
        assert got == want

    def test_bboxes_roundtrip_float64(self, extracted, goldens):
        rows = extracted.select("url", "pages").collect()
        for r in rows:
            g = goldens[r.url]
            for p_got, p_want in zip(r.pages, g["pages"], strict=True):
                assert p_got.i == p_want["i"]
                for b_got, b_want in zip(p_got.blocks, p_want["blocks"], strict=True):
                    assert list(b_got.bbox) == b_want["bbox"]
                    for l_got, l_want in zip(b_got.lines, b_want["lines"], strict=True):
                        assert list(l_got.bbox) == l_want["bbox"]


class TestPipelineVariants:
    def test_no_persist_same_result(self, spark, pages_parquet, extracted):
        alt = extract(
            read_pages(spark, pages_parquet),
            PipelineConfig(persist_intermediate=False, page_partitions=4),
        )
        a = {r.url: r.text for r in alt.select("url", "text").collect()}
        b = {r.url: r.text for r in extracted.select("url", "text").collect()}
        assert a == b

    def test_manifest_mode_identical_tree(self, spark, pages_parquet, extracted):
        """Manifest mode (workers read parquet row-groups directly; payload
        never crosses the JVM boundary) must produce the same tree."""
        import pathlib

        from ocr_spark.pipeline import extract_from_path

        mdir = str(pathlib.Path(pages_parquet).parent)
        manifest = extract_from_path(spark, pages_parquet)
        del mdir
        key = ["url", "page_i", "block_i", "block_type", "line_i", "content"]
        a = sorted(map(tuple, flatten_lines(manifest).select(key).collect()))
        b = sorted(map(tuple, flatten_lines(extracted).select(key).collect()))
        assert a == b

    def test_paged_mode_identical_tree(self, spark, pages_parquet, extracted):
        """Page-level salted mode (giant-doc corpora) must match."""
        paged = extract(
            read_pages(spark, pages_parquet),
            PipelineConfig(mode="paged", page_partitions=4),
        )
        key = ["url", "page_i", "block_i", "block_type", "line_i", "content"]
        a = sorted(map(tuple, flatten_lines(paged).select(key).collect()))
        b = sorted(map(tuple, flatten_lines(extracted).select(key).collect()))
        assert a == b

    def test_staged_mode_identical_tree(self, spark, pages_parquet, extracted):
        """The staged three-branch plan (GPU deployment shape) must produce
        the exact same nested tree as the default fused plan."""
        staged = extract(
            read_pages(spark, pages_parquet),
            PipelineConfig(mode="staged", page_partitions=4),
        )
        key = ["url", "page_i", "block_i", "block_type", "line_i", "content"]
        a = sorted(map(tuple, flatten_lines(staged).select(key).collect()))
        b = sorted(map(tuple, flatten_lines(extracted).select(key).collect()))
        assert a == b

    def test_stage_table_same_result(self, spark, pages_parquet, extracted, tmp_path):
        alt = extract(
            read_pages(spark, pages_parquet),
            PipelineConfig(stage_path=str(tmp_path / "stage")),
        )
        a = {r.url: r.text for r in alt.select("url", "text").collect()}
        b = {r.url: r.text for r in extracted.select("url", "text").collect()}
        assert a == b

    def test_postprocess_off_keeps_raw_types(self, spark, pages_parquet):
        raw = extract(read_pages(spark, pages_parquet), PipelineConfig(postprocess=False))
        types = {
            r.t
            for r in flatten_lines(raw)
            .select(F.col("block_type").alias("t"))
            .distinct()
            .collect()
        }
        assert "ignore" not in types

    def test_digit_rule_matches_python_semantics(self, spark):
        """Regression (P4): tab-padded and Unicode-digit blocks must get
        the same ignore/keep decision as the oracle's strip().isdigit()
        (the old SQL used trim()+[0-9], which diverged)."""
        import datetime as dt

        from ocr_spark.fixtures import PAGE_H
        from ocr_spark.payload import encode_doc

        def page_with(content):
            return {
                "i": 0, "width": 612.0, "height": PAGE_H,
                "layout": [{"type": "text", "bbox": [72.0, 72.0, 540.0, 92.0]}],
                "native_lines": [
                    {"bbox": [74.0, 74.0, 538.0, 90.0], "spans": [content]}
                ],
                "ocr_lines": [],
            }

        cases = ["42\t", "\u0664\u0662", "42", "not a number 42"]
        rows = [
            (
                f"u://digit/{i}",
                dt.datetime(2025, 1, 1),
                bytearray(encode_doc([page_with(c)], dpi=200, kind="A")),
                "",
                "en",
            )
            for i, c in enumerate(cases)
        ]
        schema = (
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string"
        )
        out = extract(spark.createDataFrame(rows, schema)).collect()
        got = {r.url: r.pages[0].blocks[0].type for r in out}
        for i, c in enumerate(cases):
            want = "ignore" if c.strip().isdigit() else "text"
            assert got[f"u://digit/{i}"] == want, (c, got)

    def test_zero_page_doc_survives_as_empty_tree(self, spark):
        """A zero-page document must appear in the output as an empty
        COMPLETED tree (the reference yields pages=[]), in every mode."""
        import datetime as dt

        from ocr_spark.payload import encode_doc

        row = (
            "u://empty",
            dt.datetime(2025, 1, 1),
            bytearray(encode_doc([], dpi=200, kind="A")),
            "",
            "en",
        )
        schema = (
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string"
        )
        df = spark.createDataFrame([row], schema)
        for mode in ("fused", "paged", "staged"):
            out = extract(df, PipelineConfig(mode=mode, page_partitions=2)).collect()
            assert len(out) == 1, mode
            r = out[0]
            assert (r.status, r.n_pages, r.text, list(r.pages)) == (
                "COMPLETED", 0, "", [],
            ), mode

    def test_corrupt_payload_yields_failed_row(self, spark):
        pdf = pd.DataFrame(
            {
                "url": ["https://bad.example/1"],
                "warc_ts": [pd.Timestamp("2025-01-01", tz="UTC")],
                "html": [b"garbage not a payload"],
                "text": [""],
                "lang": ["en"],
            }
        )
        df = spark.createDataFrame(pdf)
        out = extract(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r.status == "FAILED"
        assert r.error.startswith("PARSE_ERROR")
        assert r.text == "" and r.pages == []

    def test_kernel_throwing_page_yields_failed_row_not_task_abort(
        self, spark
    ):
        """A payload that decodes cleanly but blows up inside the page
        kernels (here: a 3-coordinate bbox) must become an EXTRACT_ERROR
        lineage row in EVERY mode — never a Spark task failure, and never
        poison the healthy documents sharing its batch."""
        import datetime as dt

        from ocr_spark.fixtures import make_doc
        from ocr_spark.payload import MAGIC

        bad = (
            MAGIC
            + b'<doc dpi="200" kind="A"><page i="0" w="612.0" h="792.0">'
            b'<layout type="text" bbox="1.0,2.0,3.0"/>'
            b'<nline bbox="1.0,2.0,3.0,4.0" s="aGk="/></page></doc>'
        )
        good = make_doc(1)
        rows = [
            ("u://kernel-bad", dt.datetime(2025, 1, 1), bytearray(bad), "", "en"),
            (good["url"], good["warc_ts"].replace(tzinfo=None),
             bytearray(good["html"]), "", good["lang"]),
        ]
        schema = (
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string"
        )
        df = spark.createDataFrame(rows, schema)
        for mode in ("fused", "paged", "staged"):
            out = {
                r.url: r
                for r in extract(
                    df, PipelineConfig(mode=mode, page_partitions=2)
                ).collect()
            }
            assert len(out) == 2, mode
            r = out["u://kernel-bad"]
            assert r.status == "FAILED", mode
            assert r.error.startswith("EXTRACT_ERROR"), (mode, r.error)
            g = out[good["url"]]
            assert g.status == "COMPLETED" and g.n_pages > 0, mode

    def test_error_granularity_identical_across_modes(self, spark):
        """Error lineage is per PAGE in every mode: a document mixing good
        and kernel-throwing pages keeps its good pages' text and records
        ONE EXTRACT_ERROR for the bad page — and fused, paged, and staged
        produce byte-identical rows for it (fused used to drop the whole
        document to a single page_i=-1 error row, diverging from the
        per-page guard of the paged/staged plans)."""
        import datetime as dt

        from ocr_spark.payload import MAGIC

        mixed = (
            MAGIC
            + b'<doc dpi="200" kind="A">'
            b'<page i="0" w="612.0" h="792.0">'
            b'<layout type="text" bbox="72.0,72.0,540.0,100.0"/>'
            b'<nline bbox="74.0,75.0,538.0,99.0" s="Z29vZCBwYWdl"/></page>'
            b'<page i="1" w="612.0" h="792.0">'
            b'<layout type="text" bbox="1.0,2.0,3.0"/>'
            b'<nline bbox="74.0,75.0,538.0,99.0" s="YmFk"/></page>'
            b'<page i="2" w="612.0" h="792.0">'
            b'<layout type="text" bbox="72.0,72.0,540.0,100.0"/>'
            b'<nline bbox="74.0,75.0,538.0,99.0" s="dGFpbCBwYWdl"/></page>'
            b"</doc>"
        )
        df = spark.createDataFrame(
            [("u://mixed", dt.datetime(2025, 1, 1), bytearray(mixed), "", "en")],
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string",
        )
        results = {}
        for mode in ("fused", "paged", "staged"):
            out = extract(
                df, PipelineConfig(mode=mode, page_partitions=2)
            ).collect()
            assert len(out) == 1, mode
            r = out[0]
            assert r.status == "FAILED", mode  # the bad page taints status
            assert r.error.startswith("EXTRACT_ERROR"), (mode, r.error)
            # good pages SURVIVE at page granularity
            assert [p.i for p in r.pages] == [0, 2], mode
            assert r.text == "good pagetail page", mode
            results[mode] = (
                r.url, r.text, r.n_pages, r.n_blocks, r.ocr_pages,
                r.status, r.error,
                [(p.i, [(b.i, b.type, tuple(b.bbox),
                         [(ln.i, ln.content, tuple(ln.bbox))
                          for ln in b.lines]) for b in p.blocks])
                 for p in r.pages],
            )
        assert results["fused"] == results["paged"] == results["staged"]
