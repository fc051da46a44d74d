"""WARC ingest (the Common Crawl wire format): parser round-trip,
torn-tail accounting, and the Spark reader feeding the extraction
pipeline with byte-identical text."""

from datetime import datetime, timezone

from ocr_spark.fixtures import make_doc, make_html_doc
from ocr_spark.oracle import extract_document
from ocr_spark.pipeline import extract
from ocr_spark.sources import read_pages_warc
from ocr_spark.warc import (
    build_record,
    build_warc,
    extract_pages,
    gunzip_members,
    iter_warc_records,
    iter_warc_records_stream,
    split_http_payload,
)

DATE = "2025-01-01T00:00:00Z"


def _file(bodies, gz=True):
    recs = [
        build_record(f"http://ex.com/{i}", DATE, b) for i, b in enumerate(bodies)
    ]
    return build_warc(recs, gzip_members=gz)


class TestParser:
    def test_round_trip_gzip_and_plain(self):
        bodies = [b"<html>a</html>", b"", b"x" * 10_000]
        for gz in (True, False):
            pages, errors = extract_pages(_file(bodies, gz=gz))
            assert errors == 0
            assert [p["html"] for p in pages] == bodies
            assert pages[0]["url"] == "http://ex.com/0"
            assert pages[0]["warc_ts"] == datetime(
                2025, 1, 1, tzinfo=timezone.utc
            )

    def test_payload_containing_warc_magic_not_split(self):
        # length-walked, never marker-scanned: a body may contain WARC/1.0
        body = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
        pages, errors = extract_pages(_file([body]))
        assert errors == 0 and len(pages) == 1
        assert pages[0]["html"] == body

    def test_non_content_records_skipped_silently(self):
        recs = [
            build_record("http://ex.com/i", DATE, b"crawl", warc_type="warcinfo"),
            build_record("http://ex.com/q", DATE, b"GET /", warc_type="request"),
            build_record("http://ex.com/r", DATE, b"<p>hi</p>"),
            build_record("http://ex.com/w", DATE, b"plain text",
                         warc_type="conversion"),
        ]
        pages, errors = extract_pages(build_warc(recs))
        assert errors == 0
        assert [(p["url"], p["html"]) for p in pages] == [
            ("http://ex.com/r", b"<p>hi</p>"),
            ("http://ex.com/w", b"plain text"),  # WET body kept whole
        ]

    def test_torn_tail_counted_never_raised(self):
        good = _file([b"<p>ok</p>"], gz=False)
        torn = good + build_record("http://ex.com/t", DATE, b"x" * 100)[:-60]
        pages, errors = extract_pages(torn)
        assert len(pages) == 1 and errors == 1
        # torn FINAL gzip member: decoded prefix survives, tear counted
        gz = _file([b"<p>a</p>", b"<p>b</p>"])
        pages, errors = extract_pages(gz[:-20])
        assert [p["html"] for p in pages] == [b"<p>a</p>"] and errors == 1

    def test_missing_uri_or_bad_date_counted(self):
        rec = build_record("", DATE, b"x")
        bad_date = build_record("http://ex.com/d", "not-a-date", b"x")
        pages, errors = extract_pages(build_warc([rec, bad_date]))
        assert pages == [] and errors == 2

    def test_http_header_strip(self):
        assert split_http_payload(
            b"HTTP/1.1 200 OK\r\nA: b\r\n\r\n<body>"
        ) == b"<body>"
        assert split_http_payload(b"no-status-line") == b"no-status-line"
        assert split_http_payload(b"HTTP/1.1 200 OK\r\nA: b") == b""

    def test_gunzip_passthrough_and_determinism(self):
        assert gunzip_members(b"plain") == b"plain"
        assert _file([b"abc"]) == _file([b"abc"])  # mtime pinned

    def test_duplicate_headers_first_wins(self):
        raw = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://ex.com/1\r\n"
            b"WARC-Target-URI: http://ex.com/2\r\n"
            b"WARC-Date: " + DATE.encode() + b"\r\n"
            b"Content-Length: 0\r\n\r\n\r\n\r\n"
        )
        headers, _ = next(iter_warc_records(raw))
        assert headers["warc-target-uri"] == "http://ex.com/1"


class TestStreamParser:
    """iter_warc_records_stream must yield the IDENTICAL record/error
    sequence as the whole-buffer parser for any input and any chunk
    size — it exists purely to bound task memory (a 1 GiB crawl file
    never materializes its decompressed form)."""

    CHUNKS = (1, 3, 17, 1 << 20)

    def _assert_parity(self, data: bytes):
        import io

        expected = list(iter_warc_records(data))
        for chunk in self.CHUNKS:
            got = list(iter_warc_records_stream(io.BytesIO(data), chunk))
            assert got == expected, (chunk, len(data))

    def test_parity_corpus(self):
        files = [
            _file([b"<html>a</html>", b"", b"x" * 10_000]),
            _file([b"<p>a</p>"], gz=False),
            _file([b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"]),
            build_warc(
                [
                    build_record("http://ex.com/i", DATE, b"c",
                                 warc_type="warcinfo"),
                    build_record("http://ex.com/r", DATE, b"<p>hi</p>"),
                ]
            ),
            b"",                      # empty input: no records, no error
            b"plain garbage",         # bad-magic
            b"\x1f\x8b garbage",      # torn-gzip
            b"\x1f\x8b",              # bare magic: torn-gzip
            b"\r\n\r\n",              # padding only
            b"\r",                    # odd trailing byte: bad-magic
            _file([b"<p>ok</p>"], gz=False)
            + build_record("http://ex.com/t", DATE, b"x" * 100)[:-60],
            _file([b"<p>a</p>", b"<p>b</p>"])[:-20],  # torn final member
            b"WARC/1.0\r\nContent-Length: nope\r\n\r\n",  # bad-length
            b"WARC/1.0\r\nContent-Length: 4",             # torn-header
            _file([b"x"]) + b"trailing-non-gzip-bytes",
        ]
        for data in files:
            self._assert_parity(data)

    def test_parity_fuzzed_truncations(self):
        """Every truncation point of a 3-record gzip file (and its plain
        twin) parses identically in both engines — tears can land mid
        gzip member, mid header, or mid payload."""
        for gz in (True, False):
            data = _file([b"<p>a</p>", b"y" * 300, b"z"], gz=gz)
            for cut in range(0, len(data), 7):
                self._assert_parity(data[:cut])

    def test_bounded_buffer(self):
        """The stream parser's internal buffer stays O(record), not
        O(file): feed 200 records and assert peak buffer never exceeds
        a few records' worth."""
        import io

        data = _file([b"b" * 1000] * 200, gz=False)
        peak = 0
        # probe the generator's own buffer local: it is trimmed after
        # every record, so parsing 200 KB of records through 1 KiB
        # chunks must never hold more than a few KB buffered.
        gen = iter_warc_records_stream(io.BytesIO(data), chunk=1024)
        n = 0
        for headers, payload in gen:
            n += 1
            frame = gen.gi_frame
            peak = max(peak, len(frame.f_locals["buf"]))
        assert n == 200
        assert peak < 8_192, peak


class TestSparkReader:
    def test_warc_directory_to_extraction(self, spark, tmp_path):
        d = tmp_path / "crawl"
        d.mkdir()
        docs = {}
        for f in range(2):  # two files, three docs each (pdf-ish + html)
            recs = []
            for k in range(3):
                r = (make_doc if k % 2 else make_html_doc)(f * 3 + k)
                url = f"http://crawl.test/{f}/{k}"
                recs.append(build_record(url, DATE, r["html"]))
                docs[url] = r["html"]
            (d / f"part-{f}.warc.gz").write_bytes(build_warc(recs))
        pages = read_pages_warc(spark, str(d), lang="en")
        rows = extract(pages).collect()
        assert len(rows) == 6
        for row in rows:
            assert row.text == extract_document(docs[row.url], "en")["text"]

    def test_error_lineage_column(self, spark, tmp_path):
        d = tmp_path / "crawl"
        d.mkdir()
        good = build_record("http://ex.com/ok", DATE, b"<p>fine</p>")
        torn = build_record("http://ex.com/t", DATE, b"y" * 50)[:-30]
        (d / "a.warc.gz").write_bytes(build_warc([good]) + build_warc([torn]))
        (d / "b.warc.gz").write_bytes(b"\x1f\x8b garbage")
        out = {
            r.warc_file.rsplit("/", 1)[-1]: r
            for r in read_pages_warc(spark, str(d)).collect()
        }
        assert out["a.warc.gz"].url == "http://ex.com/ok"
        assert out["a.warc.gz"].warc_errors == 1
        # all-error file surfaces as the url='' sentinel, never silence
        assert out["b.warc.gz"].url == "" and out["b.warc.gz"].warc_errors == 1

    def test_stream_reader_parity(self, spark, tmp_path):
        """read_pages_warc_stream yields the identical page rows as the
        fused reader (same urls/ts/bytes) and the identical per-file
        error totals under the job's max-per-file audit — only the
        lineage PLACEMENT differs (one sentinel row vs repetition)."""
        from pyspark.sql import functions as F

        from ocr_spark.sources import read_pages_warc_stream

        d = tmp_path / "crawl"
        d.mkdir()
        recs = [
            build_record(f"http://ex.com/{k}", DATE,
                         (make_doc if k % 2 else make_html_doc)(k)["html"])
            for k in range(5)
        ]
        (d / "a.warc.gz").write_bytes(build_warc(recs[:3]))
        torn = build_record("http://ex.com/t", DATE, b"y" * 50)[:-30]
        (d / "b.warc.gz").write_bytes(build_warc(recs[3:]) + build_warc([torn]))
        (d / "c.warc.gz").write_bytes(b"\x1f\x8b garbage")

        fused = read_pages_warc(spark, str(d), lang="en")
        # batch_records=2 forces multi-batch flushes within one file
        stream = read_pages_warc_stream(
            spark, str(d), lang="en", batch_records=2
        )
        key = lambda r: r.url  # noqa: E731
        pages_f = sorted(
            [r for r in fused.collect() if r.url], key=key)
        pages_s = sorted(
            [r for r in stream.collect() if r.url], key=key)
        assert [(r.url, r.warc_ts, bytes(r.html), r.lang) for r in pages_f] \
            == [(r.url, r.warc_ts, bytes(r.html), r.lang) for r in pages_s]

        def audit(df):
            return {
                r.warc_file.rsplit("/", 1)[-1]: r.e
                for r in df.groupBy("warc_file")
                .agg(F.max("warc_errors").alias("e"))
                .collect()
            }

        assert audit(fused) == audit(stream) == {
            "a.warc.gz": 0, "b.warc.gz": 1, "c.warc.gz": 1,
        }
        # extraction byte-identity holds through the stream reader too
        texts = {
            r.url: r.text
            for r in extract(stream.filter(F.col("url") != "").drop(
                "warc_file", "warc_errors")).collect()
        }
        for k in range(5):
            r = (make_doc if k % 2 else make_html_doc)(k)
            assert texts[f"http://ex.com/{k}"] == extract_document(
                r["html"], "en")["text"]

    def test_stream_reader_scheme_gate(self, spark):
        """Non-mountable schemes fail loudly at task time, pointing at
        the fused reader — never a silent empty result."""
        import pytest

        from ocr_spark.sources import WARC_PAGES_SCHEMA, _warc_stream_fn

        with pytest.raises(Exception, match="read_pages_warc"):
            spark.createDataFrame(
                [("s3a://bucket/f.warc.gz",)], "path string"
            ).mapInPandas(
                _warc_stream_fn("", 256, 1 << 20), WARC_PAGES_SCHEMA
            ).collect()


class TestHttpBodyDecoding:
    """Transfer-Encoding / Content-Encoding bodies (wget/heritrix
    archives preserve the wire bytes; r5 review finding — without the
    decode, chunk-size lines interleave into the extracted text)."""

    def test_chunked_body_dechunked(self):
        body = b"7\r\n<html><\r\n6\r\n/html>\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
        )
        assert split_http_payload(payload) == b"<html></html>"

    def test_chunked_with_extension_and_trailer(self):
        body = b"5;ext=1\r\nhello\r\n0\r\nX-T: v\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
        )
        assert split_http_payload(payload) == b"hello"

    def test_malformed_chunk_framing_falls_back_to_raw(self):
        body = b"ZZZ\r\nnot hex\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
        )
        # raw body handed to the sniffer (visible failure downstream),
        # never an exception or a silent wrong decode
        assert split_http_payload(payload) == body

    def test_gzip_content_encoding_inflated(self):
        import gzip

        html = b"<html><body>compressed page</body></html>"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + gzip.compress(html)
        )
        assert split_http_payload(payload) == html

    def test_chunked_then_gzip_layering(self):
        import gzip

        gz = gzip.compress(b"<p>layered</p>")
        chunked = (
            b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + chunked
        )
        assert split_http_payload(payload) == b"<p>layered</p>"

    def test_corrupt_gzip_body_falls_back_to_raw(self):
        bad = b"\x1f\x8bgarbage-not-gzip"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bad
        )
        assert split_http_payload(payload) == bad


class TestCorruptMember:
    def test_mid_member_corruption_surfaces_in_both_readers(self):
        """A bit-flip inside a NON-final gzip member loses the file's
        tail; pre-fix the buffer reader finished CLEANLY at the prior
        record boundary and the loss was silent (r5 review finding).
        Both readers must now count at least one error while agreeing
        on the records before the corruption."""
        import io

        good = _file([b"<html>a</html>", b"<html>b</html>"])
        # find the second member boundary (next gzip magic after pos 0)
        split = good.find(b"\x1f\x8b", 2)
        assert split > 0
        corrupted = (
            good[:split]
            + good[split:split + 12]
            + bytes([good[split + 12] ^ 0xFF])
            + good[split + 13:]
        )

        def classify(records):
            pages, errs = [], 0
            for h, p in records:
                if "_error" in h:
                    errs += 1
                elif h.get("warc-type") == "response":
                    pages.append(h["warc-target-uri"])
            return pages, errs

        buf_pages, buf_errs = classify(iter_warc_records(corrupted))
        st_pages, st_errs = classify(
            iter_warc_records_stream(io.BytesIO(corrupted), chunk=7)
        )
        assert buf_errs >= 1 and st_errs >= 1
        # the clean prefix agrees: record 0 parsed, record 1 lost
        assert buf_pages == ["http://ex.com/0"]
        assert st_pages[:1] == ["http://ex.com/0"]


class TestHostileRecords:
    """r5 review findings: crafted/corrupt records must degrade into
    counted errors or raw-body fallbacks, never wedge a task."""

    def test_negative_content_length_terminates_both_readers(self):
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://x/\r\n"
            b"WARC-Date: " + DATE.encode() + b"\r\n"
            b"Content-Length: -33\r\n\r\nbody\r\n\r\n"
        )
        # whole-buffer reader: one bad-length error row, then STOP
        out = list(iter_warc_records(rec))
        assert len(out) == 1 and out[0][0]["_error"] == "bad-length"
        # streaming reader: same
        import io

        out = list(iter_warc_records_stream(io.BytesIO(rec)))
        assert len(out) == 1 and out[0][0]["_error"] == "bad-length"

    def test_negative_chunk_size_falls_back_to_raw(self):
        body = b"-6\r\nXXXX\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
        )
        assert split_http_payload(payload) == body

    def test_multi_member_gzip_body_fully_decoded(self):
        import gzip

        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + gzip.compress(b"part-one ") + gzip.compress(b"part-two")
        )
        assert split_http_payload(payload) == b"part-one part-two"

    def test_valid_empty_gzip_body_decodes_to_empty(self):
        import gzip

        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + gzip.compress(b"")
        )
        assert split_http_payload(payload) == b""

    def test_gzip_member_plus_garbage_falls_back_to_raw(self):
        import gzip

        bad = gzip.compress(b"real") + b"trailing-garbage"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bad
        )
        # leftover non-gzip bytes = decode failure, visible raw fallback
        # — never a silent cut to just 'real'
        assert split_http_payload(payload) == bad

    def test_fractional_second_warc_date_accepted(self):
        rec = build_record(
            "http://x/", "2025-01-01T00:00:00.123Z", b"<p>hi</p>"
        )
        pages, errors = extract_pages(rec)
        assert errors == 0 and len(pages) == 1
        assert pages[0]["warc_ts"] == datetime(
            2025, 1, 1, 0, 0, 0, 123000, tzinfo=timezone.utc
        )

    def test_conversion_record_body_never_header_split(self):
        text = b"HTTP/3 explained\r\n\r\nThe new protocol is neat."
        rec = build_record(
            "http://x/wet", DATE, text, warc_type="conversion"
        )
        pages, errors = extract_pages(rec)
        assert errors == 0
        # a WET body that happens to start with 'HTTP/' is CONTENT, not
        # wire headers — must arrive whole
        assert pages[0]["html"] == text
