"""Streaming surface: incremental extraction ≡ batch extraction, and
restart-resume does not double-process (S8/S9 analogue, SURVEY.md §2.1)."""

import shutil
from pathlib import Path

import pytest

from ocr_spark.fixtures import write_pages_parquet
from ocr_spark.io import read_extracted
from ocr_spark.oracle import extract_document
from ocr_spark.streaming import stream_extract


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": tmp_path / "pages_in",
        "out": str(tmp_path / "extracted"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    d["in"].mkdir()
    return d


def _await(q):
    q.awaitTermination(120)


class TestStreaming:
    def test_incremental_equals_batch(self, spark, dirs):
        # two arrival waves
        write_pages_parquet(dirs["in"] / "w1.parquet", 12)
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))
        n1 = read_extracted(spark, dirs["out"]).count()
        assert n1 == 12

        # second wave: same generator, wider range → 8 new docs
        tmp = dirs["in"].parent / "w2_src.parquet"
        write_pages_parquet(tmp, 20)
        shutil.copy(tmp, dirs["in"] / "w2.parquet")
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))

        out = read_extracted(spark, dirs["out"])
        rows = {r.url: r for r in out.collect()}
        assert len(rows) == 20  # no duplicates from re-delivered urls
        # byte-identity spot check against the oracle
        from ocr_spark.fixtures import make_doc

        for k in (0, 7, 19):
            d = make_doc(k)
            assert rows[d["url"]].text == extract_document(d["html"], d["lang"])["text"]

    def test_intra_batch_duplicate_urls_not_doubled(self, spark, dirs):
        """Two overlapping files arriving in the SAME micro-batch must not
        assemble documents with doubled pages."""
        write_pages_parquet(dirs["in"] / "a.parquet", 8)
        tmp = dirs["in"].parent / "b_src.parquet"
        write_pages_parquet(tmp, 12)  # urls 0-7 overlap file a
        shutil.copy(tmp, dirs["in"] / "b.parquet")
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))
        out = {r.url: r for r in read_extracted(spark, dirs["out"]).collect()}
        assert len(out) == 12
        from ocr_spark.fixtures import make_doc

        for k in (0, 5, 11):
            d = make_doc(k)
            golden = extract_document(d["html"], d["lang"])
            assert out[d["url"]].n_pages == golden["n_pages"], k
            assert out[d["url"]].text == golden["text"], k

    def test_restart_is_idempotent(self, spark, dirs):
        write_pages_parquet(dirs["in"] / "w1.parquet", 10)
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))
        # wipe the stream checkpoint (simulated total loss) → re-delivery of
        # every file; the left-anti layer must keep the output single-copy
        shutil.rmtree(dirs["ckpt"])
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))
        out = read_extracted(spark, dirs["out"])
        assert out.count() == 10
        assert out.select("url").distinct().count() == 10


class TestStreamingMixedFormats:
    def test_html_docs_stream_byte_identical(self, spark, dirs):
        """An arriving wave that mixes PDF-style payloads and real HTML
        pages streams through the same pipeline — format dispatch inside
        the micro-batch, byte-identical output per url."""
        from ocr_spark.fixtures import (
            generate_html_rows,
            generate_pages_rows,
            write_rows_parquet,
        )

        rows = generate_pages_rows(6) + generate_html_rows(10)
        write_rows_parquet(dirs["in"] / "wave.parquet", rows)
        _await(stream_extract(spark, str(dirs["in"]), dirs["out"], dirs["ckpt"]))
        out = {r.url: r for r in read_extracted(spark, dirs["out"]).collect()}
        assert len(out) == 16
        for r in rows:
            want = extract_document(bytes(r["html"]), r["lang"])["text"]
            assert out[r["url"]].text == want, r["url"]
            assert out[r["url"]].status == "COMPLETED"


class TestEventTimeMetrics:
    def test_windowed_counts_finalize_by_watermark(self, spark, dirs, tmp_path):
        """Windows key on the CRAWL timestamp (event time), emit only once
        the watermark passes their end, and withhold still-open windows —
        the standard late-data contract."""
        import datetime as dt
        import os
        import time

        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_crawl_metrics

        def rows(stamps):
            return [
                {
                    "url": f"u://w/{i}-{ts:%H%M}",
                    "warc_ts": ts,
                    "html": b"<html><body><p>x</p></body></html>",
                    "text": "",
                    "lang": "en",
                }
                for i, ts in enumerate(stamps)
            ]

        day = dt.datetime(2025, 1, 1)
        h = dt.timedelta(hours=1)
        m = dt.timedelta(minutes=1)
        # file 1: four docs in the 00:00 window, two in the 01:00 window
        write_rows_parquet(
            dirs["in"] / "f1.parquet",
            rows([day + 10 * m, day + 20 * m, day + 30 * m, day + 40 * m,
                  day + h + 15 * m, day + h + 45 * m]),
        )
        # files 2 and 3: later event times that advance the watermark
        # (2-hour lateness) past the first two windows
        write_rows_parquet(dirs["in"] / "f2.parquet", rows([day + 5 * h]))
        write_rows_parquet(dirs["in"] / "f3.parquet", rows([day + 6 * h]))
        # one file per micro-batch, in deterministic mtime order
        for i, name in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
            t = time.time() + i
            os.utime(dirs["in"] / name, (t, t))

        out_dir = str(tmp_path / "metrics_out")
        q = stream_crawl_metrics(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"],
            window_duration="1 hour", watermark="2 hours",
        )
        q.awaitTermination(120)

        got = {
            r.window_start: (r.docs, r.payload_bytes)
            for r in spark.read.parquet(out_dir).collect()
        }
        payload = len(b"<html><body><p>x</p></body></html>")
        # the two early windows finalized (watermark reached 03:00 or
        # later); the 05:00/06:00 windows are still open → withheld
        assert got == {
            day: (4, 4 * payload),
            day + h: (2, 2 * payload),
        }


class TestStatefulHostQuota:
    def test_per_host_byte_quota_across_batches(self, spark, dirs, tmp_path):
        """applyInPandasWithState: per-host cumulative admission state
        persists across micro-batches; a host stops contributing once its
        quota is exhausted while other hosts continue."""
        import os
        import time

        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_host_quota

        payload = b"x" * 40

        def page(host, i):
            return {
                "url": f"https://{host}/p{i}",
                "warc_ts": None,
                "html": payload,
                "text": "",
                "lang": "en",
            }

        # one page per host per file → the admission decision at the
        # quota boundary is batch-deterministic
        waves = [
            [page("a.example.com", 1), page("b.example.com", 1)],
            [page("a.example.com", 2), page("b.example.com", 2)],
            [page("a.example.com", 3), page("b.example.com", 3)],
            [page("a.example.com", 4)],
        ]
        for i, rows in enumerate(waves):
            f = dirs["in"] / f"w{i}.parquet"
            write_rows_parquet(f, rows)
            t = time.time() + i
            os.utime(f, (t, t))

        out_dir = str(tmp_path / "quota_out")
        q = stream_host_quota(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"],
            max_bytes_per_host=100,
        )
        q.awaitTermination(120)

        got = sorted(
            (r.url, r.n_bytes, r.host_bytes_after)
            for r in spark.read.parquet(out_dir).collect()
        )
        # pages 1-3 admitted per host (40, 80, 120 cumulative — the page
        # crossing the quota is still admitted, then the gate closes);
        # page 4 of host a is dropped
        assert got == [
            ("https://a.example.com/p1", 40, 40),
            ("https://a.example.com/p2", 40, 80),
            ("https://a.example.com/p3", 40, 120),
            ("https://b.example.com/p1", 40, 40),
            ("https://b.example.com/p2", 40, 80),
            ("https://b.example.com/p3", 40, 120),
        ]


class TestStreamExactDedup:
    def test_first_digest_wins_across_batches(self, spark, dirs, tmp_path):
        """Identical payloads arriving in LATER micro-batches are dropped
        (cross-batch state), distinct payloads all pass, and the winner
        is the earliest-arriving copy."""
        import datetime as dt
        import os
        import time

        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_exact_dedup

        day = dt.datetime(2025, 1, 1)
        m = dt.timedelta(minutes=1)

        def row(url, payload, ts):
            return {
                "url": url, "warc_ts": ts, "html": payload,
                "text": "", "lang": "en",
            }

        a = b"<html><body><p>alpha</p></body></html>"
        b_ = b"<html><body><p>beta</p></body></html>"
        c = b"<html><body><p>gamma</p></body></html>"
        # batch 1: two distinct payloads (+ an intra-batch dup of a)
        write_rows_parquet(
            dirs["in"] / "f1.parquet",
            [
                row("u://1/a", a, day),
                row("u://1/a2", a, day + m),
                row("u://1/b", b_, day + 2 * m),
            ],
        )
        # batch 2: re-crawl of both + one new payload
        write_rows_parquet(
            dirs["in"] / "f2.parquet",
            [
                row("u://2/a", a, day + 10 * m),
                row("u://2/b", b_, day + 11 * m),
                row("u://2/c", c, day + 12 * m),
            ],
        )
        for i, name in enumerate(["f1.parquet", "f2.parquet"]):
            t = time.time() + i
            os.utime(dirs["in"] / name, (t, t))

        out_dir = str(tmp_path / "dedup_out")
        q = stream_exact_dedup(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"],
            watermark="2 hours",
        )
        q.awaitTermination(120)

        got = sorted(r.url for r in spark.read.parquet(out_dir).collect())
        assert got == ["u://1/a", "u://1/b", "u://2/c"]


class TestStreamIncrementalFilter:
    def test_admitted_equals_anti_join_and_stateless(self, spark, dirs, tmp_path):
        """Pages whose payload digest exists in the static prior-corpus
        store are dropped at ingest; everything else passes — exactly the
        batch anti-join (bloom fp verified away).  Stream-static joins
        only: no state store rows needed."""
        import datetime as dt

        from pyspark.sql import functions as F

        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_incremental_filter

        day = dt.datetime(2025, 1, 1)

        def row(url, payload):
            return {
                "url": url, "warc_ts": day, "html": payload,
                "text": "", "lang": "en",
            }

        a = b"<html><body><p>alpha</p></body></html>"
        b_ = b"<html><body><p>beta</p></body></html>"
        c = b"<html><body><p>gamma</p></body></html>"
        write_rows_parquet(
            dirs["in"] / "f1.parquet",
            [row("u://n/a", a), row("u://n/b", b_), row("u://n/c", c)],
        )
        # prior corpus: payloads a and b were kept last month
        old = spark.createDataFrame(
            [(a,), (b_,)], "html binary"
        ).select(F.md5("html").alias("digest"))

        out_dir = str(tmp_path / "inc_out")
        # tiny m floods the bloom with false positives — the verify join
        # must still admit exactly the truly-new payload
        q = stream_incremental_filter(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"], old,
            m_bits=1 << 6, k=4,
        )
        q.awaitTermination(120)
        got = [r.url for r in spark.read.parquet(out_dir).collect()]
        assert got == ["u://n/c"]

    def test_empty_old_corpus_admits_everything(self, spark, dirs, tmp_path):
        from pyspark.sql import functions as F

        from ocr_spark.fixtures import write_pages_parquet
        from ocr_spark.streaming import stream_incremental_filter

        write_pages_parquet(dirs["in"] / "w1.parquet", 10)
        old = spark.createDataFrame([], "digest string")
        out_dir = str(tmp_path / "inc_out")
        q = stream_incremental_filter(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"], old,
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out_dir).count() == 10

    def test_dsir_gate_matches_batch_scoring(self, spark, dirs, tmp_path):
        """stream_dsir_filter admits exactly the pages the BATCH inline
        scorer keeps at the same threshold, with bit-identical logw —
        the inline path's zero-exchange plan is what makes the batch
        gate and the ingest gate one expression."""
        import datetime as dt

        from pyspark.sql import functions as F

        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.operators import dsir
        from ocr_spark.streaming import stream_dsir_filter

        day = dt.datetime(2025, 1, 1)
        texts = {
            "u://q/a": "clean prose flows here",
            "u://q/b": "buy spam buy spam now",
            "u://q/c": "clean text flows here today",
            "u://q/d": "spam spam spam spam",
        }
        write_rows_parquet(
            dirs["in"] / "f1.parquet",
            [
                {"url": u, "warc_ts": day, "html": None, "text": t,
                 "lang": "en"}
                for u, t in sorted(texts.items())
            ],
        )
        target = spark.createDataFrame(
            [(1, "clean prose flows"), (2, "clean text here")],
            "doc_id bigint, text string",
        )
        raw = spark.createDataFrame(
            list(enumerate(texts.values())), "doc_id bigint, text string"
        )
        b = 256
        ratios = dsir.dsir_log_ratios(
            dsir.hashed_ngram_counts(target, b),
            dsir.hashed_ngram_counts(raw, b),
            b,
        )
        batch = {
            r.url: r.logw
            for r in dsir.with_dsir_weight(
                spark.createDataFrame(
                    [(u, t) for u, t in texts.items()],
                    "url string, text string",
                ),
                ratios,
            ).collect()
        }
        # threshold = the median batch score (the logged-quantile
        # posture the docstring prescribes; a fixed 0 is meaningless —
        # smoothing over B cells shifts every tiny-corpus sum negative)
        thr = sorted(batch.values())[len(batch) // 2]
        out_dir = str(tmp_path / "dsir_out")
        q = stream_dsir_filter(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"], ratios, thr
        )
        q.awaitTermination(120)
        got = {r.url: r.logw for r in spark.read.parquet(out_dir).collect()}
        want = {u: w for u, w in batch.items() if w >= thr}
        assert got == want  # same admissions, bit-identical scores
        assert 0 < len(want) < len(texts)  # the gate really split the set


class TestNullPayloadStreams:
    """NULL html pages are legal (PAGES_SCHEMA declares html nullable);
    none of the streaming surfaces may crash on them or silently change
    dedup semantics (r5 review findings)."""

    def test_host_quota_counts_null_payload_as_zero(
        self, spark, dirs, tmp_path
    ):
        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_host_quota

        rows = [
            {"url": "https://n.example.com/p1", "warc_ts": None,
             "html": None, "text": "", "lang": "en"},
            {"url": "https://n.example.com/p2", "warc_ts": None,
             "html": b"x" * 40, "text": "", "lang": "en"},
        ]
        write_rows_parquet(dirs["in"] / "w0.parquet", rows)
        out_dir = str(tmp_path / "qo")
        q = stream_host_quota(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"],
            max_bytes_per_host=100,
        )
        q.awaitTermination(120)
        got = sorted(
            (r.url, r.n_bytes)
            for r in spark.read.parquet(out_dir).collect()
        )
        # pre-fix this crashed the query: octet_length(NULL) -> NaN ->
        # int(NaN) ValueError inside applyInPandasWithState
        assert got == [
            ("https://n.example.com/p1", 0),
            ("https://n.example.com/p2", 40),
        ]

    def test_incremental_filter_null_payload_matches_empty(
        self, spark, dirs, tmp_path
    ):
        """A NULL-payload page must dedup against a prior snapshot's
        EMPTY-payload digest (md5(coalesce(html, '')) both sides): the
        old md5(html) gave it a NULL digest that never matched, silently
        re-admitting it — and emitted digest=NULL as the join-back key."""
        from ocr_spark.fixtures import write_rows_parquet
        from ocr_spark.streaming import stream_incremental_filter

        rows = [
            {"url": "https://n.example.com/null", "warc_ts": None,
             "html": None, "text": "", "lang": "en"},
            {"url": "https://n.example.com/fresh", "warc_ts": None,
             "html": b"new content", "text": "", "lang": "en"},
        ]
        write_rows_parquet(dirs["in"] / "w0.parquet", rows)
        # prior snapshot kept an empty-payload page -> digest md5('')
        old = spark.createDataFrame(
            [("d41d8cd98f00b204e9800998ecf8427e",)], "digest string"
        )
        out_dir = str(tmp_path / "inc")
        q = stream_incremental_filter(
            spark, str(dirs["in"]), out_dir, dirs["ckpt"], old,
            m_bits=1 << 16,
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out_dir).collect()
        assert [r.url for r in got] == ["https://n.example.com/fresh"]
        assert all(r.digest is not None for r in got)
