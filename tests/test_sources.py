"""Source surfaces: binaryFile directory ingest (S2) and observe metrics
(A5) — both must feed the same pipeline with identical extraction."""

from ocr_spark.fixtures import make_doc
from ocr_spark.oracle import extract_document
from ocr_spark.pipeline import extract
from ocr_spark.sources import read_pages_binaryfiles


class TestBinaryFileSource:
    def test_directory_of_payload_files(self, spark, tmp_path):
        d = tmp_path / "payloads"
        d.mkdir()
        docs = {}
        for k in range(6):
            r = make_doc(k)
            (d / f"doc{k:04d}.sgdoc").write_bytes(r["html"])
            docs[f"doc{k:04d}.sgdoc"] = r
        pages = read_pages_binaryfiles(spark, str(d), glob="*.sgdoc")
        out = extract(pages).collect()
        assert len(out) == 6
        for row in out:
            name = row.url.rsplit("/", 1)[-1]
            golden = extract_document(docs[name]["html"], "en")
            assert row.text == golden["text"]
            assert row.status == "COMPLETED"

    def test_glob_filter_prunes(self, spark, tmp_path):
        d = tmp_path / "mixed"
        d.mkdir()
        (d / "a.sgdoc").write_bytes(make_doc(1)["html"])
        (d / "b.other").write_bytes(b"not a payload")
        pages = read_pages_binaryfiles(spark, str(d), glob="*.sgdoc")
        assert pages.count() == 1


class TestObserveMetrics:
    def test_run_resumable_fills_observation(self, spark, pages_parquet, tmp_path):
        from ocr_spark.io import run_resumable
        from ocr_spark.pipeline import read_pages

        metrics: dict = {}
        n = run_resumable(
            read_pages(spark, pages_parquet),
            str(tmp_path / "out"),
            observe=metrics,
        )
        assert n == 60
        assert metrics["docs"] == 60
        assert metrics["pages"] > 60  # multi-page docs exist
        assert metrics["failed"] == 0
        assert 0 < metrics["ocr_pages"] < metrics["pages"]


class TestBackendSelection:
    # NB: `ocr_spark.extract` the ATTRIBUTE is the pipeline function
    # (package-root re-export); the subpackage must come via import_module.
    def test_default_is_heuristic(self):
        import importlib

        ex = importlib.import_module("ocr_spark.extract")
        ex._BACKEND = None  # reset the per-process cache
        be = ex.get_backend()
        assert be is ex.heuristic

    def test_model_backend_fails_loudly_without_deps(self, monkeypatch):
        import importlib

        ex = importlib.import_module("ocr_spark.extract")
        monkeypatch.setenv("OCR_SPARK_BACKEND", "model")
        monkeypatch.setattr(ex, "_BACKEND", None)
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="HeuristicExtractor"):
            ex.get_backend()
        monkeypatch.setattr(ex, "_BACKEND", None)  # leave cache clean
