"""Package-boundary budget: the reference CI-asserts its package imports
in under 2 s (reference tests/test_package.py:25).  Same bar here — a
heavy top-level import would silently tax EVERY Python worker spawn
(Spark forks a fresh interpreter per worker; ocr_spark is imported inside
each one to unpickle the UDFs)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _import_seconds() -> float:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import time; t0 = time.time(); import ocr_spark; "
            "print(time.time() - t0)",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return float(out.stdout.strip())


def test_import_time_budget():
    # best-of-2: this sandbox VM has 2x wall-clock noise between identical
    # runs (BENCH.md methodology); the budget is the reference's own bar
    assert min(_import_seconds(), _import_seconds()) < 2.0


def test_import_has_no_model_dependencies():
    """The model backend (pymupdf / yolo / surya) must stay behind its
    import guard: pulling it at package import would break every
    deployment without GPU wheels installed."""
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import ocr_spark, sys; "
            "bad = [m for m in ('fitz', 'doclayout_yolo', 'surya', 'torch')"
            " if m in sys.modules]; print(bad)",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    assert out.stdout.strip() == "[]"
