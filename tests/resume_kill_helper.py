#!/usr/bin/env python
"""Subprocess driver for the kill-mid-write resume test (SURVEY.md §5.3
at bench scale — r3 VERDICT "Next round" #6).

Runs OUTSIDE the pytest JVM so the test can SIGKILL the whole process
group mid-write (driver + local-mode executors die together, exactly
like a cluster losing its driver) without touching the test session.

Modes::

    crashrun <pages> <out>   phase 1: extract the xxhash64-even half of
                             the corpus (commits normally), print
                             PHASE1_DONE, then start a full-corpus
                             resumable pass — the caller kills us during
                             that write.
    resume   <pages> <out>   one full resumable pass over the crashed
                             checkpoint, then a timed no-op pass; print
                             one JSON line {"attempted": .., "noop_sec": ..}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    mode, pages_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    from pyspark.sql import functions as F

    from ocr_spark.io import run_resumable
    from ocr_spark.pipeline import read_pages
    from ocr_spark.session import get_spark

    spark = get_spark(f"resume-{mode}", cores=8)
    pages = read_pages(spark, pages_path)
    if mode == "crashrun":
        half = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        run_resumable(half, out)
        print("PHASE1_DONE", flush=True)
        run_resumable(pages, out)  # the caller kills us in here
        print("PHASE2_DONE", flush=True)
    else:
        attempted = run_resumable(pages, out)
        t0 = time.time()
        noop_attempted = run_resumable(pages, out)
        noop_sec = time.time() - t0
        assert noop_attempted == 0
        print(
            json.dumps(
                {"attempted": attempted, "noop_sec": round(noop_sec, 2)}
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
