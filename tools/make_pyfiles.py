#!/usr/bin/env python
"""Build ocr_spark.zip for spark-submit --py-files (deterministic zip)."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "ocr_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "ocr_spark").rglob("*.py")):
            info = zipfile.ZipInfo(str(p.relative_to(REPO)))
            info.date_time = (2025, 1, 1, 0, 0, 0)  # reproducible archive
            z.writestr(info, p.read_bytes())
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
