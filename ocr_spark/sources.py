"""Pages-table sources (SURVEY.md §2.1 S1-S3).

Three ways the input table reaches the engine, all yielding the same
(url, warc_ts, html, text, lang) shape:

- ``read_pages_parquet``    — parquet dir/file (offline; Iceberg-layout
  compatible partitioning handled in io.py).
- ``read_pages_binaryfiles``— Spark's built-in ``binaryFile`` source over a
  directory of raw payload files (S2: the open-from-path flow,
  document.py:537-541); path → url, modificationTime → warc_ts.
- ``read_pages_iceberg``    — catalog table for the real deployment (S3:
  the object-store flow; the Iceberg connector owns s3a access, no
  explicit S3 operator — SURVEY.md §2.1).
- ``read_pages_warc``       — directory of ``.warc(.gz)`` crawl archives
  (the Common Crawl wire format; stdlib parser in ocr_spark/warc.py),
  one file = one task, torn records counted in the ``warc_errors``
  lineage column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_pages_binaryfiles(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    lang: str = "en",
) -> DataFrame:
    """Directory of raw payload files → pages rows.

    ``binaryFile`` gives (path, modificationTime, length, content); the
    scan supports pathGlobFilter pushdown and never reads file bytes for
    pruned files."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(lang).alias("lang"),
    )


WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "warc_file string, warc_errors int"
)


def read_pages_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    lang: str = "",
) -> DataFrame:
    """Directory of .warc(.gz) files → pages rows (the Common Crawl
    ingest format, parsed by ``ocr_spark.warc`` — stdlib only).

    Emits the input-table shape plus two lineage columns: ``warc_file``
    (provenance) and ``warc_errors`` (the file's torn/malformed record
    count, repeated on each of its rows — a crawl file with a torn tail
    is routine and must be visible, never silent; a file that is ALL
    errors yields one url='' sentinel row carrying the count).

    Partitioning: one file = one task (the CC convention — ~1 GiB
    .warc.gz each, ~64k files per crawl, so a 1000-executor cluster has
    64 waves of work from the LISTING alone; intra-file parallelism
    would buy nothing and cost gzip-member indexing).  The whole file
    crosses into Python once, Arrow-batched; bodies go straight into the
    ``html`` binary column the extraction pipeline scans."""
    from typing import Iterator

    import pandas as pd

    from .warc import extract_pages

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "url": [], "warc_ts": [], "html": [],
                "text": [], "lang": [], "warc_file": [], "warc_errors": [],
            }
            for fpath, content in zip(pdf["path"], pdf["content"]):
                pages, errors = extract_pages(bytes(content))
                for rec in pages:
                    out["url"].append(rec["url"])
                    out["warc_ts"].append(rec["warc_ts"])
                    out["html"].append(rec["html"])
                    out["text"].append("")
                    out["lang"].append(lang)
                    out["warc_file"].append(str(fpath))
                    out["warc_errors"].append(errors)
                if not pages and errors:
                    out["url"].append("")
                    out["warc_ts"].append(pd.NaT)  # keeps dtype datetime
                    out["html"].append(b"")
                    out["text"].append("")
                    out["lang"].append(lang)
                    out["warc_file"].append(str(fpath))
                    out["warc_errors"].append(errors)
            # explicit dtypes: an all-empty batch must not default every
            # column to float64 (Arrow can't cast double→timestamp)
            yield pd.DataFrame(
                {
                    k: pd.Series(v, dtype="int32" if k == "warc_errors"
                                 else object)
                    for k, v in out.items()
                }
            )

    return raw.mapInPandas(fn, WARC_PAGES_SCHEMA)


def read_pages_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog table (requires the runtime jars + catalog conf —
    session.iceberg_conf documents the spark-submit line)."""
    return spark.read.table(table)
