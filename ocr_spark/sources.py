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


def read_pages_warc_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    lang: str = "",
    batch_records: int = 256,
    chunk_bytes: int = 1 << 20,
) -> DataFrame:
    """``read_pages_warc`` with BOUNDED task memory: the listing (paths
    only — binaryFile prunes ``content``) fans out to executors, which
    OPEN each archive and stream records through
    ``warc.iter_warc_records_stream`` — peak memory per task is
    O(chunk + one record + one Arrow batch), not the fused reader's
    compressed + decompressed + parsed (~5× a 1 GiB crawl file).

    Same output schema and identical page rows as the fused reader, with
    ONE difference in the error lineage: page rows carry
    ``warc_errors=0`` and each file with a nonzero error count appends a
    single url='' sentinel row carrying the total (the count is only
    known once the file is exhausted, and repeating it on every row
    would mean buffering the file — the exact thing this reader exists
    to avoid).  ``max(warc_errors) GROUP BY warc_file`` — the audit the
    extraction job runs — is identical under both readers.

    Environment gate: executors open paths with ``open()``, so archives
    must be on a filesystem every executor mounts (local, NFS, fuse).
    For object stores without a mount, use ``read_pages_warc`` — the
    JVM's binaryFile source speaks s3a/hdfs natively.  Partition
    planning still happens on FILE SIZES (Spark plans binaryFile splits
    before column pruning), so ~1 GiB crawl files get one task each —
    the CC-convention layout read_pages_warc documents."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path")
    )
    fn = _warc_stream_fn(lang, batch_records, chunk_bytes)
    return raw.mapInPandas(fn, WARC_PAGES_SCHEMA)


def _warc_stream_fn(lang: str, batch_records: int, chunk_bytes: int):
    """The executor closure behind ``read_pages_warc_stream`` (module
    level so tests can drive the scheme gate directly)."""
    from typing import Iterator
    from urllib.parse import unquote, urlparse

    import pandas as pd

    from .warc import iter_pages, iter_warc_records_stream

    def _local(p: str) -> str:
        if p.startswith("file:"):
            return unquote(urlparse(p).path)
        if "://" in p:
            raise NotImplementedError(
                f"read_pages_warc_stream opens files with open(); "
                f"'{p.split('://', 1)[0]}://' paths need the fused "
                f"read_pages_warc (JVM-side binaryFile I/O) or a mount"
            )
        return p

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(rows: list) -> pd.DataFrame:
            cols = list(zip(*rows))
            return pd.DataFrame(
                {
                    "url": pd.Series(cols[0], dtype=object),
                    "warc_ts": pd.Series(cols[1], dtype=object),
                    "html": pd.Series(cols[2], dtype=object),
                    "text": pd.Series(cols[3], dtype=object),
                    "lang": pd.Series(cols[4], dtype=object),
                    "warc_file": pd.Series(cols[5], dtype=object),
                    "warc_errors": pd.Series(cols[6], dtype="int32"),
                }
            )

        for pdf in batches:
            for fpath in pdf["path"]:
                fpath = str(fpath)
                err = [0]
                rows: list = []
                with open(_local(fpath), "rb") as f:
                    for rec in iter_pages(
                        iter_warc_records_stream(f, chunk_bytes), err
                    ):
                        rows.append(
                            (rec["url"], rec["warc_ts"], rec["html"],
                             "", lang, fpath, 0)
                        )
                        if len(rows) >= batch_records:
                            yield flush(rows)
                            rows = []
                if err[0]:
                    rows.append(
                        ("", pd.NaT, b"", "", lang, fpath, err[0])
                    )
                if rows:
                    yield flush(rows)

    return fn


def read_pages_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog table (requires the runtime jars + catalog conf —
    session.iceberg_conf documents the spark-submit line)."""
    return spark.read.table(table)
