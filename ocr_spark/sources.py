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


def read_pages_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog table (requires the runtime jars + catalog conf —
    session.iceberg_conf documents the spark-submit line)."""
    return spark.read.table(table)
