"""Spark-parallel synthetic pages-table generation.

``fixtures.make_doc`` is a pure function of the doc index ``k`` (md5-seeded
per url — no global RNG), so generation distributes trivially: a range of
ks, mapInPandas, write parquet.  The same corpus is byte-identical however
many partitions generate it — the property the resumable pipeline and the
golden tests rely on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import fixtures
from .schemas import PAGES_SCHEMA


def pages_df(
    spark: SparkSession,
    n_docs: int,
    crawl_text: bool = False,
    partitions: int | None = None,
    kind: str = "pdf",
) -> DataFrame:
    """kind='pdf' → synthetic sgdoc payloads; kind='html' → real HTML bytes
    (fixtures.make_html_doc) exercising the boilerplate-strip path."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    maker = fixtures.make_html_doc if kind == "html" else fixtures.make_doc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                r = maker(int(k))
                r["text"] = (
                    fixtures.crawl_text_for(int(k), r["html"], r["lang"])
                    if crawl_text and kind == "pdf"
                    else ""
                )
                rows.append(r)
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    return (
        spark.range(0, n_docs)
        .repartition(parts)
        .mapInPandas(fn, PAGES_SCHEMA)
    )


def write_pages(
    spark: SparkSession,
    n_docs: int,
    out: str,
    crawl_text: bool = False,
    kind: str = "pdf",
) -> None:
    pages_df(spark, n_docs, crawl_text, kind=kind).write.mode(
        "overwrite"
    ).parquet(out)
