"""Structured Streaming surface: incremental extraction over an arriving
pages table.

The reference's "streaming" is incremental progress + resumability
(NDJSON page stream, service.py:194-209 / remote.py:129-178 — S8/S9 in
SURVEY.md §2.1), not event-time processing; the faithful Spark shape is a
file-source stream feeding the SAME batch pipeline per micro-batch through
``foreachBatch``, with exactly-once progress owned by the checkpoint
directory plus the idempotent left-anti resume of io.py.  No watermarks or
stateful operators are needed — extraction is per-document pure.

On a real deployment the source is the Iceberg table's incremental scan
(`readStream.format("iceberg")`); offline it is a directory of parquet
files appearing over time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .io import pending_pages, write_extracted
from .pipeline import PipelineConfig, extract
from .schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream of pages rows (schema fixed: no inference race)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "32")
        .parquet(in_dir)
    )


def stream_extract(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally extract arriving pages into the checkpointed output.

    Exactly-once is layered: the stream checkpoint replays at-least-once on
    failure, and the micro-batch body re-applies the left-anti resume
    filter (io.pending_pages) so replays never double-append a url — the
    same idempotence contract as batch ``run_resumable``.
    """
    cfg = cfg or PipelineConfig()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # overlapping input files can land the same url twice in ONE batch;
        # without this the assembly groupBy would double the doc's pages
        # and commit the corruption as COMPLETED
        todo = pending_pages(batch_df.dropDuplicates(["url"]), out_path)
        extracted = extract(todo, cfg)
        write_extracted(extracted, out_path, mode="append")

    writer = (
        read_pages_stream(spark, in_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
