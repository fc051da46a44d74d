"""Sequence packing for LM pretraining: the concat-and-chunk manifest.

The standard pretraining layout (GPT-style) concatenates every document's
tokens end-to-end in a deterministic order and cuts the stream into
fixed-length training sequences.  This operator computes the PACKING
MANIFEST as a pure DataFrame plan: one row per (chunk, document) overlap
with the token slice of the document that lands in that chunk.  The
tokenizer-export job joins the manifest back to the text and materializes
token ids; keeping the manifest relational means the expensive step
(tokenization) runs exactly once per document and the packing itself
never moves text.

Plan shape: ONE global running sum over the id order (Spark plans a
range-partitioned sort — distributed, not single-task) followed by a
per-row explode over the chunks the document touches.  All integer
arithmetic, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Manifest rows ``(chunk_id, id_col, doc_start, doc_end, n_tok)``:
    chunk ``k`` holds tokens ``[k*seq_len, (k+1)*seq_len)`` of the
    concatenated stream; ``doc_start:doc_end`` is the half-open
    whitespace-token slice of THIS document that lands in chunk ``k``.

    Deterministic: documents concatenate in ascending ``id_col`` order
    (a total order — append-stable as long as ids are assigned
    monotonically, the Common-Crawl norm).  Every document appears in at
    least one chunk; chunk boundaries split documents without dropping
    tokens (sum of slice widths == total tokens, property-tested)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = df.select(
        id_col, F.expr(f"size(split({text_col}, ' '))").alias("n_tok")
    )
    w = (
        Window.orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = toks.withColumn(
        "off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("bigint")
    )
    chunks = off.withColumn(
        "chunk_id",
        F.explode(
            F.expr(
                f"sequence(CAST(floor(off / {seq_len}) AS BIGINT), "
                f"CAST(floor((off + n_tok - 1) / {seq_len}) AS BIGINT))"
            )
        ),
    )
    return chunks.select(
        "chunk_id",
        id_col,
        F.expr(f"greatest(chunk_id * {seq_len} - off, 0L)").alias(
            "doc_start"
        ),
        F.expr(
            f"least((chunk_id + 1) * {seq_len} - off, CAST(n_tok AS BIGINT))"
        ).alias("doc_end"),
        F.col("n_tok").cast("int").alias("n_tok"),
    )
