"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set.

The standard large-corpus technique (public knowledge — the n-gram
collision filtering described in the GPT-3 / PaLM / Llama training-data
appendices): shingle both sides into word n-grams (long n, e.g. 13, so
collisions imply real textual overlap, not shared stop-phrases), join on
the shingle, and flag a corpus document whose overlap with any benchmark
document crosses a threshold.

Spark shape at 100 TB:

- the BENCHMARK side is small (10³-10⁶ rows) → its exploded shingle table
  is broadcast; the corpus side therefore joins map-side with NO shuffle
  of corpus data;
- only MATCHED (corpus_doc, bench_doc, shingle) rows enter the count
  aggregate — for a clean corpus that is a trickle, so the one shuffle is
  proportional to contamination, not corpus size;
- corpus shingle counts ride the same pass (size(shingles) computed
  before explode — no second scan).

Reuses :func:`ocr_spark.operators.dedup.with_shingles` (distinct word
n-grams; split bound to a column — see CLAUDE.md on lambda inlining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import with_shingles


def shingle_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    min_common: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, common, doc_shingles, overlap_frac) for every
    corpus×benchmark pair sharing ≥ ``min_common`` word n-gram shingles.

    ``overlap_frac`` is the fraction of the CORPUS document's distinct
    shingles that also occur in the benchmark document — 1.0 means the
    training doc is fully contained in benchmark text."""
    c = with_shingles(corpus.select(id_col, text_col), text_col, n)
    c_sh = c.select(
        F.col(id_col),
        F.size("shingles").alias("doc_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    b = with_shingles(
        bench.select(F.col(bench_id_col), F.col(text_col)), text_col, n
    )
    b_sh = F.broadcast(
        b.select(F.col(bench_id_col), F.explode("shingles").alias("shingle"))
    )
    return (
        c_sh.join(b_sh, "shingle")
        .groupBy(id_col, bench_id_col)
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("doc_shingles").alias("doc_shingles"),
        )
        .filter(F.col("common") >= min_common)
        .withColumn(
            "overlap_frac", F.col("common") / F.col("doc_shingles")
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 13,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Corpus rows whose benchmark overlap stays BELOW ``threshold`` for
    every benchmark document (left-anti on the contaminated id set)."""
    contaminated = (
        shingle_overlap(
            corpus, bench, n, text_col, id_col, bench_id_col
        )
        .filter(F.col("overlap_frac") >= threshold)
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")
