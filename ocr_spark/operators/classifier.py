"""Supervised token log-odds quality classifier (the FineWeb-Edu gate shape).

FineWeb-Edu (Penedo et al. 2024) and DCLM (Li et al. 2024) rank crawl
documents with a trained quality classifier and keep the head — the
single highest-impact curation step both report.  Their fastText /
encoder models are not Spark-friendly dependencies (and not in this
container); the deterministic stand-in is a Laplace-smoothed multinomial
Naive Bayes over unigrams, which trains by PLAIN AGGREGATION and scores
by the same join + sorted-fold shape as the CCNet gate (operators/lm.py)
— swap the counts table for richer features and the pipeline is
unchanged.  Where lm.py is one-class (likeness to a reference corpus),
this is two-class: positives vs negatives, score = mean per-token
log-odds ``ln P(t|pos) − ln P(t|neg)`` — the linear text classifier in
its aggregation-trainable form.

Both halves are pure DataFrame plans:

- :func:`class_token_counts` — union the two labeled corpora, one
  explode + one map-side-combined conditional count; the shuffle carries
  distinct tokens, not occurrences.
- :func:`classifier_score` — one explode + one token equi-join + one
  per-document rebuild, identical plan shape (and Zipf-skew posture:
  AQE skew-join or ``broadcast_counts``) to lm.lm_score.

Determinism / oracle parity: with shared union-vocabulary ``V`` and
class totals ``Np``/``Nn``, a token with class counts ``(cp, cn)``
scores ``w = ln((cp+1)/(Np+V+1)) − ln((cn+1)/(Nn+V+1))``.  Every
operand is an exact integer < 2^53, division/subtraction are correctly
rounded, and the per-document sum is a sorted sequential fold, so
``mean_log_odds`` is reproducible bit-for-bit under any partitioning
WITHIN Spark.  Across engines the JVM's ``ln`` can differ from
glibc/DuckDB by 1 ulp (~5% of operands, measured — see lm.py), so the
oracle twin compares ``round(mean_log_odds, 9)``: the per-token 2-ulp
worst case absorbs to ~1e-16 in the mean, seven orders below the grain.
An out-of-vocab token (absent from BOTH classes) scores the constant
``ln((Nn+V+1)/(Np+V+1))`` via the same formula — no special case, no
dropped rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .lm import _tokens


def class_token_counts(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Train the classifier: ``(token, c_pos, c_neg)`` occurrence counts
    over the union vocabulary of the two labeled corpora (same
    whitespace tokenization :func:`classifier_score` applies)."""
    both = _tokens(pos, text_col, id_col, lowercase).select(
        "_tok", F.lit(1).alias("_lbl")
    ).unionByName(
        _tokens(neg, text_col, id_col, lowercase).select(
            "_tok", F.lit(0).alias("_lbl")
        )
    )
    return both.groupBy(F.col("_tok").alias("token")).agg(
        F.sum(F.col("_lbl")).cast("bigint").alias("c_pos"),
        F.sum(1 - F.col("_lbl")).cast("bigint").alias("c_neg"),
    )


def classifier_score(
    df: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    broadcast_counts: bool = False,
) -> DataFrame:
    """Score every document under the two-class model in ``counts``.

    Returns ``(id_col, n_tokens, n_oov, mean_log_odds)`` —
    ``mean_log_odds`` is the per-token average of
    ``ln P(t|pos) − ln P(t|neg)`` (positive = more positive-class-like;
    the FineWeb-Edu "head" is the top of this ranking, and length
    normalization keeps long documents from dominating).  ``n_oov``
    counts tokens absent from both training classes.  NULL text scores
    as ``''``.  The class priors are intentionally omitted: a constant
    offset cannot change the ranking, and the kept fraction (or
    threshold) is the calibration knob.
    """
    tok = _tokens(df, text_col, id_col, lowercase)
    vocab = counts.select(F.col("token").alias("_tok"), "c_pos", "c_neg")
    if broadcast_counts:
        vocab = F.broadcast(vocab)
    totals = counts.agg(
        F.coalesce(F.sum("c_pos"), F.lit(0)).cast("bigint").alias("_np"),
        F.coalesce(F.sum("c_neg"), F.lit(0)).cast("bigint").alias("_nn"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
    )
    joined = (
        tok.join(vocab, "_tok", "left")
        .join(F.broadcast(totals))
        .select(
            id_col,
            "pos",
            (
                F.log(
                    (F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(1))
                    / (F.col("_np") + F.col("_v") + F.lit(1))
                )
                - F.log(
                    (F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(1))
                    / (F.col("_nn") + F.col("_v") + F.lit(1))
                )
            ).alias("w"),
            (F.col("c_pos").isNull() & F.col("c_neg").isNull()).alias("oov"),
        )
    )
    agg = joined.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("pos", "w"))).alias("_ws"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("oov"), 1).otherwise(0)).alias("n_oov"),
    )
    mean = F.expr(
        "aggregate(_ws, CAST(0 AS DOUBLE), (a, s) -> a + s.w)"
    ) / F.col("n_tokens")
    return agg.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_oov").cast("int").alias("n_oov"),
        mean.alias("mean_log_odds"),
    )
