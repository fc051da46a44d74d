"""Hashed bag-of-words document embeddings (the feature-hashing trick).

The text→vector bridge: most of the similarity surface (cosine_pairs,
lsh_topk, ivf_topk, connected_components) consumes an ``array`` embedding
column, but a raw crawl ships no model embeddings and this container can
run no encoder.  Feature hashing (Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning") gives a deterministic,
model-free stand-in: token → hash bucket in [0, dim), bucket counts form
the vector, optionally L2-normalized — the SemDeDup-shaped semantic
near-dup pipeline (Abbas et al. 2023 use model embeddings; the plumbing
is identical) with zero inference.  A real deployment swaps
:func:`hashed_embedding` for an encoder UDF and every downstream
operator is unchanged.

Tokenization is the repo's shared whitespace convention
(``split(lower(coalesce(text,'')), ' ')`` — identical to operators/lm.py
and the quality gates), so empty/NULL text yields the single empty token
and NO document is ever silently dropped (the simhash explode NULL-row
lesson, r3 ADVICE).

Two physical strategies, bit-identical output (the simhash precedent):

- ``'hof'``: zero-shuffle higher-order-function fold — a pure projection.
  Each token is hashed exactly ONCE into a bound ``_buckets`` column;
  the count vector is an ``aggregate`` over it (arrays referenced only
  as fold INPUTS are safe against CollapseProject lambda inlining — the
  CLAUDE.md corollary).  Cost is O(n_tokens × dim) interpreted lane ops
  per document, so this is the small-``dim`` path.
- ``'explode'``: explode the bucket array → map-side-combined
  ``groupBy(id, bucket)`` count in WholeStageCodegen → rebuild the dense
  vector from a per-doc map.  Two exchanges, both token-count-independent
  after the map-side combine (≤ dim partial-count rows per doc per input
  partition, then ≤ dim entries per doc) — the large-``dim`` /
  long-document path.
- ``'auto'`` (default): ``explode`` when ``dim > 16``, else ``hof`` —
  the same flip point simhash measured for interpreted-lambda vs codegen
  cost.

Determinism / oracle parity: counts are exact small integers in float64,
the norm is a sequential index-order fold (same order in both strategies
and in DuckDB's ``list_reduce``; Spark's extra ``0.0`` init is exact
because ``0.0 + x == x``), and ``sqrt``/division are correctly rounded —
so the normalized vectors are bit-identical across partitionings,
strategies, and engines.  ``hash_mode`` follows the repo convention:
``xxhash64`` at scale, ``portable`` (48-bit md5 prefix) for the
DuckDB-oracle contract entries.

Scale posture at 10^12 docs: 'hof' is shuffle-free; 'explode' shuffles
one ≤ dim-entry count map per document.  Downstream near-dup stays
bucket-join-shaped (similarity.cosine_pairs) — nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import portable_hash_sql_spark

EMB_SALT = "emb:"  # hash-domain prefix: independent of splits/sample/minhash


def _bucket_expr(dim: int, hash_mode: str) -> str:
    """SQL lambda body hashing one token ``t`` into [0, dim)."""
    salted = f"concat('{EMB_SALT}', t)"
    if hash_mode == "portable":
        return f"pmod({portable_hash_sql_spark(salted)}, {dim})"
    return f"pmod(xxhash64({salted}), {dim})"


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    hash_mode: str = "xxhash64",
    normalize: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """``(id_col, n_tokens, norm, embedding: array<double>)`` per document.

    ``norm`` is the pre-normalization L2 norm (callers gate degenerate
    vectors on it; with this tokenizer a document always has ≥ 1 token,
    so ``norm = 0`` cannot occur, but the guard stays — a zero vector is
    returned unscaled rather than divided into NaNs).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if strategy == "auto":
        strategy = "explode" if dim > 16 else "hof"
    if strategy not in ("hof", "explode"):
        raise ValueError(f"unknown strategy {strategy!r}")

    text = f"coalesce({text_col}, '')"
    if lowercase:
        text = f"lower({text})"
    toks = df.select(
        id_col, F.expr(f"split({text}, ' ')").alias("_toks")
    ).select(
        id_col,
        F.expr("size(_toks)").alias("n_tokens"),
        # each token hashed exactly once; _toks/_buckets are referenced
        # only as transform/aggregate INPUTS (inline-safe)
        F.expr(
            f"transform(_toks, t -> {_bucket_expr(dim, hash_mode)})"
        ).alias("_buckets"),
    )

    if strategy == "hof":
        cnt = toks.select(
            id_col,
            "n_tokens",
            F.expr(
                f"aggregate(_buckets, array_repeat(0D, {dim}), "
                f"(acc, h) -> transform(acc, (v, i) -> "
                f"v + IF(i = h, 1D, 0D)))"
            ).alias("_cnt"),
        )
    else:
        # explode is row-safe here: the shared tokenizer never yields an
        # empty array (NULL/empty text → ['']), so no doc can vanish
        per_bucket = (
            toks.select(
                id_col, "n_tokens", F.explode("_buckets").alias("_b")
            )
            .groupBy(id_col, "n_tokens", "_b")
            .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        )
        cnt = (
            per_bucket.groupBy(id_col, "n_tokens")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("_b", "_c"))
                ).alias("_m")
            )
            .select(
                id_col,
                "n_tokens",
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    f"b -> coalesce(element_at(_m, CAST(b AS BIGINT)), 0D))"
                ).alias("_cnt"),
            )
        )

    normed = cnt.select(
        id_col,
        "n_tokens",
        "_cnt",
        F.expr(
            "sqrt(aggregate(_cnt, 0D, (a, v) -> a + v * v))"
        ).alias("norm"),
    )
    if normalize:
        vec = F.expr(
            "CASE WHEN norm = 0D THEN _cnt "
            "ELSE transform(_cnt, v -> v / norm) END"
        )
    else:
        vec = F.col("_cnt")
    return normed.select(id_col, "n_tokens", "norm", vec.alias("embedding"))


def semantic_near_dup(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    planes: int = 16,
    signs: list[list[int]] | None = None,
    hash_mode: str = "xxhash64",
    strategy: str = "auto",
    max_bucket: int | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Text in, near-dup pairs out: :func:`hashed_embedding` piped into
    the bucketed cosine-pair join (similarity.cosine_pairs) — the
    SemDeDup pipeline shape with the encoder swapped for feature hashing.
    Same opt-in ``max_bucket`` guard contract as every pair operator:
    None by default, and a passed cap must be audited via
    ``similarity.cosine_hot_buckets``.

    For the capped+audited pairing, share the expensive subtree instead
    of recomputing it per view: compute ``hashed_embedding`` once, run
    ``similarity.hyperplane_buckets`` over it, ``persist()`` that, and
    pass it here AND to ``cosine_hot_buckets`` via ``banded`` (the
    caller owns persist/unpersist — bloom-bitmap lifecycle contract).
    """
    from .similarity import cosine_pairs

    emb = hashed_embedding(
        df,
        dim=dim,
        text_col=text_col,
        id_col=id_col,
        hash_mode=hash_mode,
        strategy=strategy,
    ).select(id_col, "embedding")  # drop norm: cosine_pairs derives its own
    return cosine_pairs(
        emb,
        vec_col="embedding",
        id_col=id_col,
        threshold=threshold,
        planes=planes,
        signs=signs,
        max_bucket=max_bucket,
        banded=banded,
    )
