"""Bloom-filter incremental dedup — dedupe a NEW crawl snapshot against an
EXISTING kept corpus without a full anti-join of the old side per run.

Crawl pipelines re-run monthly: snapshot N+1 must drop documents whose
content was already kept from snapshots 1..N.  A digest anti-join is
correct but shuffles BOTH sides every month.  The bloom path splits the
work into a cheap membership pre-filter and a tiny exact verify:

1. :func:`bloom_bitmap` — fold the old corpus's content digests into an
   ``m``-bit bloom filter, represented as a DataFrame of
   ``(word BIGINT, mask BIGINT)`` with at most ``ceil(m/63)`` rows.  The
   old corpus is SCANNED once (text column only — at ingest time you
   would persist the digest column and scan just that); ``bit_or`` has a
   map-side partial, so each input partition ships at most one partial
   mask per word — the shuffle is O(words × partitions) masks, never
   O(rows).
2. :func:`bloom_flag` — mark each new document ``maybe_seen`` when all
   ``k`` of its bloom bits are set.  Implemented as ``k`` BROADCAST
   joins against the mask table keyed by word — the new snapshot never
   shuffles; the plan is Exchange-free on the new side
   (tests/test_bloom.py pins this).
3. :func:`incremental_dedup` — only ``maybe_seen`` rows (the true dups
   plus the ~``(1-e^{-kn/m})^k`` false-positive sliver) reach the exact
   digest anti-join; everything else passes through untouched.  Bloom
   filters have NO false negatives, so the result is EXACTLY the
   anti-join's — the oracle twin for the end-to-end operator is the
   plain ``NOT IN (SELECT digest FROM old)`` query, independent of
   ``m``/``k``; a second oracle pins the bitmap bit arithmetic itself.

Scale regimes (the honest version): the broadcast bitmap covers an old
corpus up to ~10^9 documents (m = 2^33 bits ≈ 1 GiB of masks at ~10
bits/doc, 1% fp) — the "dedupe a raw 10^12-page crawl against the
curated reference corpus" shape, where the pre-filter removes the
anti-join's shuffle for >99% of new rows.  Beyond that, store the old
digests bucketed by digest and let the verify anti-join run
shuffle-free on the old side; the bloom still cuts the NEW side's
shuffle to candidates only.

Word layout uses 63 bits per word (shifts 0..62): bit 63 of a signed
64-bit integer cannot be produced portably (DuckDB raises on
``1::BIGINT << 63``), and 63-bit words keep every mask non-negative so
``(mask >> bit) & 1`` needs no sign reasoning in either engine.

NULL text is treated as ``''`` throughout (hashing AND verify digest,
both engines) — the simhash r3 lesson: NULL must not silently change
row cardinality between code paths.

No reference-repo counterpart (the reference is a single-node OCR
service); this is part of the training-data-pipeline surface the brief
adds on top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import (
    MERSENNE,
    MINHASH_A,
    MINHASH_B,
    portable_hash_sql_duckdb,
    portable_hash_sql_spark,
)

WORD_BITS = 63  # see module docstring: portable signed-64 bit layout

DEFAULT_M_BITS = 1 << 22  # ~420k docs at k=4 under ~1% fp; override at scale
DEFAULT_K = 4


def digest_expr(text_col: str) -> str:
    """The canonical content digest every bloom stage keys on — md5 of
    coalesce(text,'') as a hex string.  A persisted digest STORE (see
    :func:`ocr_spark.io.write_digest_store`) holds exactly this value,
    so raw-text corpora and digest stores are interchangeable as the
    old side."""
    return f"md5(coalesce({text_col}, ''))"


def _h_expr_spark(digest: str, mode: str) -> str:
    """Non-negative 64-bit hash of the canonical DIGEST (not the raw
    text) as a Spark SQL expr — so a stored digest column reproduces
    the same bloom positions as the original text."""
    if mode == "portable":
        return portable_hash_sql_spark(digest)  # 48-bit, non-negative
    return f"pmod(xxhash64({digest}), {MERSENNE})"


def _digest_of(text_col: str, digest_col: str | None) -> str:
    return digest_col if digest_col is not None else digest_expr(text_col)


def _position_exprs(h: str, k: int, m_bits: int) -> list[str]:
    """The k bloom positions of a non-negative hash ``h`` — the minhash
    LCG family reused (a_j·h + b_j mod p), folded onto the bit space.
    Identical arithmetic is emitted for DuckDB by :func:`oracle_bitmap_sql`."""
    if k > len(MINHASH_A):
        raise ValueError(f"k={k} exceeds the {len(MINHASH_A)} fixed perms")
    return [
        f"((({MINHASH_A[j]} * {h} + {MINHASH_B[j]}) % {MERSENNE}) % {m_bits})"
        for j in range(k)
    ]


def bloom_bitmap(
    df: DataFrame,
    text_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_mode: str = "xxhash64",
    digest_col: str | None = None,
) -> DataFrame:
    """(word, mask) rows of the old corpus's bloom filter — only nonempty
    words appear.  One explode (k rows/doc) + one map-side-combined
    ``bit_or`` groupBy; the shuffle carries masks, not documents.
    Pass ``digest_col`` to build from a persisted digest store instead
    of raw text (identical output by construction)."""
    pos = ", ".join(_position_exprs("_blh", k, m_bits))
    dig = _digest_of(text_col, digest_col)
    return (
        df.select(F.expr(_h_expr_spark(dig, hash_mode)).alias("_blh"))
        .select(F.expr(f"explode(array({pos}))").alias("pos"))
        .select(
            F.expr(f"pos DIV {WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {WORD_BITS} AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("_bit").alias("mask"))
    )


def bloom_flag(
    df: DataFrame,
    bitmap: DataFrame,
    text_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_mode: str = "xxhash64",
    flag_col: str = "maybe_seen",
    digest_col: str | None = None,
) -> DataFrame:
    """``df`` + a ``maybe_seen`` flag: true iff ALL k bloom bits are set.

    k broadcast hash joins on the word id — the new snapshot's rows never
    move (no Exchange on the probe side; plan-pinned).  A word absent
    from the bitmap means no bit in it is set (left join + coalesce(0)),
    so an EMPTY old corpus flags nothing.

    The hash is bound to a real column ONCE (`_blh`) before the position
    exprs reference it — k positions and k bit probes each mention the
    hash, and an inlined md5 would be re-evaluated at every mention
    (the CLAUDE.md bind-before-reuse rule, applied to scalars).

    Broadcast duplication, measured honestly: Spark does not reuse the
    k BroadcastExchanges even when the bitmap is persisted (the per-join
    word/mask renames defeat canonical plan equality — 4 separate
    broadcasts of the same cached rows).  The BUILD is shared via the
    persist; the broadcast PAYLOAD is k × the mask table.  At the large-m
    end of the regime (≥ 2^30 bits), lower k and/or write the bitmap to
    parquet so executors read it instead of receiving k broadcasts."""
    hcol = "_blh"
    while hcol in df.columns:
        hcol += "_"
    out = df.withColumn(
        hcol, F.expr(_h_expr_spark(_digest_of(text_col, digest_col), hash_mode))
    )
    positions = _position_exprs(hcol, k, m_bits)
    hits = []
    for j, p in enumerate(positions):
        w, m = f"_blw{j}", f"_blm{j}"
        out = out.withColumn(w, F.expr(f"({p}) DIV {WORD_BITS}"))
        out = out.join(
            F.broadcast(
                bitmap.select(F.col("word").alias(w), F.col("mask").alias(m))
            ),
            on=w,
            how="left",
        )
        hits.append(
            f"(shiftright(coalesce({m}, CAST(0 AS BIGINT)), "
            f"CAST(({p}) % {WORD_BITS} AS INT)) & 1) = 1"
        )
        out = out.drop(w)
    flag = " AND ".join(hits)
    return out.withColumn(flag_col, F.expr(flag)).drop(
        hcol, *[f"_blm{j}" for j in range(k)]
    )


def incremental_dedup(
    new_df: DataFrame,
    old_df: DataFrame,
    text_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_mode: str = "xxhash64",
    old_digest_col: str | None = None,
) -> DataFrame:
    """Rows of ``new_df`` whose content digest does NOT appear in
    ``old_df`` — the cross-snapshot dedup step (intra-snapshot dedup is
    :func:`ocr_spark.operators.dedup.exact_dedup`'s job, run separately).

    ``old_df`` may be the raw kept corpus (``text_col``) or a persisted
    DIGEST STORE (pass ``old_digest_col``; see
    :func:`ocr_spark.io.write_digest_store`).  With a store BUCKETED on
    the digest, the verify anti-join reads the store's buckets in place
    — no shuffle on the old side, and only the candidate sliver of the
    new side shuffles.

    = bloom pre-filter + exact verify of the candidates; exactly
    equivalent to the full digest anti-join for every ``m``/``k``
    (no false negatives), which is what the oracle twin checks.

    The bitmap is persisted before the flag joins: ``bloom_flag`` probes
    it through k broadcast joins whose build subtrees Spark does NOT
    reuse-merge (measured: 4 identical aggregations, 4 scans of the old
    corpus without the persist).  With the persist the old corpus is
    scanned once; the k broadcasts then replay the cached masks.  In a
    recurring production job, write the bitmap to parquet instead and
    pass it to :func:`bloom_flag` directly — it is the monthly artifact."""
    bitmap = bloom_bitmap(
        old_df, text_col, m_bits, k, hash_mode, digest_col=old_digest_col
    ).persist()
    flagged = bloom_flag(
        new_df,
        bitmap,
        text_col,
        m_bits,
        k,
        hash_mode,
        flag_col="_maybe",
    )
    old_dig = _digest_of(text_col, old_digest_col)
    passed = flagged.filter(~F.col("_maybe")).drop("_maybe")
    survivors = (
        flagged.filter(F.col("_maybe"))
        .withColumn("_dig", F.expr(digest_expr(text_col)))
        .join(
            old_df.select(F.expr(old_dig).alias("_dig")),
            on="_dig",
            how="left_anti",
        )
        .drop("_dig", "_maybe")
    )
    return passed.unionByName(survivors)


# ---------------------------------------------------------------------------
# DuckDB oracle twins (driver-contract parity)


def oracle_bitmap_sql(
    old_sql: str, text_col: str, m_bits: int, k: int
) -> str:
    """DuckDB SQL computing the identical (word, mask) bitmap for
    ``hash_mode='portable'`` — pins the digest → hash → LCG → shift
    arithmetic cross-engine bit-for-bit."""
    h = portable_hash_sql_duckdb(f"md5(coalesce({text_col}, ''))")
    pos = ", ".join(
        f"((({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MERSENNE}) % {m_bits})"
        for j in range(k)
    )
    return f"""
WITH old AS ({old_sql}),
h AS (SELECT {h} AS h FROM old),
p AS (SELECT unnest([{pos}]) AS pos FROM h)
SELECT pos // {WORD_BITS} AS word,
       bit_or(CAST(1 AS BIGINT) << CAST(pos % {WORD_BITS} AS INT)) AS mask
FROM p GROUP BY 1
"""
