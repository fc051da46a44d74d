"""Deterministic dataset splits: train/val/test assignment by salted hash.

The standard large-corpus technique (public knowledge): never sample with
RNG state — a document's split must be a pure function of its id and a
salt, so splits are reproducible across runs, stable under corpus
appends (old docs never migrate), and consistent between unrelated jobs
reading the same table.  A pure projection: no shuffle, no RNG, no
driver state.

Hash modes follow the repo convention: ``xxhash64`` (JVM built-in) at
scale, ``portable`` (48-bit md5-prefix, hashing.py) when DuckDB-oracle
bit-parity is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hashing import portable_hash_col

BUCKETS = 1_000_000  # split granularity: 1e-6 resolution


def assign_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "v1",
    hash_mode: str = "xxhash64",
    out: str = "split",
) -> DataFrame:
    """Adds ``out`` ∈ weights.keys(), assigned by hash bucket.

    ``weights`` must sum to 1 (validated); label order follows dict
    insertion order, so the same weights dict always produces the same
    bucket ranges.  Changing ``salt`` re-deals every document; changing a
    weight moves only boundary buckets (nested splits: growing train from
    0.8 to 0.9 keeps every existing train doc in train)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bad = {k: w for k, w in weights.items() if not 0.0 <= w <= 1.0}
    if bad:
        raise ValueError(f"split weights must be in [0, 1]: {bad}")
    # NULL ids hash like the empty string (one deterministic bucket,
    # almost surely in the largest split) instead of NULL-propagating
    # through the when-chain into the LAST label — which would quietly
    # concentrate dirty rows in the smallest eval split
    salted = F.concat(
        F.lit(salt + ":"),
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
    )
    if hash_mode == "portable":
        h = portable_hash_col(salted)
    else:
        h = F.xxhash64(salted)
    bucket = F.pmod(h, F.lit(BUCKETS))
    expr = None
    edge = 0
    labels = list(weights)
    for label in labels[:-1]:
        edge += round(weights[label] * BUCKETS)
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    expr = (
        F.lit(labels[0])
        if expr is None
        else expr.otherwise(F.lit(labels[-1]))
    )
    return df.withColumn(out, expr)
