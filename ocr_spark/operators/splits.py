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


def _bucket(id_col: str, salt: str, hash_mode: str) -> F.Column:
    """Hash bucket in [0, BUCKETS) — pure function of (salt, id); NULL ids
    hash like the empty string (see assign_split's rationale)."""
    salted = F.concat(
        F.lit(salt + ":"),
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
    )
    h = portable_hash_col(salted) if hash_mode == "portable" else F.xxhash64(
        salted
    )
    return F.pmod(h, F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "v1",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Append-stable Bernoulli-by-hash sample: a document is kept iff its
    hash bucket falls below ``fraction`` — a pure projection-side filter
    (no RNG state, no shuffle; the deterministic twin of
    ``df.sample(fraction)``).  Stable under corpus appends (a doc's fate
    never changes), NESTED across fractions (a 1% sample is a subset of
    the 10% sample at the same salt — bucket ranges are prefixes), and
    re-dealable via ``salt``.

    The hash domain is PREFIXED with the operation name ("sample:"), so
    sampling is statistically independent of :func:`assign_split` at the
    same salt — without the prefix a 37% sample would occupy exactly the
    split function's LOW buckets, and a later train/val/test assignment
    over the sample would find its val/test ranges EMPTY (both are
    bucket-prefix filters over the same hash).  Pinned by
    tests/test_training_ops.py::TestDeterministicSampling."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    edge = round(fraction * BUCKETS)
    return df.filter(
        _bucket(id_col, f"sample:{salt}", hash_mode) < F.lit(edge)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
    hash_mode: str = "xxhash64",
    default_rate: float = 0.0,
) -> DataFrame:
    """Mixture construction: per-stratum keep rates (the deterministic,
    RNG-free twin of ``df.sampleBy``) — the training-mix step where each
    domain/source/language contributes a chosen fraction of its documents
    (the C4/Pile/Dolma "mixture weights" technique, made reproducible).
    Strata absent from ``rates`` keep ``default_rate`` of their docs.
    Pure projection-side filter; same append-stability and nesting
    guarantees as :func:`deterministic_sample`."""
    bad = {k: r for k, r in rates.items() if not 0.0 <= r <= 1.0}
    if bad:
        raise ValueError(f"rates must be in [0, 1]: {bad}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    edge = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == F.lit(stratum)
        lit = F.lit(round(rate * BUCKETS))
        edge = F.when(cond, lit) if edge is None else edge.when(cond, lit)
    edge = (
        F.lit(round(default_rate * BUCKETS))
        if edge is None
        else edge.otherwise(F.lit(round(default_rate * BUCKETS)))
    )
    # same operation-prefixed hash domain as deterministic_sample (and
    # nested/consistent with it: a stratum at rate r keeps exactly the
    # docs a plain sample at fraction r would)
    return df.filter(_bucket(id_col, f"sample:{salt}", hash_mode) < edge)


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
    bucket = _bucket(id_col, salt, hash_mode)
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
