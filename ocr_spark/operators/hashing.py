"""Deterministic hashing helpers shared by dedup/similarity/fingerprint ops.

Two hash families:

- ``xxhash64`` (Spark built-in, JVM-side) — the scale path.
- ``portable`` — first 12 hex chars of md5 as a 48-bit bigint, computable
  bit-identically in Spark (``conv(substr(md5(s),1,12),16,10)``) and in
  DuckDB (unrolled hex-digit decode) — used by the driver-oracle parity
  queries.  48 bits keeps ``a*H + b`` inside int64 for LCG permutations.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERSENNE = 2147483647  # 2^31-1, LCG modulus for minhash permutations

# Fixed permutation parameters (deterministic; no RNG at plan time).
MINHASH_A = [1103, 12289, 331, 7577, 2053, 9341, 577, 4099]
MINHASH_B = [12345, 293, 9929, 101, 6151, 771, 3371, 991]


def portable_hash_sql_spark(expr: str) -> str:
    """Spark SQL: 48-bit bigint from md5 hex prefix."""
    return f"CAST(conv(substr(md5({expr}), 1, 12), 16, 10) AS BIGINT)"


def hex_slice_decode_duckdb(h: str, start: int = 1, length: int = 12) -> str:
    """DuckDB SQL: big-endian integer from a hex-digest slice (1-based
    start) via unrolled digit decode — mirrors Python
    ``int(h[start-1:start-1+length], 16)``."""
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {start + i}, 1)) - 1) * "
        f"{16 ** (length - 1 - i)}"
        for i in range(length)
    ]
    return "(" + " + ".join(terms) + ")"


def portable_hash_sql_duckdb(expr: str) -> str:
    """DuckDB SQL: same 48-bit value via unrolled hex-digit decode."""
    return hex_slice_decode_duckdb(f"md5({expr})", 1, 12)


def portable_hash_col(col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("bigint")


def xxhash_col(col: Column) -> Column:
    return F.xxhash64(col)
