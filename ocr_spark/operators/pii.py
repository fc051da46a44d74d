"""PII scrubbing: redact emails / IPv4 addresses / phone-like numbers from
a text column and count what was removed — the standard privacy pass of a
webtext training pipeline (public technique: regex redaction with typed
placeholder tokens, as in the C4 / Dolma / FineWeb processing descriptions).

Pure Spark SQL expressions (codegen'd regexp_replace / regexp_count; no
UDFs, no shuffle).  Patterns are lookaround-free so the identical regexes
run under Java regex (Spark) and RE2 (the DuckDB oracle) — same
cross-engine discipline as :mod:`ocr_spark.operators.urls`.

Replacement ORDER matters and is fixed: emails first (they contain
digits/dots that the looser patterns would chew), then IPv4, then phones;
each count is taken on the text as it stood when that class was scrubbed,
so counts always agree with what the output actually redacted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Shared pattern source (inlined into both engines by the contract).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# Grouped phone shapes only — optional +CC, then (area)/2-4-digit group,
# 3-digit group, 2-4-digit group with common separators.  A bare "9+
# digits with separators" pattern redacts ISO dates (2021-03-04),
# thousands-grouped numbers (1 000 000) and year lists — corpus
# corruption, verified in review.  Group lengths exclude those: dates
# split 4-2-2, year lists 4-4-4, neither fits 2..4 / 3 / 2..4 with the
# trailing \b.  Lookaround-free (RE2 has no lookbehind); the hyphen sits
# LAST and unescaped in classes (RE2 rejects the `\-` range form).
# Phone shapes must carry an unambiguous phone marker: a +country
# prefix, a parenthesized area code, or full 3-3-4 hyphenation.  Digit
# runs WITHOUT such a marker — unix epochs (1723880000), unhyphenated
# ISBN-10s, account ids, space/dot-grouped figures (10 000 000,
# 12.345.678) — are prose, not phones: a bare \b\d{9,11}\b alternative
# (removed after review) redacted exactly those and corrupted numeric
# text across a webtext corpus.  Under-redaction of exotic formats
# beats shredding numbers the pipeline is supposed to preserve.
PHONE_RE = (
    r"(?:\+\d{1,3}[ .-]?(?:\(\d{1,4}\)|\d{2,4})[ .-]?\d{3}[ .-]?\d{2,4}"
    r"|\(\d{1,4}\)[ .-]?\d{3}[ .-]?\d{2,4}"
    r"|\b\d{3}-\d{3}-\d{4})\b"
)

EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Adds ``out_col`` (redacted text) and per-class removal counts
    (``n_emails``, ``n_ips``, ``n_phones``).

    Patterns ride as Column literals (F.lit) — a SQL string literal would
    eat the backslash classes (the CLAUDE.md regex trap)."""
    email, ipv4, phone = F.lit(EMAIL_RE), F.lit(IPV4_RE), F.lit(PHONE_RE)
    # NULL text coalesces to '' (repo-wide NULL-row policy): regexp_*
    # would otherwise emit NULL counts and a NULL clean_text, and the
    # derived pii_drop would become a NULL predicate that silently drops
    # the document in any downstream filter
    t0 = F.coalesce(F.col(text_col), F.lit(""))
    t1 = F.regexp_replace(t0, email, F.lit(EMAIL_TOKEN))
    t2 = F.regexp_replace(t1, ipv4, F.lit(IP_TOKEN))
    t3 = F.regexp_replace(t2, phone, F.lit(PHONE_TOKEN))
    return df.select(
        "*",
        F.regexp_count(t0, email).alias("n_emails"),
        F.regexp_count(t1, ipv4).alias("n_ips"),
        F.regexp_count(t2, phone).alias("n_phones"),
        t3.alias(out_col),
    )


def pii_document_flags(
    df: DataFrame, text_col: str = "text", max_hits: int = 5
) -> DataFrame:
    """Adds ``pii_hits`` (total redactions) and ``pii_drop`` — documents
    that are effectively contact-info listings (hits over ``max_hits``)
    get dropped rather than scrubbed in most pipeline policies."""
    scrubbed = scrub_pii(df, text_col)
    return scrubbed.withColumn(
        "pii_hits",
        F.col("n_emails") + F.col("n_ips") + F.col("n_phones"),
    ).withColumn("pii_drop", F.col("pii_hits") > max_hits)
