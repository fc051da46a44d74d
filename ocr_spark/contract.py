"""Driver-contract query pairs: SURVEY.md §2 operators over the driver's
testdata tables, each as (Spark plan, DuckDB oracle SQL).

Two families:

1. **Extraction-semantic analogues** (``ext_*``) — the reference's geometry
   / predicate / assembly operators (J1-J5, A1-A4, O1-O2, P1-P5, F3/F7 in
   SURVEY.md §2) re-expressed over the driver's TPC-H-ish tables, with box
   coordinates derived arithmetically from integer keys so both engines see
   identical inputs.  The *real* pipeline applies the same kernels to the
   pages table via ``ocr_spark.pipeline``; these SQL twins are the
   driver-checkable projection of those semantics (SURVEY.md §7.1 step 7).
2. **Training-data operators** (``dedup_*``, ``sim_*``, ``text_*``,
   ``mm_*``) — the library operators from ``ocr_spark.operators`` run in
   their *portable-hash* mode so DuckDB reproduces them bit-identically.

Column names and types are aligned pairwise: every computed column is
aliased the same in Spark and SQL; DuckDB BIGINT-by-default aggregates are
cast to match Spark's output types.

Non-SQL-expressible entries (payload parse → extraction) are exposed in
``queries()`` without an oracle — the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import bloom, dedup, multimodal, similarity, text_analysis, urls
from .operators.hashing import (
    MERSENNE,
    MINHASH_A,
    MINHASH_B,
    hex_slice_decode_duckdb as _hex_decode_duck_slice,
    portable_hash_sql_duckdb,
)

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _hex_decode_duck(h: str, start: int, length: int) -> str:
    """Alias of hashing.hex_slice_decode_duckdb (single implementation)."""
    return _hex_decode_duck_slice(h, start, length)


# Derived geometry (shared arithmetic, valid in both dialects): layout
# "blocks" from part keys, text "lines" from supplier keys.  The overlap
# kernel below is the SQL projection of utils.py:48-91 (J1) with the
# min-area denominator used by consolidation (document.py:72).
_BLOCK_BOX = """
  SELECT p_partkey AS block_id,
         CAST(p_partkey % 13 AS DOUBLE) * 30.0 AS bx1,
         CAST(p_partkey % 17 AS DOUBLE) * 40.0 AS by1,
         CAST(p_partkey % 13 AS DOUBLE) * 30.0 + 100.0 AS bx2,
         CAST(p_partkey % 17 AS DOUBLE) * 40.0 + 60.0 AS by2
  FROM part
"""
_LINE_BOX = """
  SELECT s_suppkey AS line_id,
         CAST(s_suppkey % 11 AS DOUBLE) * 35.0 AS lx1,
         CAST(s_suppkey % 19 AS DOUBLE) * 35.0 AS ly1,
         CAST(s_suppkey % 11 AS DOUBLE) * 35.0 + 90.0 AS lx2,
         CAST(s_suppkey % 19 AS DOUBLE) * 35.0 + 14.0 AS ly2
  FROM supplier
"""
_INTER = (
    "greatest(0.0, least(bx2, lx2) - greatest(bx1, lx1)) * "
    "greatest(0.0, least(by2, ly2) - greatest(by1, ly1))"
)

_OVERLAP_SQL = f"""
WITH blocks AS ({_BLOCK_BOX}), lines AS ({_LINE_BOX})
SELECT block_id, line_id,
       round({_INTER} /
             least((bx2 - bx1) * (by2 - by1), (lx2 - lx1) * (ly2 - ly1)),
             6) AS overlap_pct
FROM blocks CROSS JOIN lines
WHERE {_INTER} > 0.0
"""

_COVERAGE_SQL = f"""
WITH blocks AS ({_BLOCK_BOX}), lines AS ({_LINE_BOX}),
ov AS (
  SELECT block_id,
         {_INTER} / ((bx2 - bx1) * (by2 - by1)) AS pct
  FROM blocks CROSS JOIN lines
  WHERE {_INTER} > 0.0
)
SELECT b.block_id,
       round(least(coalesce(sum(ov.pct), 0.0), 1.0), 6) AS covered,
       least(coalesce(sum(ov.pct), 0.0), 1.0) < 0.5 AS needs_ocr
FROM blocks b LEFT JOIN ov ON b.block_id = ov.block_id
GROUP BY b.block_id
"""

_BBOX_UNION_SQL = """
SELECT l_orderkey,
       min(CAST(l_partkey % 50 AS DOUBLE) * 10.0) AS ux1,
       min(CAST(l_suppkey % 40 AS DOUBLE) * 12.0) AS uy1,
       max(CAST(l_partkey % 50 AS DOUBLE) * 10.0 + 80.0) AS ux2,
       max(CAST(l_suppkey % 40 AS DOUBLE) * 12.0 + 16.0) AS uy2
FROM lineitem
GROUP BY l_orderkey
"""

_BLOCK_SORT_SQL = """
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY value, event_id) AS INTEGER) AS block_i
FROM events
"""

_SCALAR_SQL = """
SELECT event_id,
       concat_ws('-', user_id, event_id) AS line_id,
       CAST(floor(value) AS BIGINT) * (72e0 / 200e0) AS pt_scaled
FROM events
"""

# S7 — the 4500-px raster safety cap (document.py:407-416): pages whose
# width/height at the document dpi exceed the cap re-render at 72 dpi.
# Analogue: page dims derived from lineitem prices.
_RASTER_CAP_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN (l_extendedprice / 40.0) * 200.0 / 72.0 > 4500.0
              OR (l_quantity * 30.0) * 200.0 / 72.0 > 4500.0
            THEN 72 ELSE 200 END AS eff_dpi
FROM lineitem
"""

# P3 court-heading pattern (document.py:630-634); `\\d`/`\\w`/`\\s` mean the
# same in Java regex (Spark RLIKE) and RE2 (DuckDB regexp_matches).
_HEADING_RE = r"(?i)^.{0,50}ase \d+[-:]\d+[-\w]+.{1,200}\s+Page \d+ of \d+"


def _run_shared_sql(tables: list[str], sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            _t(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return fn


# ---------------------------------------------------------------------------
# ext_* — Spark sides that are not shared-dialect


def _q_ignore_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4/P5 postprocess predicates (document.py:625-642) over text."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").rlike(_HEADING_RE).alias("is_heading"),
        # \z (end-of-input) not $: Java's $ matches before a trailing
        # newline, RE2's does not — \z means the same in both
        F.trim("text").rlike(r"^[0-9]+\z").alias("digits_only"),
        (~F.expr("exists(split(text, ' '), w -> length(w) > 4)")).alias(
            "all_short"
        ),
    ).withColumn(
        "final_type",
        F.when(
            F.col("is_heading") | F.col("digits_only") | F.col("all_short"),
            F.lit("ignore"),
        ).otherwise(F.lit("text")),
    )


_IGNORE_SQL = f"""
SELECT doc_id,
       regexp_matches(text, '{_HEADING_RE}') AS is_heading,
       regexp_matches(trim(text), '^[0-9]+\\z') AS digits_only,
       len(list_filter(string_split(text, ' '), w -> length(w) > 4)) = 0
         AS all_short,
       CASE WHEN regexp_matches(text, '{_HEADING_RE}')
              OR regexp_matches(trim(text), '^[0-9]+\\z')
              OR len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 4)) = 0
            THEN 'ignore' ELSE 'text' END AS final_type
FROM documents
"""


def _q_text_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 hierarchical text assembly: index-ordered concat with '\\n\\n'
    (document.py:389) — order restored by key, never by arrival."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(doc_id, text))), s -> s.text), '\\n\\n')"
        ).alias("assembled"),
        F.count(F.lit(1)).alias("n_docs"),
    )


_ASSEMBLY_SQL = """
SELECT source,
       string_agg(text, e'\\n\\n' ORDER BY doc_id) AS assembled,
       count(*) AS n_docs
FROM documents
GROUP BY source
"""


def _q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-from-checkpoint anti-join (io.py pending_pages / S6):
    customers ≅ pages, 'F'-status orders ≅ the COMPLETED checkpoint set;
    the anti-join yields the still-pending work."""
    cust = _t(spark, sf_dir, "customer")
    done = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return cust.join(
        done, cust.c_custkey == done.o_custkey, "left_anti"
    ).select("c_custkey")


_RESUME_SQL = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
"""


def _q_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 count-by-status health rollup (service.py:262-276)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_STATUS_SQL = """
SELECT o_orderstatus AS status, count(*) AS n FROM orders GROUP BY 1
"""


def _q_empty_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 whitespace-only line filter (ocr.py:94)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.trim("text") != "")
        .select("doc_id")
    )


_EMPTY_SQL = "SELECT doc_id FROM documents WHERE trim(text) <> ''"


# ---------------------------------------------------------------------------
# dedup_* / text_* — DuckDB twins of the portable-hash library operators

_WORDS_CTE = "SELECT doc_id, string_split(text, ' ') AS w FROM documents"


def _shingle_cte(n: int) -> str:
    # w words → w-n+1 shingles (inclusive upper bound len-n); short docs →
    # empty list → unnest yields no rows.  Mirrors dedup.with_shingles.
    return f"""
SELECT doc_id,
       unnest(list_distinct(list_transform(
         CASE WHEN len(w) >= {n} THEN generate_series(0, len(w) - {n})
              ELSE [] END,
         i -> array_to_string(list_slice(w, i + 1, i + {n}), ' ')))) AS shingle
FROM words
"""


_PH = portable_hash_sql_duckdb("shingle")

_MINHASH_COLS = ",\n  ".join(
    f"min(({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {MERSENNE}) AS mh{j}"
    for j in range(8)
)

_MINHASH_CTE = f"""
words AS ({_WORDS_CTE}),
sh AS ({_shingle_cte(3)}),
h AS (SELECT doc_id, {_PH} AS h FROM sh),
sig AS (SELECT doc_id, {_MINHASH_COLS} FROM h GROUP BY doc_id)
"""

_MINHASH_SQL = f"WITH {_MINHASH_CTE} SELECT * FROM sig"

_LSH_PAIRS_CTE = f"""
{_MINHASH_CTE},
bands AS (
  SELECT doc_id, 0 AS band, concat_ws('_', mh0, mh1) AS key FROM sig
  UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
  UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig
  UNION ALL SELECT doc_id, 3, concat_ws('_', mh6, mh7) FROM sig),
prs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
"""

_LSH_SQL = f"WITH {_LSH_PAIRS_CTE} SELECT doc_a, doc_b FROM prs"

# Connected components of the LSH pair graph: the oracle computes the
# full transitive closure with a recursive CTE (fine at oracle scale;
# the Spark operator is iterative min-label propagation instead —
# closure materialization is quadratic per component and would not
# scale).  cluster_id = min doc id of the component on both engines.
_REACH_CTE = """
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION SELECT doc_b, doc_a FROM prs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
"""

_CLUSTERS_SQL = f"""
WITH RECURSIVE {_LSH_PAIRS_CTE},
{_REACH_CTE}
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
"""

_CLUSTER_CORPUS_SQL = f"""
WITH RECURSIVE {_LSH_PAIRS_CTE},
{_REACH_CTE}
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (
  SELECT src FROM reach GROUP BY src HAVING least(src, min(dst)) <> src)
"""

# Scored-representative cluster dedup (dedup_by_clusters(score_col=…)):
# the same recursive-CTE closure, but the kept member of each component
# is the one with the most characters (FineWeb-style "keep the longest
# capture"), ties to min id.  Ordering key (isnull, -n_chars AS DOUBLE,
# doc_id) is integer-derived and unique, so winner choice is
# engine-exact; the Spark side is one window min over the same struct.
_CLUSTER_BEST_SQL = f"""
WITH RECURSIVE {_LSH_PAIRS_CTE},
{_REACH_CTE},
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src),
member AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars
  FROM comp c JOIN documents d USING (doc_id)),
win AS (
  SELECT cluster_id, doc_id AS winner FROM (
    SELECT cluster_id, doc_id,
      row_number() OVER (PARTITION BY cluster_id
        ORDER BY CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END ASC,
                 coalesce(-CAST(n_chars AS DOUBLE), 0e0) ASC,
                 doc_id ASC) AS rk
    FROM member) WHERE rk = 1),
losers AS (
  SELECT m.doc_id FROM member m
  JOIN win w ON m.cluster_id = w.cluster_id AND m.doc_id <> w.winner)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
"""


_JACCARD_SQL = f"""
WITH words AS ({_WORDS_CTE}),
sh AS ({_shingle_cte(2)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, common,
       common / (sa.sz + sb.sz - common) AS jaccard
FROM co
JOIN sizes sa ON co.doc_a = sa.doc_id
JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE common / (sa.sz + sb.sz - common) >= 0.15
"""

# Stop-shingle-capped variant (max_posting=25): postings over the cap are
# dropped before the self-join, doc sizes still count them — Jaccard
# becomes the documented conservative under-estimate.  sf0.01 has 632
# shingles over this cap, so the capped measure genuinely differs from
# dedup_jaccard and the driver verifies the stop-list path end-to-end.
_JACCARD_CAPPED_SQL = f"""
WITH words AS ({_WORDS_CTE}),
sh AS ({_shingle_cte(2)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
shf AS (SELECT * FROM sh WHERE shingle NOT IN
        (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 25)),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, common,
       common / (sa.sz + sb.sz - common) AS jaccard
FROM co
JOIN sizes sa ON co.doc_a = sa.doc_id
JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE common / (sa.sz + sb.sz - common) >= 0.15
"""

_PH_T = portable_hash_sql_duckdb("t")

def _simhash_expr(bits: int = 16) -> str:
    return f"""
CAST(list_aggregate(list_transform(generate_series(0, {bits - 1}), j ->
  CASE WHEN list_aggregate(list_transform(string_split(text, ' '), t ->
    CASE WHEN (({_PH_T} >> j) & 1) = 1 THEN 1 ELSE -1 END), 'sum') > 0
  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT)
"""


_SIMHASH_EXPR = _simhash_expr(16)

_SIMHASH_SQL = f"SELECT doc_id, {_SIMHASH_EXPR} AS simhash FROM documents"

# The codegen explode strategy (the corpus-scale path for bits > 16) must
# produce the same signatures as the hof fold — checked against a fresh
# 32-bit oracle so the strategy itself is driver-verified, not just
# pytest-verified.
_SIMHASH32_SQL = (
    f"SELECT doc_id, {_simhash_expr(32)} AS simhash FROM documents"
)

# 4 bands of 4 bits (max_hamming=3 → pigeonhole-exact recall; mirrors
# dedup.simhash_near_dup_pairs banding)
_SIMHASH_PAIRS_SQL = f"""
WITH sig AS (SELECT doc_id, {_SIMHASH_EXPR} AS simhash FROM documents),
buck AS (
  SELECT doc_id, simhash, 0 AS band, simhash & 15 AS key FROM sig
  UNION ALL SELECT doc_id, simhash, 1, (simhash >> 4) & 15 FROM sig
  UNION ALL SELECT doc_id, simhash, 2, (simhash >> 8) & 15 FROM sig
  UNION ALL SELECT doc_id, simhash, 3, (simhash >> 12) & 15 FROM sig),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         xor(a.simhash, b.simhash) AS x
  FROM buck a JOIN buck b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT DISTINCT doc_a, doc_b, CAST(bit_count(x) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(x) <= 3
"""

_FINGERPRINT_SQL = f"""
WITH words AS ({_WORDS_CTE}),
sh AS ({_shingle_cte(3)})
SELECT doc_id, min({_PH}) AS fp_min, max({_PH}) AS fp_max,
       CAST(count(*) AS INTEGER) AS fp_size
FROM sh GROUP BY doc_id
"""


def _q_dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized dedup: keep only each group's representative row —
    the operation a training-data pipeline actually runs (group shuffle on
    the 16-byte digest, then a semi-join back to the corpus)."""
    docs = _t(spark, sf_dir, "documents")
    reps = dedup.exact_dedup(
        docs.select(F.expr("substr(text, 1, 16)").alias("norm"), "doc_id"),
        text_col="norm",
    ).select(F.col("representative").alias("doc_id"))
    return docs.join(reps, "doc_id", "left_semi").select("doc_id", "n_chars")


_DEDUP_FILTER_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents
  GROUP BY md5(coalesce(substr(text, 1, 16), '')))
"""


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gate: language + composite quality + length band —
    the canonical webtext training-data filter, end to end.  Both engines
    filter on the 6-dp-rounded score so the threshold compare is exact."""
    docs = _t(spark, sf_dir, "documents")
    scored = text_analysis.quality_score(
        text_analysis.language_id(docs)
    ).withColumn("quality_r", F.round("quality", 6))
    return (
        scored.filter(
            (F.col("lang_pred") == "en")
            & (F.col("quality_r") >= 0.5)
            & (F.col("n_words").between(20, 95))
        )
        .select("doc_id", "lang_pred", "quality_r")
    )


def _quality_filter_sql() -> str:
    return f"""
WITH lang AS ({_lang_sql().strip()}),
q AS ({_quality_sql().strip()})
SELECT q.doc_id, lang.lang_pred, q.quality_r
FROM q JOIN lang ON q.doc_id = lang.doc_id
WHERE lang.lang_pred = 'en' AND q.quality_r >= 0.5
  AND q.n_words BETWEEN 20 AND 95
"""


# Synthetic URLs whose differences live ONLY in stripped components
# (tracking params, fragment, mixed-case host, default port) — canonical
# forms collapse doc_id%50 groups together.
_URL_EXPR_SPARK = (
    "concat('HTTPS://Example.COM:443/path/', CAST(doc_id % 50 AS STRING), "
    "'/?utm_source=src', CAST(doc_id AS STRING), '&q=7&fbclid=x', "
    "'#frag', CAST(doc_id AS STRING))"
)
_URL_EXPR_DUCK = (
    "('HTTPS://Example.COM:443/path/' || (doc_id % 50) || "
    "'/?utm_source=src' || doc_id || '&q=7&fbclid=x' || "
    "'#frag' || doc_id)"
)


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_EXPR_SPARK).alias("url")
    )
    return urls.url_dedup(docs, url_col="url", id_col="doc_id")


_URL_DEDUP_SQL = f"""
WITH u AS (SELECT doc_id, {_URL_EXPR_DUCK} AS url FROM documents)
SELECT {urls.canonicalize_sql_duckdb('url')} AS canonical_url,
       min(doc_id) AS representative, count(*) AS n_copies
FROM u GROUP BY 1
"""


def _q_latest_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl revisit dedup: newest capture per canonical url.  The synth
    url expr groups ~50 docs per canonical; ts derives from doc_id with
    identical BIGINT arithmetic on both engines, with in-group ts
    collisions so the (ts, doc_id) tie-break is exercised."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_URL_EXPR_SPARK).alias("url"),
        F.expr("(doc_id * 48271) % 86400").alias("ts"),
    )
    return urls.latest_capture(docs, url_col="url", ts_col="ts", id_col="doc_id")


_LATEST_CAPTURE_SQL = f"""
WITH u AS (SELECT doc_id, {_URL_EXPR_DUCK} AS url,
                  (doc_id * 48271) % 86400 AS ts FROM documents),
c AS (SELECT *, {urls.canonicalize_sql_duckdb('url')} AS canonical_url FROM u),
r AS (SELECT *,
             row_number() OVER (PARTITION BY canonical_url
                                ORDER BY ts DESC, doc_id DESC) AS rn,
             count(*) OVER (PARTITION BY canonical_url) AS n_captures
      FROM c)
SELECT canonical_url, n_captures, doc_id, url, ts FROM r WHERE rn = 1
"""

_BLOOM_M, _BLOOM_K = 1 << 16, 4


def _q_bloom_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (word, mask) bloom bitmap of the 'old snapshot' third of the
    corpus — pins the portable hash → LCG position → 63-bit-word shift
    arithmetic bit-for-bit across engines."""
    old = (
        _t(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 0")
        .select(F.expr("substr(text, 1, 16)").alias("norm"))
    )
    return bloom.bloom_bitmap(
        old, text_col="norm", m_bits=_BLOOM_M, k=_BLOOM_K,
        hash_mode="portable",
    )


_BLOOM_BITMAP_SQL = bloom.oracle_bitmap_sql(
    "SELECT substr(text, 1, 16) AS norm FROM documents WHERE doc_id % 3 = 0",
    "norm",
    _BLOOM_M,
    _BLOOM_K,
)


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup: new-third docs whose norm digest is absent
    from the old third.  Runs the xxhash64 scale path — the bloom is an
    exact pre-filter (no false negatives, candidates verified), so the
    oracle is the plain anti-join regardless of m/k/hash."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr("substr(text, 1, 16)").alias("norm")
    )
    return bloom.incremental_dedup(
        docs.filter("doc_id % 3 != 0"),
        docs.filter("doc_id % 3 = 0"),
        text_col="norm",
        m_bits=1 << 18,
        k=4,
    )


_INCREMENTAL_SQL = """
WITH d AS (SELECT doc_id, substr(text, 1, 16) AS norm FROM documents)
SELECT doc_id, norm FROM d
WHERE doc_id % 3 != 0
  AND md5(coalesce(norm, '')) NOT IN
      (SELECT md5(coalesce(norm, '')) FROM d WHERE doc_id % 3 = 0)
"""


def _q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning.  The synthetic text has no newlines or
    punctuation, so line structure is synthesized identically on both
    engines: ' a ' → '.'+newline makes multi-line docs whose lines end
    terminally except the last (removed), with short lines exercising
    the min-words rule."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("replace(text, ' a ', '.' || chr(10))").alias("text"),
    )
    return text_analysis.c4_line_filter(docs).select(
        "doc_id", "clean_text", "c4_lines_removed"
    )


_C4_LINE_SQL = """
WITH d AS (SELECT doc_id,
                  replace(text, ' a ', '.' || chr(10)) AS text
           FROM documents),
b AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM d),
k AS (SELECT doc_id, ls,
             list_filter(ls, l -> regexp_matches(l, '[.!?"]\\s*\\z')
               AND len(string_split(l, ' ')) >= 3
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM b)
-- coalesce is load-bearing: DuckDB array_to_string([]) is NULL while
-- Spark array_join([]) is '' (engine-parity trap, found by this entry)
SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       CAST(len(ls) - len(kept) AS INTEGER) AS c4_lines_removed
FROM k
"""

_BLOCKED_WORDS = ["slow", "vector"]


def _q_word_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.blocked_words_filter(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        _BLOCKED_WORDS,
        keep_flag=True,
    ).select("doc_id", "has_blocked_word")


# DuckDB regexp_replace is per-first-match unless the 'g' flag is passed
# (Spark's is global by default) — the flag is load-bearing.
_WORD_BLOCKLIST_SQL = f"""
SELECT doc_id,
       len(list_intersect(
         string_split(regexp_replace(lower(coalesce(text, '')),
                                     '[^a-z0-9 ]', ' ', 'g'), ' '),
         [{", ".join(f"'{w}'" for w in _BLOCKED_WORDS)}])) > 0
         AS has_blocked_word
FROM documents
"""


def _q_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot NEAR-dup: new-third docs with no MinHash band-key
    collision against the old third (portable hash mode so the oracle
    computes the identical signatures; band semantics as _LSH_PAIRS_CTE)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    kept = dedup.incremental_near_dedup(
        docs.filter("doc_id % 3 != 0"),
        docs.filter("doc_id % 3 = 0"),
        hash_mode="portable",
    )
    return kept.select("doc_id")


_INCREMENTAL_NEAR_SQL = f"""
WITH {_MINHASH_CTE},
bands AS (
  SELECT doc_id, 0 AS band, concat_ws('_', mh0, mh1) AS key FROM sig
  UNION ALL SELECT doc_id, 1, concat_ws('_', mh2, mh3) FROM sig
  UNION ALL SELECT doc_id, 2, concat_ws('_', mh4, mh5) FROM sig
  UNION ALL SELECT doc_id, 3, concat_ws('_', mh6, mh7) FROM sig),
matched AS (
  SELECT DISTINCT n.doc_id FROM bands n JOIN bands o
    ON n.band = o.band AND n.key = o.key
  WHERE n.doc_id % 3 != 0 AND o.doc_id % 3 = 0)
SELECT doc_id FROM documents
WHERE doc_id % 3 != 0 AND doc_id NOT IN (SELECT doc_id FROM matched)
"""


# TF-IDF keyword extraction: top-3 corpus-distinctive tokens per doc.
# score = tf * (ln((n_docs+1)/(df+1)) + 1) — ln is not cross-engine
# bit-identical (CLAUDE.md transcendental rule), so both sides emit
# round(score, 9); the rank window's tie-break (score DESC, token ASC)
# is deterministic because equal scores arise exactly from equal
# (tf, df) pairs, which both engines order identically.
_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, t.token
  FROM documents, unnest(string_split(lower(coalesce(text, '')), ' '))
       AS t(token)
  WHERE t.token <> ''),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc
        FROM tf GROUP BY token),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.token, tf.tf,
        tf.tf * (ln((nd.n + 1) / (dfq.dfc + 1)) + 1) AS score
      FROM tf JOIN dfq USING (token) CROSS JOIN nd),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
      FROM s)
SELECT doc_id, token, tf, round(score, 9) AS score,
       CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 3
"""


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import tfidf_keywords

    return tfidf_keywords(
        _t(spark, sf_dir, "documents"), k=3
    ).withColumn("score", F.round("score", 9))


# Corpus n-gram boilerplate report (text_analysis.ngram_report): all
# positional word trigrams, two stacked aggregations (per-(gram, doc)
# counts, then totals + doc frequency), deterministic top-k on
# (occurrences DESC, ngram ASC).  All-integer outputs — engine-exact.
_NGRAM_REPORT_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           CASE WHEN len(w) >= 3 THEN generate_series(0, len(w) - 3)
                ELSE [] END,
           i -> array_to_string(list_slice(w, i + 1, i + 3), ' '))) AS ngram
  FROM words),
perdoc AS (SELECT ngram, doc_id, count(*) AS c FROM grams
           GROUP BY ngram, doc_id),
tot AS (SELECT ngram, CAST(sum(c) AS BIGINT) AS n_occurrences,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM perdoc GROUP BY ngram HAVING count(*) >= 2)
SELECT ngram, n_occurrences, n_docs FROM tot
ORDER BY n_occurrences DESC, ngram ASC LIMIT 50
"""


def _q_ngram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.ngram_report(
        _t(spark, sf_dir, "documents"), n=3, top_k=50, min_docs=2
    )


# Gate-threshold calibration quantiles: exact linear-interpolated
# (rank = p*(n-1), the quantile_cont convention both engines implement);
# interpolation divides doubles → round(value, 9) on both sides.
_QUANTILE_SQL = """
WITH f AS (SELECT CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
                  CAST(len(string_split(coalesce(text, ''), ' '))
                       AS BIGINT) AS n_words
           FROM documents),
q AS (SELECT 'n_chars' AS metric,
             unnest([1e-1, 5e-1, 9e-1]) AS p,
             unnest(quantile_cont(n_chars, [1e-1, 5e-1, 9e-1])) AS v
      FROM f
      UNION ALL
      SELECT 'n_words',
             unnest([1e-1, 5e-1, 9e-1]),
             unnest(quantile_cont(n_words, [1e-1, 5e-1, 9e-1]))
      FROM f)
SELECT metric, p, round(v, 9) AS value FROM q
"""


def _q_quantile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text_analysis import quantile_report

    feats = _t(spark, sf_dir, "documents").select(
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("bigint")
        .alias("n_chars"),
        F.expr("size(split(coalesce(text, ''), ' '))")
        .cast("bigint")
        .alias("n_words"),
    )
    return quantile_report(
        feats, ["n_chars", "n_words"], probs=(0.1, 0.5, 0.9)
    ).withColumn("value", F.round("value", 9))


def _q_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.corpus_gate_report(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _gate_report_sql() -> str:
    """Composes the per-gate oracle CTE bodies on doc_id and aggregates
    the same integer/boolean conditions the Spark report counts."""
    return f"""
WITH g AS ({_GOPHER_SQL}),
c AS ({_C4_SQL}),
l AS ({_lang_sql()})
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g.g_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gopher_keep,
       CAST(sum(CASE WHEN c.c4_n_sentences >= 3 AND NOT c.c4_has_curly
                      AND NOT c.c4_has_lorem AND c.c4_n_stop8 >= 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_keep,
       CAST(sum(CASE WHEN c.c4_has_curly THEN 1 ELSE 0 END) AS BIGINT)
         AS n_has_curly,
       CAST(sum(CASE WHEN c.c4_has_lorem THEN 1 ELSE 0 END) AS BIGINT)
         AS n_has_lorem,
       CAST(sum(CASE WHEN c.c4_n_stop8 >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stopword_pass,
       CAST(sum(CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_en,
       CAST(sum(CASE WHEN g.g_keep AND c.c4_n_sentences >= 3
                      AND NOT c.c4_has_curly AND NOT c.c4_has_lorem
                      AND c.c4_n_stop8 >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_all_gates
FROM g JOIN c USING (doc_id) JOIN l USING (doc_id)
"""


_CHUNK_SZ, _CHUNK_ST = 32, 24


def _q_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.packing import chunk_text

    return chunk_text(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        size=_CHUNK_SZ,
        stride=_CHUNK_ST,
    )


_CHUNK_SQL = f"""
WITH b AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk,
                  CASE WHEN coalesce(text, '') = '' THEN 0
                       ELSE len(string_split(coalesce(text, ''), ' ')) END AS n
           FROM documents),
c AS (SELECT doc_id,
             list_transform(
               generate_series(0,
                 (CASE WHEN n <= {_CHUNK_SZ} THEN 1
                       ELSE 1 + CAST(ceil((n - {_CHUNK_SZ}) / {_CHUNK_ST}e0)
                                     AS INT) END) - 1),
               j -> array_to_string(
                 list_slice(tk, j * {_CHUNK_ST} + 1,
                            j * {_CHUNK_ST} + {_CHUNK_SZ}), ' ')) AS chunks
      FROM b WHERE n > 0),
u AS (SELECT doc_id,
             unnest(generate_series(0, len(chunks) - 1)) AS chunk_i,
             unnest(chunks) AS chunk_text
      FROM c)
SELECT doc_id, CAST(chunk_i AS INTEGER) AS chunk_i, chunk_text,
       CAST(len(string_split(chunk_text, ' ')) AS INTEGER) AS n_chunk_tok
FROM u
"""


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a normalized key (first 16 chars) so the testdata
    actually produces duplicate groups; digest shuffle, never the text."""
    docs = _t(spark, sf_dir, "documents").select(
        F.expr("substr(text, 1, 16)").alias("norm"), "doc_id"
    )
    return dedup.exact_dedup(docs, text_col="norm")


_EXACT_DEDUP_SQL = """
SELECT md5(coalesce(substr(text, 1, 16), '')) AS digest,
       min(doc_id) AS representative, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, num_perm=8,
        hash_mode="portable",
    )


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, num_perm=8,
        hash_mode="portable",
    )
    return dedup.lsh_candidate_pairs(sigs, "doc_id", num_perm=8, bands=4)


def _lsh_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, num_perm=8,
        hash_mode="portable",
    )
    return dedup.lsh_candidate_pairs(sigs, "doc_id", num_perm=8, bands=4)


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.connected_components(_lsh_pairs_portable(spark, sf_dir))


def _q_cluster_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_by_clusters(
        _t(spark, sf_dir, "documents"),
        _lsh_pairs_portable(spark, sf_dir),
    ).select("doc_id", "n_chars")


def _q_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_by_clusters(
        _t(spark, sf_dir, "documents"),
        _lsh_pairs_portable(spark, sf_dir),
        score_col="n_chars",
    ).select("doc_id", "n_chars")


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=2, threshold=0.15
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(
        _t(spark, sf_dir, "documents"), "text", "doc_id", bits=16,
        hash_mode="portable",
    )


def _q_simhash_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(
        _t(spark, sf_dir, "documents"), "text", "doc_id", bits=32,
        hash_mode="portable", strategy="explode",
    )


def _q_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=2,
        threshold=0.15, max_posting=25,
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", bits=16,
        max_hamming=3, hash_mode="portable",
    )


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.fingerprint(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3,
        hash_mode="portable",
    )


# ---------------------------------------------------------------------------
# sim_* — cosine / LSH similarity with DuckDB twins

_DOT = (
    "list_aggregate(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')"
)


def _cos_duck(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


_COS_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_duck('e.embedding', 'q.qvec')} AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= 10
"""

_PLANES, _DIM = 16, 64
_SIGNS = similarity.plane_signs(_PLANES, _DIM)
_W_LIT = (
    "["
    + ", ".join(
        "[" + ", ".join(f"{s}" for s in row) + "]" for row in _SIGNS
    )
    + "]"
)

# The sign matrix lives in a one-row CTE (``wm``) so DuckDB materializes the
# 16×64 literal once instead of re-constructing it per lambda invocation.
_SIG_EXPR = f"""
CAST(list_aggregate(list_transform(generate_series(1, {_PLANES}), j ->
  CASE WHEN list_aggregate(list_transform(generate_series(1, {_DIM}),
    i -> embedding[i]::DOUBLE * W[j][i]), 'sum') > 0
  THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE CAST(0 AS BIGINT) END),
  'sum') AS BIGINT)
"""

_W_CTE = f"wm AS (SELECT {_W_LIT} AS W)"

_LSH_TOPK_SQL = f"""
WITH {_W_CTE},
sig AS (SELECT vec_id, embedding, {_SIG_EXPR} AS sig
        FROM embeddings CROSS JOIN wm),
banded AS (
  SELECT vec_id, embedding, 0 AS band, sig & 255 AS key FROM sig
  UNION ALL SELECT vec_id, embedding, 1, sig >> 8 FROM sig),
qb AS (SELECT vec_id AS q_id, embedding AS qvec, band, key
       FROM banded WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT q.q_id, b.vec_id AS c_id, b.embedding AS cvec, q.qvec
  FROM banded b JOIN qb q ON b.band = q.band AND b.key = q.key
  WHERE b.vec_id <> q.q_id),
scored AS (SELECT q_id, c_id, {_cos_duck('cvec', 'qvec')} AS cos FROM cand)
SELECT q_id AS query_id, c_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos DESC, c_id ASC) AS rank FROM scored)
WHERE rank <= 10
"""

_NEAR_DUP_SQL = f"""
WITH {_W_CTE},
sig AS (SELECT vec_id, embedding, {_SIG_EXPR} AS sig
        FROM embeddings CROSS JOIN wm),
banded AS (
  SELECT vec_id, embedding, 0 AS band, sig & 255 AS key FROM sig
  UNION ALL SELECT vec_id, embedding, 1, sig >> 8 FROM sig),
pairs AS (
  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b,
         a.embedding AS va, b.embedding AS vb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT doc_a, doc_b, round(cos, 6) AS cos_r
FROM (SELECT doc_a, doc_b, {_cos_duck('va', 'vb')} AS cos FROM pairs)
WHERE cos >= 0.2
"""


_IVF_SQL = f"""
WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
               FROM embeddings ORDER BY vec_id LIMIT 8),
corpus_cells AS (
  SELECT vec_id AS c_id, embedding AS c_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
query_cells AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5)
  WHERE crank <= 2),
cand AS (
  SELECT DISTINCT q.q_id, cc.c_id, cc.c_vec, q.q_vec
  FROM corpus_cells cc JOIN query_cells q ON cc.cell = q.cell
  WHERE cc.c_id <> q.q_id),
scored AS (SELECT q_id, c_id, {_cos_duck('c_vec', 'q_vec')} AS cos FROM cand)
SELECT q_id AS query_id, c_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos DESC, c_id ASC) AS rank FROM scored)
WHERE rank <= 10
"""


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=8, n_probe=2
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


# int8-quantized exact top-k: quantization uses floor(x+0.5) (round()'s
# tie rule differs between the engines: HALF_UP vs HALF_EVEN), so every
# int matches bit-for-bit; dots are then exact integer arithmetic and
# the one double division at the end is deterministic.
_QUANT_CTE = """
qv AS (SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS s
       FROM embeddings),
qz AS (SELECT vec_id,
         CASE WHEN s > 0 THEN list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / s * 127.0 + 0.5)
                     AS INTEGER))
         ELSE list_transform(embedding, x -> 0) END AS q
       FROM qv)
"""


def _dot_int_duck(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> CAST(z[1] AS BIGINT) * z[2])) AS DOUBLE)"
    )


_QUANT_TOPK_SQL = f"""
WITH {_QUANT_CTE},
qs AS (SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id < 5),
scored AS (
  SELECT qs.query_id, c.vec_id AS neighbor_id,
    {_dot_int_duck('c.q', 'qs.qq')} /
    (sqrt({_dot_int_duck('c.q', 'c.q')}) *
     sqrt({_dot_int_duck('qs.qq', 'qs.qq')})) AS cos
  FROM qz c CROSS JOIN qs WHERE c.vec_id <> qs.query_id)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= 10
"""


def _q_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.cosine_topk_quantized(
        emb, emb.filter(F.col("vec_id") < 5), k=10
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


def _q_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall ledger: lsh/ivf/quantized/pq recall@10 against
    brute-force ground truth in one report.  recall/min_recall are
    divisions of exact integer counts (order-independent sums), so they
    are bit-identical cross-engine with no rounding (the round(·,9)
    policy is only for transcendentals); the pq branch's top-k membership
    carries the same last-ulp ADC-cos ordering evidence class as the
    green sim_pq_topk rank column (same codebooks: ksub=8 seed)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_recall_report(
        emb, emb.filter(F.col("vec_id") < 5), k=10, signs=_SIGNS,
        methods=("lsh", "ivf", "quantized", "pq"),
        pq_m=_PQ_M, pq_ksub=_PQ_KSUB, pq_iters=0,
    )


# Product-quantization ADC top-k (similarity.train_pq_codebooks /
# pq_encode / pq_topk), SEED codebooks (iters=0) so the oracle derives
# the same centroids in SQL: subspace j's codebook = the 8 lowest-id
# vectors' j-th subvectors.  Encode = argmax(dot − 0.5·|c|²) per
# (vector, subspace) with lowest-cid ties (window mirror of the argmax
# struct); ip/rnorm fold the per-subspace values in j order
# (list_reduce over a j-ordered list == Spark's 0-seeded fold);
# cos rounded to 6 (the ANN-family convention — absorbs the
# list_aggregate-vs-fold last-ulp association slack the other rows
# already carry).

_PQ_M, _PQ_KSUB, _PQ_DSUB = 8, 8, 8  # dim 64 → 8 subspaces of 8


def _q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    books = similarity.train_pq_codebooks(
        emb, m=_PQ_M, ksub=_PQ_KSUB, iters=0
    )
    codes = similarity.pq_encode(emb, books)
    res = similarity.pq_topk(
        codes, emb.filter(F.col("vec_id") < 5), books, k=10
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


def _pq_dot(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


# Shared CTE chain ending at pq_scored — _PQ_SQL takes its top-10, the
# recall ledger (_RECALL_REPORT_SQL) takes its top-10 ids as the 'pq'
# method branch.
_PQ_CTE = f"""
seeds AS (SELECT vec_id, embedding FROM embeddings
               ORDER BY vec_id LIMIT {_PQ_KSUB}),
cents AS (SELECT sj.j,
            row_number() OVER (PARTITION BY sj.j ORDER BY s.vec_id) - 1
              AS cid,
            s.embedding[sj.j * {_PQ_DSUB} + 1 : sj.j * {_PQ_DSUB} + {_PQ_DSUB}]
              AS cvec
          FROM seeds s CROSS JOIN range({_PQ_M}) sj(j)),
sub AS (SELECT e.vec_id, sj.j,
          e.embedding[sj.j * {_PQ_DSUB} + 1 : sj.j * {_PQ_DSUB} + {_PQ_DSUB}]
            AS sv
        FROM embeddings e CROSS JOIN range({_PQ_M}) sj(j)),
enc AS (SELECT vec_id, j, cid, nsq FROM (
          SELECT sub.vec_id, sub.j, c.cid,
            {_pq_dot('sub.sv', 'c.cvec')} - 0.5 * {_pq_dot('c.cvec', 'c.cvec')}
              AS score,
            {_pq_dot('c.cvec', 'c.cvec')} AS nsq,
            row_number() OVER (PARTITION BY sub.vec_id, sub.j
                               ORDER BY {_pq_dot('sub.sv', 'c.cvec')}
                                 - 0.5 * {_pq_dot('c.cvec', 'c.cvec')} DESC,
                               c.cid ASC) AS rk
          FROM sub JOIN cents c ON c.j = sub.j)
        WHERE rk = 1),
rn AS (SELECT vec_id AS c_id,
              sqrt(list_reduce(list(nsq ORDER BY j), (a, b) -> a + b))
                AS rnorm
       FROM enc GROUP BY vec_id),
qn AS (SELECT vec_id AS q_id,
              sqrt({_pq_dot('embedding', 'embedding')}) AS qnorm
       FROM embeddings WHERE vec_id < 5),
ipx AS (SELECT qs.vec_id AS q_id, enc.vec_id AS c_id,
          list_reduce(list({_pq_dot('qs.sv', 'c.cvec')} ORDER BY enc.j),
                      (a, b) -> a + b) AS ip
        FROM enc
        JOIN cents c ON c.j = enc.j AND c.cid = enc.cid
        JOIN sub qs ON qs.j = enc.j
        WHERE qs.vec_id < 5 AND qs.vec_id <> enc.vec_id
        GROUP BY qs.vec_id, enc.vec_id),
pq_scored AS (SELECT ipx.q_id, ipx.c_id,
             CASE WHEN rn.rnorm = 0 OR qn.qnorm = 0 THEN 0
                  ELSE ipx.ip / (qn.qnorm * rn.rnorm) END AS cos
           FROM ipx JOIN rn ON rn.c_id = ipx.c_id
                    JOIN qn ON qn.q_id = ipx.q_id)
"""

_PQ_SQL = f"""
WITH {_PQ_CTE}
SELECT q_id AS query_id, c_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos DESC, c_id ASC) AS rank FROM pq_scored)
WHERE rank <= 10
"""


def _topk_ids(scored_cte: str, qc: str = "q_id", cc: str = "c_id") -> str:
    """rank<=10 (query_id, neighbor_id) projection over a scored CTE."""
    return f"""
  SELECT {qc} AS query_id, {cc} AS neighbor_id FROM (
    SELECT {qc}, {cc}, row_number() OVER (PARTITION BY {qc}
      ORDER BY cos DESC, {cc} ASC) AS rank FROM {scored_cte})
  WHERE rank <= 10"""


_RECALL_REPORT_SQL = f"""
WITH {_W_CTE},
rr_q AS (SELECT vec_id AS q_id, embedding AS qvec
         FROM embeddings WHERE vec_id < 5),
rr_truth_scored AS (
  SELECT q.q_id, e.vec_id AS c_id, {_cos_duck('e.embedding', 'q.qvec')} AS cos
  FROM embeddings e CROSS JOIN rr_q q WHERE e.vec_id <> q.q_id),
rr_truth AS ({_topk_ids('rr_truth_scored')}),
rr_sig AS (SELECT vec_id, embedding, {_SIG_EXPR} AS sig
           FROM embeddings CROSS JOIN wm),
rr_banded AS (
  SELECT vec_id, embedding, 0 AS band, sig & 255 AS key FROM rr_sig
  UNION ALL SELECT vec_id, embedding, 1, sig >> 8 FROM rr_sig),
rr_lsh_scored AS (
  SELECT q_id, c_id, {_cos_duck('cvec', 'qvec')} AS cos FROM (
    SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS c_id,
           b.embedding AS cvec, q.embedding AS qvec
    FROM rr_banded b JOIN rr_banded q
      ON b.band = q.band AND b.key = q.key
    WHERE q.vec_id < 5 AND b.vec_id <> q.vec_id)),
rr_lsh AS ({_topk_ids('rr_lsh_scored')}),
rr_cents AS (SELECT vec_id AS cid, embedding AS cvec
             FROM embeddings ORDER BY vec_id LIMIT 8),
rr_corpus_cells AS (
  SELECT vec_id AS c_id, embedding AS c_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN rr_cents c)
  WHERE crank <= 1),
rr_query_cells AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN rr_cents c WHERE e.vec_id < 5)
  WHERE crank <= 2),
rr_ivf_scored AS (
  SELECT q_id, c_id, {_cos_duck('c_vec', 'q_vec')} AS cos FROM (
    SELECT DISTINCT q.q_id, cc.c_id, cc.c_vec, q.q_vec
    FROM rr_corpus_cells cc JOIN rr_query_cells q ON cc.cell = q.cell
    WHERE cc.c_id <> q.q_id)),
rr_ivf AS ({_topk_ids('rr_ivf_scored')}),
{_QUANT_CTE},
rr_quant_scored AS (
  SELECT qs.q_id, c.vec_id AS c_id,
    {_dot_int_duck('c.q', 'qs.qq')} /
    (sqrt({_dot_int_duck('c.q', 'c.q')}) *
     sqrt({_dot_int_duck('qs.qq', 'qs.qq')})) AS cos
  FROM qz c CROSS JOIN
       (SELECT vec_id AS q_id, q AS qq FROM qz WHERE vec_id < 5) qs
  WHERE c.vec_id <> qs.q_id),
rr_quant AS ({_topk_ids('rr_quant_scored')}),
{_PQ_CTE},
rr_pq AS ({_topk_ids('pq_scored')}),
rr_perq AS (
  SELECT 'lsh' AS method, t.query_id,
         count(a.query_id) AS n_hit, count(*) AS n_truth
  FROM rr_truth t LEFT JOIN rr_lsh a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
  UNION ALL
  SELECT 'ivf', t.query_id, count(a.query_id), count(*)
  FROM rr_truth t LEFT JOIN rr_ivf a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
  UNION ALL
  SELECT 'quantized', t.query_id, count(a.query_id), count(*)
  FROM rr_truth t LEFT JOIN rr_quant a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
  UNION ALL
  SELECT 'pq', t.query_id, count(a.query_id), count(*)
  FROM rr_truth t LEFT JOIN rr_pq a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id)
SELECT method, CAST(10 AS INTEGER) AS k, count(*) AS n_queries,
       CAST(sum(n_truth) AS BIGINT) AS n_truth,
       CAST(sum(n_hit) AS BIGINT) AS n_hit,
       CAST(sum(n_hit) AS DOUBLE) / CAST(sum(n_truth) AS DOUBLE) AS recall,
       min(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)) AS min_recall
FROM rr_perq GROUP BY method
"""


# Trained-IVF oracle: ONE deterministic Lloyd round unrolled in SQL.  The
# centroid means must be BIT-identical across engines, so both sides run
# the same sorted sequential fold — Spark: array_sort(collect_list) +
# aggregate (similarity.train_centroids); DuckDB: list(v ORDER BY vec_id)
# + list_reduce (a left fold over the ordered list).  Element widening to
# DOUBLE happens before any addition in both engines (float32 embeddings
# widen exactly).  Empty cells keep the seed centroid (COALESCE).
_LLOYD_COS = (
    "(list_sum(list_transform(list_zip(c.v, s.cvec), z -> z[1] * z[2])) / "
    "(sqrt(list_sum(list_transform(c.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(s.cvec, x -> x * x)))))"
)

_LLOYD_CENTS_CTE = f"""
seed AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8),
corpus0 AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
scored0 AS (
  SELECT c.vec_id, c.v, s.cid,
    row_number() OVER (PARTITION BY c.vec_id ORDER BY
      {_LLOYD_COS} DESC, s.cid ASC) AS rk
  FROM corpus0 c CROSS JOIN seed s),
assigned0 AS (SELECT vec_id, v, cid AS cell FROM scored0 WHERE rk = 1),
means0 AS (
  SELECT cell,
    list_transform(
      list_reduce(list(v ORDER BY vec_id),
                  (a, b) -> list_transform(list_zip(a, b),
                                           z -> z[1] + z[2])),
      x -> x / count(*)) AS cvec
  FROM assigned0 GROUP BY cell),
cents AS (
  SELECT s.cid, COALESCE(m.cvec, s.cvec) AS cvec
  FROM seed s LEFT JOIN means0 m ON s.cid = m.cell)
"""

_IVF_TRAINED_SQL = f"""
WITH {_LLOYD_CENTS_CTE},
corpus_cells AS (
  SELECT vec_id AS c_id, embedding AS c_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
query_cells AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cell FROM (
    SELECT e.vec_id, e.embedding, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5)
  WHERE crank <= 2),
cand AS (
  SELECT DISTINCT q.q_id, cc.c_id, cc.c_vec, q.q_vec
  FROM corpus_cells cc JOIN query_cells q ON cc.cell = q.cell
  WHERE cc.c_id <> q.q_id),
scored AS (SELECT q_id, c_id, {_cos_duck('c_vec', 'q_vec')} AS cos FROM cand)
SELECT q_id AS query_id, c_id AS neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        ORDER BY cos DESC, c_id ASC) AS rank FROM scored)
WHERE rank <= 10
"""


def _q_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=8,
        n_probe=2, train_iters=1,
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


# SemDeDup (similarity.semdedup_pairs / semdedup_corpus): the same
# one-round Lloyd centroids as sim_ivf_trained, argmax cell assignment,
# within-cell pairwise cosine ≥ threshold, and (corpus row) the
# recursive-CTE transitive closure with min-id representatives.  The
# threshold 0.402 sits in a measured gap of the sf0.01 WITHIN-CELL cosine
# distribution (0.40357 above, 0.39987 below — ~4e-3 wide vs ~1e-16 float
# noise), so the ≥ filter cannot flip across engines; 24 pairs survive,
# a non-trivial component structure for the closure to chew on.
_SEMDEDUP_THRESHOLD = 0.402

_SEMDEDUP_CTE = f"""
{_LLOYD_CENTS_CTE},
sd_cells AS (
  SELECT vec_id, v, cell FROM (
    SELECT c.vec_id, c.v, s.cid AS cell,
      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        {_LLOYD_COS} DESC, s.cid ASC) AS rk
    FROM corpus0 c CROSS JOIN cents s) WHERE rk = 1),
sd_prs AS (
  SELECT cell, doc_a, doc_b, cos FROM (
    SELECT a.cell, a.vec_id AS doc_a, b.vec_id AS doc_b,
      (list_sum(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])) /
       (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
        sqrt(list_sum(list_transform(b.v, x -> x * x))))) AS cos
    FROM sd_cells a JOIN sd_cells b
      ON a.cell = b.cell AND a.vec_id < b.vec_id)
  WHERE cos >= {_SEMDEDUP_THRESHOLD})
"""

_SEMDEDUP_PAIRS_SQL = f"""
WITH {_SEMDEDUP_CTE}
SELECT cell, doc_a, doc_b, round(cos, 6) AS cos_r FROM sd_prs
"""

_SEMDEDUP_CORPUS_SQL = f"""
WITH RECURSIVE {_SEMDEDUP_CTE},
sd_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM sd_prs
  UNION SELECT doc_b, doc_a FROM sd_prs),
sd_reach(src, dst) AS (
  SELECT src, dst FROM sd_edges
  UNION
  SELECT r.src, e.dst FROM sd_reach r JOIN sd_edges e ON r.dst = e.src)
SELECT vec_id FROM embeddings WHERE vec_id NOT IN (
  SELECT src FROM sd_reach GROUP BY src HAVING least(src, min(dst)) <> src)
"""


def _q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.train_centroids(emb, n_centroids=8, iters=1)
    res = similarity.semdedup_pairs(
        emb, cents, threshold=_SEMDEDUP_THRESHOLD
    )
    return res.select(
        "cell", "doc_a", "doc_b", F.round("cos", 6).alias("cos_r")
    )


def _q_semdedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.semdedup_corpus(
        emb, n_centroids=8, train_iters=1, threshold=_SEMDEDUP_THRESHOLD
    )
    return res.select("vec_id")


# Prototype pruning (similarity.prototype_prune — D4 stage two): the same
# one-round Lloyd centroids, each vector scored against its OWN centroid,
# then the floor(frac·n) most-prototypical rows of each cell dropped under
# (cos DESC, id ASC) order.  The rank ORDER BY is over raw cosines —
# dot/sqrt/÷ only (the IEEE correctly-rounded set, no transcendentals), the
# same cross-engine-exact ordering sim_ivf_trained's rank already proves —
# so ranks, counts, and the floor() drop boundary are integer-exact on both
# engines; only the reported cosine is display-rounded.
_PROTO_PRUNE_SQL = f"""
WITH {_LLOYD_CENTS_CTE},
pp_cells AS (
  SELECT vec_id, cell, cos FROM (
    SELECT e.vec_id, c.cid AS cell,
      {_cos_duck('e.embedding', 'c.cvec')} AS cos,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_cos_duck('e.embedding', 'c.cvec')} DESC, c.cid ASC) AS crank
    FROM embeddings e CROSS JOIN cents c)
  WHERE crank <= 1),
pp_ranked AS (
  SELECT vec_id, cell, cos,
    row_number() OVER (PARTITION BY cell
      ORDER BY cos DESC, vec_id ASC) AS prank,
    count(*) OVER (PARTITION BY cell) AS n_cell
  FROM pp_cells)
SELECT vec_id, cell, CAST(prank AS INTEGER) AS proto_rank,
       n_cell AS cell_n, round(cos, 6) AS proto_cos_r
FROM pp_ranked
WHERE prank > CAST(floor(5e-1 * n_cell) AS BIGINT)
"""


def _q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.train_centroids(emb, n_centroids=8, iters=1)
    res = similarity.prototype_prune(emb, cents, prune_fraction=0.5)
    return res.select(
        "vec_id", "cell", "proto_rank", "cell_n",
        F.round("proto_cos", 6).alias("proto_cos_r"),
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 5), k=10
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, planes=_PLANES,
        signs=_SIGNS,
    )
    return res.select(
        "query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_r")
    )


def _q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    # threshold calibrated to the testdata's cosine distribution (max ≈ .51)
    res = similarity.cosine_pairs(
        emb, threshold=0.2, planes=_PLANES, signs=_SIGNS
    )
    return res.select("doc_a", "doc_b", F.round("cos", 6).alias("cos_r"))


# ---------------------------------------------------------------------------
# text_* — language ID / quality / tokens


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = text_analysis.language_id(_t(spark, sf_dir, "documents"))
    return res.select("doc_id", "lang_pred", "lang_votes")


def _votes_duck(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text_analysis.LANG_PROFILES[lang])
    return (
        f"CAST(len(list_filter(string_split(lower(text), ' '), "
        f"w -> list_contains([{words}], w))) AS INTEGER)"
    )


def _lang_sql(source: str = "documents") -> str:
    langs = list(text_analysis.LANG_PROFILES)
    votes = ", ".join(f"{_votes_duck(lg)} AS v_{lg}" for lg in langs)
    scripts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{cls}')) AS INTEGER) AS s_{lg}"
        for lg, cls, _, _ in text_analysis.SCRIPT_RULES
    )
    case = "CASE"
    for lg, _, num, den in text_analysis.SCRIPT_RULES:
        case += (
            f" WHEN length(text) > 0 AND s_{lg} * {den} > "
            f"length(text) * {num} THEN '{lg}'"
        )
    # zero-vote → 'und' guard, mirrored from language_id (lockstep)
    zero = " AND ".join(f"v_{lg} = 0" for lg in langs)
    case += f" WHEN {zero} THEN 'und'"
    for lg in langs:
        others = " AND ".join(f"v_{lg} >= v_{o}" for o in langs if o != lg)
        case += f" WHEN {others} THEN '{lg}'"
    case += " ELSE 'und' END"
    great = ", ".join(f"v_{lg}" for lg in langs)
    return f"""
WITH v AS (SELECT doc_id, text, {scripts}, {votes} FROM {source})
SELECT doc_id, {case} AS lang_pred,
       -- DuckDB's greatest() promotes INTEGER args to BIGINT; Spark's
       -- greatest(size(...)) stays INT — cast back so the driver's
       -- type-sensitive hash sees matching widths (same trap family as
       -- the _PACK_SQL HUGEINT cast)
       CAST(greatest({great}) AS INTEGER) AS lang_votes FROM v
"""


# CJK/script detection roundtrip: both engines inject Han/kana/Hangul
# text for three doc_id classes; the script-ratio rules must classify
# identically.
_CJK_INJECT = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 1 THEN '统计学习方法 机器学习 数据处理流程' "
    "WHEN 2 THEN 'これはテストです。データ処理のテスト。' "
    "WHEN 3 THEN '한국어 텍스트 데이터 처리 파이프라인' "
    "ELSE text END"
)


def _q_language_id_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CJK_INJECT).alias("text")
    )
    return text_analysis.language_id(docs).select(
        "doc_id", "lang_pred", "lang_votes"
    )


def _cjk_sql() -> str:
    return _lang_sql(
        f"(SELECT doc_id, {_CJK_INJECT} AS text FROM documents)"
    )


# Same roundtrip for the single-block scripts added in r3 (Cyrillic,
# Hebrew, Arabic, Devanagari, Thai): both engines inject the same text
# per doc_id class and must classify identically.
_SCRIPTS_INJECT = (
    "CASE CAST(doc_id % 6 AS INT) "
    "WHEN 1 THEN 'статистические методы обработки данных' "
    "WHEN 2 THEN 'עיבוד נתונים בקנה מידה גדול' "
    "WHEN 3 THEN 'معالجة البيانات على نطاق واسع' "
    "WHEN 4 THEN 'बड़े पैमाने पर डेटा प्रसंस्करण' "
    "WHEN 5 THEN 'การประมวลผลข้อมูลขนาดใหญ่' "
    "ELSE text END"
)


def _q_language_id_scripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SCRIPTS_INJECT).alias("text")
    )
    return text_analysis.language_id(docs).select(
        "doc_id", "lang_pred", "lang_votes"
    )


def _scripts_sql() -> str:
    return _lang_sql(
        f"(SELECT doc_id, {_SCRIPTS_INJECT} AS text FROM documents)"
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = text_analysis.quality_score(_t(spark, sf_dir, "documents"))
    return res.select(
        "doc_id",
        "n_words",
        F.round("lexical_diversity", 6).alias("lex_div_r"),
        F.round("stopword_ratio", 6).alias("stop_ratio_r"),
        F.round("quality", 6).alias("quality_r"),
    )


def _quality_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in text_analysis.EN_STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
    CAST(len(list_filter(string_split(text, ' '),
         w -> list_contains([{stop}], w))) AS INTEGER) AS n_stop
  FROM documents)
SELECT doc_id, n_words,
  round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS lex_div_r,
  round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stop_ratio_r,
  round(least(1.0, greatest(0.0,
    0.4 * least(n_words / 100.0, 1.0) +
    0.3 * (CAST(n_distinct AS DOUBLE) / n_words) +
    0.3 * least((CAST(n_stop AS DOUBLE) / n_words) * 5.0, 1.0))), 6)
    AS quality_r
FROM f
"""


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = text_analysis.token_count(_t(spark, sf_dir, "documents"))
    return res.select("doc_id", "ws_tokens", "bpe_tokens")


_TOKEN_SQL = f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{text_analysis.TOKEN_PATTERN}'))
       AS INTEGER) AS bpe_tokens
FROM documents
"""


def _q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.token_frequencies(
        _t(spark, sf_dir, "documents"), min_count=5
    )


_TOKEN_FREQ_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token HAVING count(*) >= 5
"""


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.repetition_ratio(
        _t(spark, sf_dir, "documents"), n=2
    )


_REPETITION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(ws) >= 2 THEN
          list_transform(generate_series(0, len(ws) - 2),
            i -> array_to_string(list_slice(ws, i + 1, i + 2), ' '))
        ELSE [] END AS grams
      FROM w)
SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
  CASE WHEN len(grams) > 0 THEN
    CAST(list_aggregate(list_transform(list_distinct(grams),
           g2 -> len(list_filter(grams, x -> x = g2))), 'max') AS DOUBLE)
      / len(grams)
  ELSE 0.0 END AS max_gram_ratio
FROM g
"""


def _q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = text_analysis.gopher_rules(_t(spark, sf_dir, "documents"))
    return res.select(
        "doc_id", "g_words", "g_mean_word_len", "g_symbol_word_ratio",
        "g_short_word_frac", "g_keep",
    )


_GOPHER_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
f AS (SELECT doc_id,
  CAST(len(ws) AS INTEGER) AS g_words,
  CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS DOUBLE)
    / len(ws) AS g_mean_word_len,
  CAST(len(list_filter(ws, x -> regexp_matches(x, '[^a-zA-Z0-9]')))
       AS DOUBLE) / len(ws) AS g_symbol_word_ratio,
  CAST(len(list_filter(ws, x -> length(x) <= 2)) AS DOUBLE) / len(ws)
    AS g_short_word_frac
  FROM w)
SELECT *,
  (g_words BETWEEN 5 AND 10000000)
  AND (g_mean_word_len BETWEEN 2.0 AND 12.0)
  AND (g_symbol_word_ratio < 0.3)
  AND (g_short_word_frac < 0.6) AS g_keep
FROM f
"""


# ---------------------------------------------------------------------------
# mm_* — multimodal plumbing: Python UDF vs pure-SQL twin of the
# deterministic fake decode (multimodal.fake_decode_dims)


def _q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return multimodal.media_metadata(docs)


# kind: magic-byte sniff mirrored for the prefixes a UTF-8 text payload can
# actually start with — 'RIFF' (plain ASCII) and the webm magic
# \\x1a\\x45\\xdf\\xa3 (U+001A, 'E', U+07E3); PNG/JPEG magics are invalid
# leading UTF-8 bytes so they cannot occur.  RIFF is a container: the
# fourcc at BYTES 8:12 (byte-addressed via the BLOB, matching the Spark
# side's payload[8:12] — char offsets desync on multibyte text) decides
# wav/webp/avi.
_MEDIA_SQL = f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS sha, text,
                  encode(text) AS payload,
                  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
           FROM documents)
SELECT media_id, n_bytes, sha,
       CASE WHEN starts_with(text, 'GIF8') THEN 'image/gif'
            WHEN starts_with(text, 'RIFF') THEN
              CASE substr(hex(payload), 17, 8)
                   WHEN hex(encode('WAVE')) THEN 'audio/wav'
                   WHEN hex(encode('WEBP')) THEN 'image/webp'
                   WHEN hex(encode('AVI ')) THEN 'video/avi'
                   ELSE 'application/octet-stream' END
            WHEN starts_with(text, chr(26) || chr(69) || chr(2019))
              THEN 'video/webm'
            ELSE 'application/octet-stream' END AS kind,
  CAST({_hex_decode_duck('sha', 1, 8)} % 1920 + 1 AS INTEGER) AS width,
  CAST({_hex_decode_duck('sha', 9, 8)} % 1080 + 1 AS INTEGER) AS height,
  CAST({_hex_decode_duck('sha', 17, 4)} % 240 + 1 AS INTEGER) AS n_frames
FROM m
"""


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing check: the float32 vector is projected
    back to exact digest bytes (round(f*255)) so the compare is integer-
    exact across the float32 (Arrow) / float64 (DuckDB) divide."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = multimodal.extract_features(docs)
    return feats.select(
        "media_id", F.posexplode("features").alias("i", "f")
    ).select(
        "media_id",
        "i",
        F.round(F.col("f") * 255).cast("int").alias("byte_val"),
    )


_FEATURES_SQL = f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS sha FROM documents),
i AS (SELECT unnest(generate_series(0, {multimodal.FEATURE_DIM - 1})) AS i)
SELECT media_id, CAST(i.i AS INTEGER) AS i,
       CAST((instr('0123456789abcdef', substr(sha, 2 * i.i + 1, 1)) - 1) * 16
            + (instr('0123456789abcdef', substr(sha, 2 * i.i + 2, 1)) - 1)
            AS INTEGER) AS byte_val
FROM m CROSS JOIN i
"""


def _q_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return multimodal.sample_frames(docs, every=30).select(
        "media_id", "frame_i"
    )


_FRAMES_SQL = f"""
WITH m AS (SELECT doc_id AS media_id,
                  {_hex_decode_duck('sha256(text)', 17, 4)} % 240 + 1
                    AS n_frames
           FROM documents)
SELECT media_id,
       CAST(unnest(generate_series(0, n_frames - 1, 30)) AS INTEGER)
         AS frame_i
FROM m
"""


# mm decode/resize/features — REAL decoded pixels vs an ANALYTIC oracle.
# The fixture image for seed s has pixel (x, y) = (r, g, b) in closed form
# (multimodal.synthetic_image_bytes); the Spark side round-trips it through
# the stdlib PNG codec (encode with per-row filter cycling → zlib inflate →
# unfilter all 5 PNG filter types → pixel sums), the DuckDB side recomputes
# the sums directly from the formula.  Any wrong filter inverse, row order,
# stride, or channel swap breaks the hash.  24×16 / grid 4 divide evenly,
# so the oracle's pixel→cell map is a plain integer division (the general
# floor-boundary map is pytest-pinned in test_multimodal.py).
_MM_W, _MM_H = 24, 16
_MM_RGB = (
    "(3 * x + 7 * y + media_id) % 256",
    "(5 * x + 11 * y + 2 * media_id) % 251",
    "(13 * x + 17 * y + 3 * media_id) % 241",
)


def _mm_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 64)
        .select(F.col("doc_id").alias("media_id"))
    )


_MM_IDS_CTE = (
    "ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 64)"
)


def _q_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    return multimodal.decode_image_stats(imgs)


_DECODE_STATS_SQL = f"""
WITH {_MM_IDS_CTE},
px AS (SELECT media_id, xs.x, ys.y
       FROM ids CROSS JOIN range({_MM_W}) xs(x) CROSS JOIN range({_MM_H}) ys(y))
SELECT media_id,
  CAST({_MM_W} AS INTEGER) AS width, CAST({_MM_H} AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS n_channels,
  CAST(sum({_MM_RGB[0]}) AS BIGINT) AS sum_r,
  CAST(sum({_MM_RGB[1]}) AS BIGINT) AS sum_g,
  CAST(sum({_MM_RGB[2]}) AS BIGINT) AS sum_b
FROM px GROUP BY media_id
"""


_MM_RW, _MM_RH = 10, 7


def _q_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate → resize (decode, nearest-neighbor, PNG re-encode) →
    decode again → sums: two full codec round trips plus the exact
    integer index mapping out(x2,y2) = src(x2·W//out_w, y2·H//out_h)."""
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    return multimodal.decode_image_stats(
        multimodal.resize_images(imgs, _MM_RW, _MM_RH)
    )


_RESIZE_STATS_SQL = f"""
WITH {_MM_IDS_CTE},
px AS (SELECT media_id,
              (x2 * {_MM_W}) // {_MM_RW} AS x, (y2 * {_MM_H}) // {_MM_RH} AS y
       FROM ids CROSS JOIN range({_MM_RW}) xs(x2)
                CROSS JOIN range({_MM_RH}) ys(y2))
SELECT media_id,
  CAST({_MM_RW} AS INTEGER) AS width, CAST({_MM_RH} AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS n_channels,
  CAST(sum({_MM_RGB[0]}) AS BIGINT) AS sum_r,
  CAST(sum({_MM_RGB[1]}) AS BIGINT) AS sum_g,
  CAST(sum({_MM_RGB[2]}) AS BIGINT) AS sum_b
FROM px GROUP BY media_id
"""


_MM_GRID = 4


def _q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-pixel grid features, hash-compared UNROUNDED: each value
    is one IEEE division of exact integer sums (no transcendentals), so
    both engines produce bit-identical doubles."""
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    feats = multimodal.image_features(imgs, grid=_MM_GRID)
    return feats.select(
        "media_id", F.posexplode("features").alias("i", "feature")
    ).select("media_id", "i", "feature")


_IMAGE_FEATURES_SQL = f"""
WITH {_MM_IDS_CTE},
px AS (SELECT media_id, xs.x, ys.y,
              (ys.y // {_MM_H // _MM_GRID}) * {_MM_GRID}
                + xs.x // {_MM_W // _MM_GRID} AS i,
              {_MM_RGB[0]} + {_MM_RGB[1]} + {_MM_RGB[2]} AS v
       FROM ids CROSS JOIN range({_MM_W}) xs(x) CROSS JOIN range({_MM_H}) ys(y))
SELECT media_id, CAST(i AS INTEGER) AS i,
       CAST(sum(v) AS DOUBLE)
         / (3 * {(_MM_W // _MM_GRID) * (_MM_H // _MM_GRID)}) AS feature
FROM px GROUP BY media_id, i
"""


# Perceptual average-hash + image near-dup pairs: the Spark side decodes
# REAL bytes (PNG codec), nearest-resizes to 8×8, and packs the
# above-mean bits; the oracle replays the exact integer pipeline — the
# resize index map (x2·W//8), the closed-form fixture channels, and the
# CROSS-MULTIPLIED mean comparison (v·64 > total, no float anywhere) —
# packing via HUGEINT shifts (DuckDB raises on 1::BIGINT << 63) and
# mapping bit 63 back into the signed bigint domain.  The pairs row
# additionally proves the pigeonhole banding's EXACT recall: the oracle
# counts disagreeing bits per pair directly (no bands), so any missed
# band pair breaks the hash.

_MM_AH_G = 8


def _ahash_sql() -> str:
    sx, sy = _MM_W // _MM_AH_G, _MM_H // _MM_AH_G
    n = _MM_AH_G * _MM_AH_G
    return f"""
WITH {_MM_IDS_CTE},
rs AS (SELECT media_id, ys.y2 * {_MM_AH_G} + xs.x2 AS i,
              xs.x2 * {sx} AS x, ys.y2 * {sy} AS y
       FROM ids CROSS JOIN range({_MM_AH_G}) xs(x2)
                CROSS JOIN range({_MM_AH_G}) ys(y2)),
v AS (SELECT media_id, i,
             {_MM_RGB[0]} + {_MM_RGB[1]} + {_MM_RGB[2]} AS v
      FROM rs),
tot AS (SELECT media_id, sum(v) AS total FROM v GROUP BY media_id),
h AS (SELECT v.media_id,
        sum(CASE WHEN v.v * {n} > t.total
            THEN (1::HUGEINT << CAST(v.i AS INTEGER)) ELSE 0::HUGEINT END)
          AS hh,
        CAST(min(t.total) AS BIGINT) AS intensity_sum
      FROM v JOIN tot t ON v.media_id = t.media_id
      GROUP BY v.media_id)
SELECT media_id,
  CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
       THEN hh - 18446744073709551616::HUGEINT ELSE hh END AS BIGINT)
    AS ahash,
  intensity_sum
FROM h
"""


_AHASH_SQL = _ahash_sql()
_MM_AH_MAXH = 6


def _ahash_pairs_sql() -> str:
    sx, sy = _MM_W // _MM_AH_G, _MM_H // _MM_AH_G
    n = _MM_AH_G * _MM_AH_G
    return f"""
WITH {_MM_IDS_CTE},
rs AS (SELECT media_id, ys.y2 * {_MM_AH_G} + xs.x2 AS i,
              xs.x2 * {sx} AS x, ys.y2 * {sy} AS y
       FROM ids CROSS JOIN range({_MM_AH_G}) xs(x2)
                CROSS JOIN range({_MM_AH_G}) ys(y2)),
v AS (SELECT media_id, i,
             {_MM_RGB[0]} + {_MM_RGB[1]} + {_MM_RGB[2]} AS v
      FROM rs),
tot AS (SELECT media_id, sum(v) AS total FROM v GROUP BY media_id),
bits AS (SELECT v.media_id, v.i,
                CASE WHEN v.v * {n} > t.total THEN 1 ELSE 0 END AS b
         FROM v JOIN tot t ON v.media_id = t.media_id)
SELECT a.media_id AS media_a, b.media_id AS media_b,
  CAST(sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS INTEGER) AS hamming
FROM bits a JOIN bits b ON a.i = b.i AND a.media_id < b.media_id
GROUP BY 1, 2 HAVING hamming <= {_MM_AH_MAXH}
"""


_AHASH_PAIRS_SQL = _ahash_pairs_sql()


def _q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    return multimodal.image_ahash(imgs, grid=_MM_AH_G)


def _q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    return multimodal.image_near_dup_pairs(
        imgs, max_hamming=_MM_AH_MAXH, grid=_MM_AH_G
    )


# End-to-end perceptual dedup survivors: min-id representative per
# connected component (transitive closure) — the oracle reuses the
# band-free pair set and the recursive-CTE closure convention of
# dedup_clusters.  Payload column projected away (binary is not
# driver-hashable); survivorship is the semantics under test.

_AHASH_DEDUP_SQL = f"""
WITH RECURSIVE {_MM_IDS_CTE},
rs AS (SELECT media_id, ys.y2 * {_MM_AH_G} + xs.x2 AS i,
              xs.x2 * {_MM_W // _MM_AH_G} AS x,
              ys.y2 * {_MM_H // _MM_AH_G} AS y
       FROM ids CROSS JOIN range({_MM_AH_G}) xs(x2)
                CROSS JOIN range({_MM_AH_G}) ys(y2)),
v AS (SELECT media_id, i,
             {_MM_RGB[0]} + {_MM_RGB[1]} + {_MM_RGB[2]} AS v
      FROM rs),
tot AS (SELECT media_id, sum(v) AS total FROM v GROUP BY media_id),
bits AS (SELECT v.media_id, v.i,
                CASE WHEN v.v * {_MM_AH_G * _MM_AH_G} > t.total
                     THEN 1 ELSE 0 END AS b
         FROM v JOIN tot t ON v.media_id = t.media_id),
prs AS (
  SELECT a.media_id AS doc_a, b.media_id AS doc_b
  FROM bits a JOIN bits b ON a.i = b.i AND a.media_id < b.media_id
  GROUP BY 1, 2
  HAVING sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) <= {_MM_AH_MAXH}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION SELECT doc_b, doc_a FROM prs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT media_id FROM ids
WHERE media_id NOT IN (
  SELECT src FROM reach GROUP BY src HAVING least(src, min(dst)) <> src)
"""


def _q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = multimodal.synthetic_images(_mm_ids(spark, sf_dir), _MM_W, _MM_H)
    return multimodal.image_dedup_corpus(
        imgs, max_hamming=_MM_AH_MAXH, grid=_MM_AH_G
    ).select("media_id")


# mm audio decode/resample/features — REAL decoded samples vs an ANALYTIC
# oracle, the audio twin of the image rows above.  The fixture WAV for
# seed s holds sample ((7·i + 13·c + s) % 4001 − 2000) on channel c of
# frame i (multimodal.synthetic_wav_bytes); the Spark side round-trips it
# through the stdlib RIFF codec (chunk walk, PCM frame unpack, signed
# conversion), the DuckDB side recomputes the stats from the formula.
# Any wrong channel interleave, sign convention, byte order, or index map
# breaks the hash.  480 frames / 8 bands and the 8000→3000 rate map keep
# every boundary an exact integer division.

_MM_AU_N, _MM_AU_RATE, _MM_AU_CH = 480, 8000, 2
_MM_AU_V = "((7 * i + 13 * c + media_id) % 4001 - 2000)"
_MM_AU_SAMPLES_CTE = f"""
s AS (SELECT media_id, fi.i, ci.c, {_MM_AU_V} AS v
      FROM ids CROSS JOIN range({_MM_AU_N}) fi(i)
               CROSS JOIN range({_MM_AU_CH}) ci(c))
"""


def _q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    return multimodal.decode_audio_stats(au)


_AUDIO_STATS_SQL = f"""
WITH {_MM_IDS_CTE},
{_MM_AU_SAMPLES_CTE}
SELECT media_id,
  CAST({_MM_AU_RATE} AS INTEGER) AS sample_rate,
  CAST({_MM_AU_CH} AS INTEGER) AS n_channels,
  CAST({_MM_AU_N} AS INTEGER) AS n_frames,
  CAST({_MM_AU_N * 1000 // _MM_AU_RATE} AS INTEGER) AS duration_ms,
  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
  CAST(max(abs(v)) AS INTEGER) AS peak
FROM s GROUP BY media_id
"""


_MM_AU_RRATE = 3000
_MM_AU_RN = _MM_AU_N * _MM_AU_RRATE // _MM_AU_RATE


def _q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate → resample (decode, nearest-frame, WAV re-encode) →
    decode again → stats: two full codec round trips plus the exact
    integer index mapping src(j) = j·in_rate//out_rate."""
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    return multimodal.decode_audio_stats(
        multimodal.resample_audio(au, _MM_AU_RRATE)
    )


_AUDIO_RESAMPLE_SQL = f"""
WITH {_MM_IDS_CTE},
s AS (SELECT media_id,
             ((7 * ((fj.j * {_MM_AU_RATE}) // {_MM_AU_RRATE})
               + 13 * ci.c + media_id) % 4001 - 2000) AS v
      FROM ids CROSS JOIN range({_MM_AU_RN}) fj(j)
               CROSS JOIN range({_MM_AU_CH}) ci(c))
SELECT media_id,
  CAST({_MM_AU_RRATE} AS INTEGER) AS sample_rate,
  CAST({_MM_AU_CH} AS INTEGER) AS n_channels,
  CAST({_MM_AU_RN} AS INTEGER) AS n_frames,
  CAST({_MM_AU_RN * 1000 // _MM_AU_RRATE} AS INTEGER) AS duration_ms,
  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
  CAST(max(abs(v)) AS INTEGER) AS peak
FROM s GROUP BY media_id
"""


_MM_AU_BANDS = 8


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-sample band features, hash-compared UNROUNDED: each value
    is one IEEE division of exact integer sums (no transcendentals), so
    both engines produce bit-identical doubles."""
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    feats = multimodal.audio_features(au, n_bands=_MM_AU_BANDS)
    return feats.select(
        "media_id", F.posexplode("features").alias("i", "feature")
    ).select("media_id", "i", "feature")


_AUDIO_FEATURES_SQL = f"""
WITH {_MM_IDS_CTE},
{_MM_AU_SAMPLES_CTE}
SELECT media_id,
  CAST(i // {_MM_AU_N // _MM_AU_BANDS} AS INTEGER) AS i,
  CAST(sum(abs(v)) AS DOUBLE)
    / {_MM_AU_CH * (_MM_AU_N // _MM_AU_BANDS)} AS feature
FROM s GROUP BY media_id, i // {_MM_AU_N // _MM_AU_BANDS}
"""


# Acoustic fingerprint + audio near-dup: the Spark side decodes REAL WAV
# bytes and packs the energy-delta sign bits over 65 RAGGED time windows
# (480 frames / 65 windows exercises the cross-multiplied comparison —
# nothing divides evenly); the oracle recomputes the window sums from the
# sample formula using the INVERSE boundary map w = (i·W + W−1)//F
# (frame→window) against the Python side's forward map f0(b) = b·F//W —
# a genuine differential on the boundary arithmetic.  Same HUGEINT
# pack / signed-map as mm_image_ahash; the pairs oracle counts
# disagreeing bits band-free, re-proving exact banding recall on a
# second signature family.

_MM_FP_BITS = 64
_MM_FP_W = _MM_FP_BITS + 1
_MM_FP_MAXH = 2


def _fp_len(w: str) -> str:
    return (
        f"((({w}) + 1) * {_MM_AU_N}) // {_MM_FP_W} "
        f"- (({w}) * {_MM_AU_N}) // {_MM_FP_W}"
    )


_MM_FP_SUMS_CTE = f"""
ws AS (SELECT media_id, (i * {_MM_FP_W} + {_MM_FP_W - 1}) // {_MM_AU_N}
                AS w, abs(v) AS a
       FROM s),
sums AS (SELECT media_id, w, sum(a) AS sw FROM ws GROUP BY media_id, w),
fpbits AS (
  SELECT a.media_id, a.w AS i,
    CASE WHEN b.sw * ({_fp_len('a.w')}) > a.sw * ({_fp_len('b.w')})
         THEN 1 ELSE 0 END AS bit
  FROM sums a JOIN sums b
    ON b.media_id = a.media_id AND b.w = a.w + 1)
"""

_AUDIO_FP_SQL = f"""
WITH {_MM_IDS_CTE},
{_MM_AU_SAMPLES_CTE},
{_MM_FP_SUMS_CTE},
h AS (SELECT media_id,
        sum(CASE WHEN bit = 1
            THEN (1::HUGEINT << CAST(i AS INTEGER)) ELSE 0::HUGEINT END)
          AS hh
      FROM fpbits GROUP BY media_id),
e AS (SELECT media_id, CAST(sum(abs(v)) AS BIGINT) AS energy_sum
      FROM s GROUP BY media_id)
SELECT h.media_id,
  CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
       THEN hh - 18446744073709551616::HUGEINT ELSE hh END AS BIGINT)
    AS fingerprint,
  e.energy_sum
FROM h JOIN e ON h.media_id = e.media_id
"""

_AUDIO_NEAR_DUP_SQL = f"""
WITH {_MM_IDS_CTE},
{_MM_AU_SAMPLES_CTE},
{_MM_FP_SUMS_CTE}
SELECT a.media_id AS media_a, b.media_id AS media_b,
  CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INTEGER)
    AS hamming
FROM fpbits a JOIN fpbits b
  ON a.i = b.i AND a.media_id < b.media_id
GROUP BY 1, 2 HAVING hamming <= {_MM_FP_MAXH}
"""


def _q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    return multimodal.audio_fingerprint(au, n_bits=_MM_FP_BITS)


def _q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    return multimodal.audio_near_dup_pairs(
        au, max_hamming=_MM_FP_MAXH, n_bits=_MM_FP_BITS
    )


_AUDIO_DEDUP_SQL = f"""
WITH RECURSIVE {_MM_IDS_CTE},
{_MM_AU_SAMPLES_CTE},
{_MM_FP_SUMS_CTE},
prs AS (
  SELECT a.media_id AS doc_a, b.media_id AS doc_b
  FROM fpbits a JOIN fpbits b
    ON a.i = b.i AND a.media_id < b.media_id
  GROUP BY 1, 2
  HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
    <= {_MM_FP_MAXH}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION SELECT doc_b, doc_a FROM prs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT media_id FROM ids
WHERE media_id NOT IN (
  SELECT src FROM reach GROUP BY src HAVING least(src, min(dst)) <> src)
"""


def _q_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = multimodal.synthetic_audio(
        _mm_ids(spark, sf_dir), _MM_AU_N, _MM_AU_RATE, _MM_AU_CH
    )
    return multimodal.audio_dedup_corpus(
        au, max_hamming=_MM_FP_MAXH, n_bits=_MM_FP_BITS
    ).select("media_id")


# mm GIF frame decode — REAL LZW + compositing vs an ANALYTIC oracle.
# The fixture animation for seed s (multimodal.synthetic_gif_bytes) has
# palette entry i = ((7i)%256, (11i+3)%256, (13i+5)%256) and frame f
# paints pixel (x, y) with index (x + 2y + 5f + s) % 256; the Spark side
# decodes the real GIF89a bytes (variable-width LZW with mid-stream
# CLEARs, sub-block reassembly, full-canvas compositing), the DuckDB
# side recomputes the channel sums from the two formulas.  A wrong code
# width, reset, palette lookup, or frame index breaks the hash.

_MM_GIF_F, _MM_GIF_EVERY = 6, 2
_MM_GIF_IDX = f"((x + 2 * y + 5 * f + media_id) % 256)"


def _q_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    gifs = multimodal.synthetic_gifs(
        _mm_ids(spark, sf_dir), _MM_W, _MM_H, _MM_GIF_F
    )
    return multimodal.decode_gif_frames(gifs, every=_MM_GIF_EVERY)


_GIF_FRAMES_SQL = f"""
WITH {_MM_IDS_CTE},
fr AS (SELECT media_id, unnest(range(0, {_MM_GIF_F}, {_MM_GIF_EVERY})) AS f
       FROM ids),
px AS (SELECT media_id, f, {_MM_GIF_IDX} AS i
       FROM fr CROSS JOIN range({_MM_W}) xs(x) CROSS JOIN range({_MM_H}) ys(y))
SELECT media_id, CAST(f AS INTEGER) AS frame_i,
  CAST({_MM_W} AS INTEGER) AS width, CAST({_MM_H} AS INTEGER) AS height,
  CAST({_MM_GIF_F} AS INTEGER) AS n_frames,
  CAST(sum((7 * i) % 256) AS BIGINT) AS sum_r,
  CAST(sum((11 * i + 3) % 256) AS BIGINT) AS sum_g,
  CAST(sum((13 * i + 5) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY media_id, f
"""


# ---------------------------------------------------------------------------
# deterministic dataset split (salted-hash buckets, portable mode)

_SPLIT_SQL = f"""
SELECT doc_id,
  CASE WHEN b < 800000 THEN 'train'
       WHEN b < 900000 THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT doc_id,
        {portable_hash_sql_duckdb("concat('v1:', CAST(doc_id AS VARCHAR))")}
          % 1000000 AS b
      FROM documents)
"""


def _q_assign_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.splits import assign_split

    return assign_split(
        _t(spark, sf_dir, "documents").select("doc_id"),
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        hash_mode="portable",
    ).select("doc_id", "split")


# ---------------------------------------------------------------------------
# PII scrubbing: both engines inject synthetic contact info around
# documents.text, then the SAME lookaround-free regex chain (Java vs RE2)
# must redact identically — counts and cleaned text are hash-compared.

_PII_INJECT_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), "
    "'@example.com or 10.0.', CAST(doc_id % 256 AS STRING), '.7 call "
    "+1 555 123 44', lpad(CAST(doc_id % 100 AS STRING), 2, '0'), ' end')"
)
_PII_INJECT_DUCK = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com or 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7 call "
    "+1 555 123 44', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'), ' end')"
)


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_INJECT_SPARK).alias("text")
    )
    return pii.scrub_pii(docs).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "clean_text"
    )


def _pii_sql() -> str:
    from .operators.pii import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IP_TOKEN,
        IPV4_RE,
        PHONE_RE,
        PHONE_TOKEN,
    )

    def esc(p: str) -> str:
        # DuckDB single-quoted literals keep backslashes verbatim —
        # only quotes need escaping (doubling backslashes would turn
        # \d into a literal-backslash class member)
        return p.replace("'", "''")

    e, i, p = esc(EMAIL_RE), esc(IPV4_RE), esc(PHONE_RE)
    return f"""
WITH t0 AS (SELECT doc_id, {_PII_INJECT_DUCK} AS t FROM documents),
t1 AS (SELECT doc_id, t,
         CAST(len(regexp_extract_all(t, '{e}')) AS INTEGER) AS n_emails,
         regexp_replace(t, '{e}', '{EMAIL_TOKEN}', 'g') AS s FROM t0),
t2 AS (SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(s, '{i}')) AS INTEGER) AS n_ips,
         regexp_replace(s, '{i}', '{IP_TOKEN}', 'g') AS s FROM t1),
t3 AS (SELECT doc_id, n_emails, n_ips,
         CAST(len(regexp_extract_all(s, '{p}')) AS INTEGER) AS n_phones,
         regexp_replace(s, '{p}', '{PHONE_TOKEN}', 'g') AS s FROM t2)
SELECT doc_id, n_emails, n_ips, n_phones, s AS clean_text FROM t3
"""


# Gopher duplicate-line stats (word-separated for the oracle twin — the
# testdata text has no newlines; pytest covers the '\n' case).
_DUP_LINES_SQL = """
WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
           FROM documents),
c AS (SELECT doc_id, line, count(*) AS n, length(line) AS len
      FROM l GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(n) AS INTEGER) AS n_lines,
       CAST(count(*) AS INTEGER) AS n_distinct,
       CAST(sum(n * len) AS BIGINT) AS total_chars,
       round((sum(n) - count(*)) / sum(n), 6) AS dup_line_frac,
       CASE WHEN sum(n * len) > 0 THEN
         round(sum(CASE WHEN n > 1 THEN n * len ELSE 0 END)
               / sum(n * len), 6)
       ELSE 0.0 END AS dup_char_frac
FROM c GROUP BY doc_id
"""


def _q_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.duplicate_line_stats(
        _t(spark, sf_dir, "documents"), sep=" "
    )


# ---------------------------------------------------------------------------
# benchmark decontamination + per-domain corpus stats

_DECONTAM_SQL = f"""
WITH words AS ({_WORDS_CTE}),
csh AS ({_shingle_cte(3)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM csh GROUP BY doc_id),
bsh AS (SELECT doc_id AS bench_id, shingle FROM csh WHERE doc_id % 29 = 0),
co AS (
  SELECT c.doc_id, b.bench_id, count(*) AS common
  FROM csh c JOIN bsh b ON c.shingle = b.shingle
  GROUP BY 1, 2)
SELECT co.doc_id, bench_id, common,
       CAST(sz AS INTEGER) AS doc_shingles,
       round(common / sz, 6) AS overlap_frac
FROM co JOIN sizes s ON co.doc_id = s.doc_id
"""

_DECONTAM_CLEAN_SQL = f"""
WITH words AS ({_WORDS_CTE}),
csh AS ({_shingle_cte(3)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM csh GROUP BY doc_id),
bsh AS (SELECT doc_id AS bench_id, shingle FROM csh WHERE doc_id % 29 = 0),
dirty AS (
  SELECT DISTINCT c.doc_id
  FROM csh c JOIN bsh b ON c.shingle = b.shingle
  JOIN sizes s ON c.doc_id = s.doc_id
  GROUP BY c.doc_id, b.bench_id, s.sz
  HAVING count(*) / s.sz >= 0.5)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
"""

_DOMAIN_SQL = """
WITH w AS (SELECT source, lang, text, string_split(text, ' ') AS ws
           FROM documents)
SELECT source AS domain,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(ws)) AS BIGINT) AS total_words,
       count(DISTINCT lang) AS n_langs,
       round(CAST(sum(len(ws)) AS BIGINT) / count(*), 6) AS mean_words,
       round(CAST(sum(len(list_filter(ws, x -> length(x) <= 2)))
                  AS BIGINT)
             / CAST(sum(len(ws)) AS BIGINT), 6) AS short_word_frac
FROM w GROUP BY source
"""


def _bench_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.expr("doc_id % 29 = 0"))
        .select(F.col("doc_id").alias("bench_id"), "text")
    )


def _q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import decontam

    res = decontam.shingle_overlap(
        _t(spark, sf_dir, "documents"), _bench_df(spark, sf_dir), n=3
    )
    return res.select(
        "doc_id", "bench_id", "common", "doc_shingles",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )


def _q_decontam_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import decontam

    return decontam.decontaminate(
        _t(spark, sf_dir, "documents"),
        _bench_df(spark, sf_dir),
        n=3,
        threshold=0.5,
    ).select("doc_id")


def _q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.corpus_domain_stats(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# HTML extraction roundtrip (oracle-checked): both engines template HTML
# around documents.text; Spark runs the REAL boilerplate-strip pipeline
# (htmlpage.py) on the bytes, DuckDB computes what extraction must produce
# by construction.  A strip failure (nav/footer/script/link-farm text
# leaking, entity or <br>/heading mishandling) breaks the hash.

_HTML_ESC = (
    "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)

_HTML_TPL_EXPR = f"""
CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN concat(
    '<!DOCTYPE html><html><head><script>var x = 1;</script></head><body>',
    '<header><h1>Site</h1></header>',
    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>',
    '<main><h1>Doc &amp; Report ', CAST(doc_id AS STRING), '</h1><p>',
    {_HTML_ESC}, '</p></main><footer>(c) example</footer></body></html>')
  WHEN 1 THEN concat(
    '<html><body><div><a href="/1">one link</a> <a href="/2">two link</a>',
    '</div><p>Line one<br>Line two</p><div>', {_HTML_ESC},
    '</div></body></html>')
  WHEN 2 THEN concat(
    '<html><body><h2>Q&amp;A</h2><p>alpha <b>beta</b> &amp; gamma</p>',
    '<table><tr><td>', {_HTML_ESC},
    '</td><td>cell</td></tr></table></body></html>')
  ELSE concat('<html><head><style>.x {{}}</style></head><body>',
    '<nav><a href="/">Home</a></nav><footer>foot</footer></body></html>')
END
"""

_HTML_SQL = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(text, '[ \t\r\n\f\v]+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN concat('Doc & Report ', CAST(doc_id AS VARCHAR),
      CASE WHEN norm = '' THEN '' ELSE concat(chr(10), chr(10), norm) END)
    WHEN 1 THEN concat('Line one', chr(10), 'Line two',
      CASE WHEN norm = '' THEN '' ELSE concat(chr(10), chr(10), norm) END)
    WHEN 2 THEN concat('Q&A', chr(10), chr(10), 'alpha beta & gamma',
      CASE WHEN norm = '' THEN '' ELSE concat(chr(10), chr(10), norm) END,
      chr(10), chr(10), 'cell')
    ELSE ''
  END AS text,
  CAST(CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN 1 + (CASE WHEN norm = '' THEN 0 ELSE 1 END)
    WHEN 1 THEN 1 + (CASE WHEN norm = '' THEN 0 ELSE 1 END)
    WHEN 2 THEN 3 + (CASE WHEN norm = '' THEN 0 ELSE 1 END)
    ELSE 0
  END AS INT) AS n_blocks
FROM n
"""


def _q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template HTML around documents.text → run the real HTML extraction
    pipeline → (doc_id, text, n_blocks).  The DuckDB twin states the
    expected output analytically (boilerplate stripped by construction)."""
    from . import pipeline

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.expr(_HTML_TPL_EXPR), "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    extracted = pipeline.extract(pages)
    return extracted.select(
        F.expr("CAST(substring(url, 5) AS BIGINT)").alias("doc_id"),
        "text",
        "n_blocks",
    )


# ---------------------------------------------------------------------------
# extraction flagship (rows-only: the payload parse is a UDF, not SQL)

_FLAGSHIP_DOCS = 48
_FLAGSHIP_HTML = 24


def _pages_df(
    spark: SparkSession, n_docs: int, n_html: int = 0
) -> DataFrame:
    """Deterministic synthetic pages table (BASELINE.json input_hint shape:
    url, warc_ts, html:binary, text, lang) — built in-memory; no external
    data, byte-stable across runs/partitionings (fixtures.py)."""
    from pyspark.sql import types as T

    from . import fixtures

    rows = fixtures.generate_pages_rows(n_docs) + fixtures.generate_html_rows(
        n_html
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    data = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


def _q_extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship extraction pipeline, flattened to the byte-identity key
    space (url, page_i, block_i, line_i) — golden-checked in pytest against
    the pure-Python oracle; rows-only here (payload parse is non-SQL).
    Mixed corpus: synthetic-PDF payloads + real HTML bytes in ONE job."""
    from . import pipeline

    extracted = pipeline.extract(
        _pages_df(spark, _FLAGSHIP_DOCS, _FLAGSHIP_HTML)
    )
    return pipeline.flatten_lines(extracted)


def _q_extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run lineage metrics rollup (A5/R5): docs, pages, ocr ratio."""
    from . import pipeline

    extracted = pipeline.extract(
        _pages_df(spark, _FLAGSHIP_DOCS, _FLAGSHIP_HTML)
    )
    return extracted.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_pages").alias("pages"),
        F.sum("ocr_pages").alias("ocr_pages"),
        F.sum(F.when(F.col("status") == "COMPLETED", 1).otherwise(0)).alias(
            "completed"
        ),
    )


# ---------------------------------------------------------------------------
# C4/Gopher text gates, corpus-global line dedup, and the URL blocklist

_C4_SQL = """
WITH b AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM documents)
SELECT doc_id,
  CAST(len(ls) AS INTEGER) AS c4_n_lines,
  CAST(len(list_filter(ls, l -> regexp_matches(l, '[.!?"]\\s*\\z')))
       AS INTEGER) AS c4_punct_lines,
  CAST(len(regexp_extract_all(text, '[.!?]')) AS INTEGER) AS c4_n_sentences,
  contains(text, '{') AS c4_has_curly,
  contains(lower(text), 'lorem ipsum') AS c4_has_lorem,
  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
       w -> list_contains(string_split(lower(text), ' '), w)))
       AS INTEGER) AS c4_n_stop8,
  CAST(len(list_filter(ls, l -> regexp_matches(l, '[.!?"]\\s*\\z')))
       AS DOUBLE) / len(ls) AS c4_punct_line_frac
FROM b
"""


def _q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = text_analysis.c4_rules(_t(spark, sf_dir, "documents"))
    return res.select(
        "doc_id", "c4_n_lines", "c4_punct_lines", "c4_n_sentences",
        "c4_has_curly", "c4_has_lorem", "c4_n_stop8", "c4_punct_line_frac",
    )


# Corpus-global duplicate-line removal, exercised hard: the corpus is
# unioned with a full copy of itself (ids + 1e6), so EVERY eligible line
# is a cross-document duplicate — originals (lower ids) must win, copies
# must lose exactly their >= 15-char lines.  Winner = lexicographic min
# (doc_id, li), expressed in SQL as a two-step min (min doc per digest,
# then min li within that doc).
def _line_dedup_sql(source: str, delim: str) -> str:
    """Line/paragraph corpus-dedup oracle, parameterized by the unit
    delimiter (chr(10) = C4 lines, chr(10)||chr(10) = RefinedWeb
    paragraphs) and the corpus CTE body."""
    return f"""
WITH corpus AS ({source}),
ls AS (SELECT doc_id, string_split(coalesce(text, ''), {delim}) AS ls
       FROM corpus),
lines AS (
  SELECT doc_id, s.li, s.line FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ls)),
                                 i -> {{'li': i - 1, 'line': ls[i]}})) AS s
    FROM ls)),
dig AS (
  SELECT doc_id, li, line,
         CASE WHEN length(line) >= 15 THEN md5(line) END AS digest
  FROM lines),
w1 AS (SELECT digest, min(doc_id) AS d FROM dig
       WHERE digest IS NOT NULL GROUP BY digest),
w AS (SELECT g.digest, g.d, min(x.li) AS p
      FROM w1 g JOIN dig x ON x.digest = g.digest AND x.doc_id = g.d
      GROUP BY g.digest, g.d),
flagged AS (
  SELECT dg.doc_id, dg.li, dg.line,
         (w.digest IS NULL OR (w.d = dg.doc_id AND w.p = dg.li)) AS keep
  FROM dig dg LEFT JOIN w ON dg.digest = w.digest)
SELECT doc_id,
  COALESCE(string_agg(line, {delim} ORDER BY li) FILTER (WHERE keep), '')
    AS clean_text,
  CAST(count(*) AS INTEGER) AS n_lines,
  CAST(count(*) FILTER (WHERE keep) AS INTEGER) AS n_lines_kept
FROM flagged GROUP BY doc_id
"""


_LINE_DEDUP_SQL = _line_dedup_sql(
    """SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents""",
    "chr(10)",
)


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.corpus_line_dedup(corpus)


# Paragraph-granularity twin (RefinedWeb/MassiveText duplicate-paragraph
# removal): both engines inject paragraph breaks deterministically
# (". " → "." + blank line) and dedup on the "\n\n" unit — same winner
# rule, bigger blocks.  The corpus ∪ copy trick again makes every
# eligible paragraph a cross-doc duplicate, exercising winners/losers.
_PARA_INJECT_DUCK = (
    "replace(text, '. ', '.' || chr(10) || chr(10))"
)

_PARA_DEDUP_SQL = _line_dedup_sql(
    f"""SELECT doc_id, {_PARA_INJECT_DUCK} AS text FROM documents
  UNION ALL SELECT doc_id + 1000000, {_PARA_INJECT_DUCK} AS text
  FROM documents""",
    "chr(10) || chr(10)",
)


def _q_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "replace(text, '. ', concat('.', char(10), char(10)))"
        ).alias("text"),
    )
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.corpus_line_dedup(corpus, delimiter="\n\n")


# Boilerplate-line filter + report twins.  The synthetic docs share no
# natural lines (measured: every sentence is corpus-unique at sf0.01), so
# both engines build the SAME frequency structure deterministically:
# sentence-split each doc (". " → "." + newline), append one universal
# footer line (document frequency = corpus size → removed everywhere) and
# one short "ok" line (high frequency but < min_line_chars → the
# NULL-digest keep path), then copy every third doc under doc_id +
# 1000000 so its sentences reach doc frequency 2 (removed from original
# AND copy) while the other two thirds stay at frequency 1 (kept).
_BP_INJECT_DUCK = (
    "replace(text, '. ', '.' || chr(10)) || chr(10) || "
    "'subscribe to our newsletter today' || chr(10) || 'ok'"
)

_BP_CORPUS_DUCK = f"""SELECT doc_id, {_BP_INJECT_DUCK} AS text FROM documents
  UNION ALL SELECT doc_id + 1000000, {_BP_INJECT_DUCK} AS text
  FROM documents WHERE doc_id % 3 = 0"""

_BP_FILTER_SQL = f"""
WITH corpus AS ({_BP_CORPUS_DUCK}),
ls AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
       FROM corpus),
lines AS (
  SELECT doc_id, s.li, s.line FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ls)),
                                 i -> {{'li': i - 1, 'line': ls[i]}})) AS s
    FROM ls)),
dig AS (
  SELECT doc_id, li, line,
         CASE WHEN length(line) >= 5 THEN md5(line) END AS digest
  FROM lines),
hot AS (
  SELECT digest FROM (
    SELECT DISTINCT digest, doc_id FROM dig WHERE digest IS NOT NULL)
  GROUP BY digest HAVING count(*) >= 2),
flagged AS (
  SELECT dg.doc_id, dg.li, dg.line, (h.digest IS NULL) AS keep
  FROM dig dg LEFT JOIN hot h ON dg.digest = h.digest)
SELECT doc_id,
  COALESCE(string_agg(line, chr(10) ORDER BY li) FILTER (WHERE keep), '')
    AS clean_text,
  CAST(count(*) AS INTEGER) AS n_lines,
  CAST(count(*) FILTER (WHERE keep) AS INTEGER) AS n_lines_kept
FROM flagged GROUP BY doc_id
"""

_BP_LINES_SQL = f"""
WITH corpus AS ({_BP_CORPUS_DUCK}),
ls AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
       FROM corpus),
lines AS (
  SELECT doc_id, s.line FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ls)),
                                 i -> {{'line': ls[i]}})) AS s
    FROM ls)),
dig AS (
  SELECT doc_id, line, md5(line) AS digest FROM lines
  WHERE length(line) >= 5),
perdoc AS (
  SELECT digest, doc_id, count(*) AS c, min(line) AS line
  FROM dig GROUP BY digest, doc_id)
SELECT min(line) AS line,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(c) AS BIGINT) AS n_occurrences
FROM perdoc GROUP BY digest HAVING count(*) >= 2
"""

_BP_INJECT_SPARK = (
    "concat(replace(text, '. ', concat('.', char(10))), char(10), "
    "'subscribe to our newsletter today', char(10), 'ok')"
)


def _bp_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_BP_INJECT_SPARK).alias("text")
    )
    return docs.unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )


def _q_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.corpus_boilerplate_filter(
        _bp_corpus(spark, sf_dir), min_docs=2, min_line_chars=5
    )


def _q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.boilerplate_lines(
        _bp_corpus(spark, sf_dir), min_docs=2, min_line_chars=5
    )


_DOMAIN_FILTER_SQL = """
WITH u AS (
  SELECT doc_id,
    concat('https://', CASE WHEN doc_id % 7 = 0 THEN 'ads.' ELSE '' END,
           source, '.example.com/doc/', doc_id) AS url
  FROM documents),
h AS (SELECT doc_id, url,
        lower(regexp_extract(url,
          '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host
      FROM u)
SELECT doc_id, host FROM h
WHERE NOT (host = 'src3.example.com'
           OR suffix(host, '.src3.example.com')
           OR host = 'src7.example.com'
           OR suffix(host, '.src7.example.com'))
"""


def _q_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    with_url = docs.select(
        "doc_id",
        F.expr(
            "concat('https://', CASE WHEN doc_id % 7 = 0 THEN 'ads.' "
            "ELSE '' END, source, '.example.com/doc/', doc_id)"
        ).alias("url"),
    )
    kept = urls.filter_blocked_domains(
        with_url, ["src3.example.com", "src7.example.com"], keep_host=True
    )
    return kept.select("doc_id", F.col("_host").alias("host"))


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.normalize_text(
        _t(spark, sf_dir, "documents")
    ).select("doc_id", "norm_text")


_NORMALIZE_SQL = (
    "SELECT doc_id, "
    + text_analysis.normalize_text_sql_duckdb("text")
    + " AS norm_text FROM documents"
)

# per-domain cap: same synthetic url shape as url_domain_filter
_CAP_URL_EXPR = (
    "concat('https://', CASE WHEN doc_id % 7 = 0 THEN 'ads.' "
    "ELSE '' END, source, '.example.com/doc/', doc_id)"
)


def _q_cap_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CAP_URL_EXPR).alias("url")
    )
    return text_analysis.cap_per_domain(docs, 5).select("doc_id", "url")


_CAP_DOMAIN_SQL = f"""
WITH u AS (SELECT doc_id, {_CAP_URL_EXPR} AS url FROM documents),
r AS (SELECT doc_id, url, row_number() OVER (
        PARTITION BY {urls.host_of_sql_duckdb("url")}
        ORDER BY doc_id) AS rn FROM u)
SELECT doc_id, url FROM r WHERE rn <= 5
"""


# sampling hashes an operation-prefixed domain ("sample:<salt>") so a
# sample-then-split chain at the same salt stays independent (see
# splits.deterministic_sample)
_HB = portable_hash_sql_duckdb(
    "concat('sample:v1:', CAST(doc_id AS VARCHAR))"
)

_SAMPLE_SQL = f"""
SELECT doc_id FROM (SELECT doc_id, {_HB} % 1000000 AS b FROM documents)
WHERE b < 370000
"""


def _q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.splits import deterministic_sample

    return deterministic_sample(
        _t(spark, sf_dir, "documents").select("doc_id"),
        0.37,
        hash_mode="portable",
    )


_STRATIFIED_SQL = f"""
SELECT doc_id, source
FROM (SELECT doc_id, source, {_HB} % 1000000 AS b FROM documents)
WHERE b < CASE source WHEN 'src3' THEN 1000000 WHEN 'src7' THEN 250000
          WHEN 'src11' THEN 0 ELSE 50000 END
"""


def _q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.splits import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        {"src3": 1.0, "src7": 0.25, "src11": 0.0},
        strata_col="source",
        hash_mode="portable",
        default_rate=0.05,
    )


# Sequence-packing manifest (concat-and-chunk, seq_len=512): a global
# integer running sum (two-phase distributed prefix on the Spark side)
# + per-doc chunk explode; all integer arithmetic.  The window sum is
# CAST to BIGINT — DuckDB widens sum(BIGINT) to HUGEINT (arrow
# decimal128(38,0)) which would propagate through greatest/least into
# doc_start/doc_end and fail the driver's typed value hash (the r3 red
# row; CLAUDE.md "DuckDB HUGEINT sums" trap).
_PACK_SQL = """
WITH t AS (SELECT doc_id, len(string_split(coalesce(text, ''), ' ')) AS n_tok
           FROM documents),
o AS (SELECT doc_id, n_tok,
        CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off
      FROM t),
c AS (SELECT doc_id, n_tok, off,
        unnest(generate_series(CAST(floor(off / 512) AS BIGINT),
                               CAST(floor((off + n_tok - 1) / 512)
                                    AS BIGINT))) AS chunk_id
      FROM o)
SELECT chunk_id, doc_id,
       CAST(greatest(chunk_id * 512 - off, 0) AS BIGINT) AS doc_start,
       CAST(least((chunk_id + 1) * 512 - off, n_tok) AS BIGINT) AS doc_end,
       CAST(n_tok AS INTEGER) AS n_tok
FROM c
"""


def _q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.packing import pack_sequences

    # bucket_size=64 so even sf0.01's 500 dense ids exercise the real
    # two-phase prefix (8 buckets), not a degenerate single bucket
    return pack_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, bucket_size=64
    )


# Tokenizer-export join: manifest slices → per-chunk token stream.  The
# oracle re-derives the manifest inline (same casts as _PACK_SQL) and
# concatenates slices in doc_id order via list(... ORDER BY doc_id).
_PACK_EXPORT_SQL = """
WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks,
                  len(string_split(coalesce(text, ''), ' ')) AS n_tok
           FROM documents),
o AS (SELECT doc_id, toks, n_tok,
        CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off
      FROM t),
c AS (SELECT doc_id, toks, n_tok, off,
        unnest(generate_series(CAST(floor(off / 512) AS BIGINT),
                               CAST(floor((off + n_tok - 1) / 512)
                                    AS BIGINT))) AS chunk_id
      FROM o),
s AS (SELECT chunk_id, doc_id,
        toks[CAST(greatest(chunk_id * 512 - off, 0) + 1 AS BIGINT):
             CAST(least((chunk_id + 1) * 512 - off, n_tok) AS BIGINT)]
          AS piece
      FROM c)
SELECT chunk_id,
       array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')
         AS token_str,
       CAST(len(flatten(list(piece ORDER BY doc_id))) AS INTEGER) AS n_tok
FROM s GROUP BY chunk_id
"""


def _q_pack_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable serialization of the packed token stream: the raw
    ``token_ids array<string>`` output is pytest-pinned
    (tests/test_packing.py); the driver's canonicalizer cannot sort list
    cells, so the contract row joins the chunk's tokens back to a single
    space-separated string (lossless here — the whitespace stand-in
    tokenizer split on the same delimiter)."""
    from .operators.packing import pack_export, pack_sequences

    docs = _t(spark, sf_dir, "documents")
    manifest = pack_sequences(docs, seq_len=512, bucket_size=64)
    return pack_export(manifest, docs).select(
        "chunk_id",
        F.array_join("token_ids", " ").alias("token_str"),
        "n_tok",
    )


# Precomputed-token-array packing (the tokens_col path): the tokenize→
# pack pipeline over an EOS-terminated token stream (`</s>` appended per
# document — the document-separator practice packing exists for).  Token
# counts now come from the ARRAY (n_tok = words + 1), so this exercises
# the counts/slices seam the whitespace rows cannot; the BPE composition
# (bpe_apply tokens driving the same pair) is pytest-pinned
# (tests/test_training_ops.py::TestSequencePacking).
_PACK_TOKENS_SQL = """
WITH t AS (SELECT doc_id,
                  list_append(string_split(coalesce(text, ''), ' '),
                              '</s>') AS toks
           FROM documents),
n AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t),
o AS (SELECT doc_id, toks, n_tok,
        CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off
      FROM n),
c AS (SELECT doc_id, toks, n_tok, off,
        unnest(generate_series(CAST(floor(off / 512) AS BIGINT),
                               CAST(floor((off + n_tok - 1) / 512)
                                    AS BIGINT))) AS chunk_id
      FROM o),
s AS (SELECT chunk_id, doc_id,
        toks[CAST(greatest(chunk_id * 512 - off, 0) + 1 AS BIGINT):
             CAST(least((chunk_id + 1) * 512 - off, n_tok) AS BIGINT)]
          AS piece
      FROM c)
SELECT chunk_id,
       array_to_string(flatten(list(piece ORDER BY doc_id)), ' ')
         AS token_str,
       CAST(len(flatten(list(piece ORDER BY doc_id))) AS INTEGER) AS n_tok
FROM s GROUP BY chunk_id
"""


def _q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.packing import pack_export, pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.split(F.coalesce(F.col("text"), F.lit("")), " "),
            F.array(F.lit("</s>")),
        ).alias("toks"),
    )
    manifest = pack_sequences(
        docs, seq_len=512, bucket_size=64, tokens_col="toks"
    )
    return pack_export(manifest, docs, tokens_col="toks").select(
        "chunk_id",
        F.array_join("token_ids", " ").alias("token_str"),
        "n_tok",
    )


# Substring-granularity dedup (Lee et al. 2022 semantics, windowed-digest
# re-expression — operators/dedup.py corpus_span_dedup).  Same hard
# exercise as dedup_line_corpus: the corpus unioned with a full copy of
# itself (ids + 1e6) makes every >= WIDTH-token document a cross-document
# duplicate — originals (lower ids) must keep everything, copies must
# lose exactly their windowed region [0, n_tokens); natural within-corpus
# repetition is exercised on top.  Loser = any window occurrence that is
# not the lexicographic-min (doc_id, pos) for its digest — expressed in
# SQL as row_number() >= 2 over (digest ORDER BY doc_id, pos).
_SPAN_W = 20
_SPAN_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
  UNION ALL SELECT doc_id + 1000000, coalesce(text, '') FROM documents),
t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
o0 AS (SELECT doc_id, unnest(range(0, len(tk) - {_SPAN_W - 1})) AS pos, tk
       FROM t WHERE len(tk) >= {_SPAN_W}),
occ AS (SELECT doc_id, pos,
          md5(array_to_string(list_slice(tk, pos + 1, pos + {_SPAN_W}),
                              ' ')) AS dg
        FROM o0),
rn AS (SELECT doc_id, pos,
         row_number() OVER (PARTITION BY dg ORDER BY doc_id, pos) AS rn
       FROM occ),
losers AS (SELECT doc_id, pos FROM rn WHERE rn >= 2),
brk AS (SELECT doc_id, pos,
          CASE WHEN pos > coalesce(max(pos + {_SPAN_W}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS b
        FROM losers),
isl AS (SELECT doc_id, pos, sum(b) OVER (
          PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
          AS island
        FROM brk),
spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + {_SPAN_W} AS e
          FROM isl GROUP BY doc_id, island),
sp_doc AS (SELECT doc_id, count(*) AS n_spans, sum(e - s) AS removed
           FROM spans GROUP BY doc_id),
tok0 AS (SELECT doc_id, unnest(range(0, len(tk))) AS i, tk FROM t),
tok AS (SELECT doc_id, i, tk[i + 1] AS w FROM tok0),
kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok
         LEFT JOIN spans ON spans.doc_id = tok.doc_id
                        AND tok.i >= spans.s AND tok.i < spans.e
         WHERE spans.s IS NULL),
agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text
        FROM kept GROUP BY doc_id)
SELECT t.doc_id,
  coalesce(agg.clean_text, '') AS clean_text,
  CAST(len(t.tk) AS INTEGER) AS n_tokens,
  CAST(len(t.tk) - coalesce(sp_doc.removed, 0) AS INTEGER)
    AS n_tokens_kept,
  CAST(coalesce(sp_doc.n_spans, 0) AS INTEGER) AS n_dup_spans
FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN sp_doc USING (doc_id)
"""


def _q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.corpus_span_dedup(corpus, width=_SPAN_W)


# The span view itself (plain corpus — its natural window repetition):
# (doc_id, span_start, span_end) merged half-open loser intervals.
_DUP_SPANS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk
           FROM documents),
o0 AS (SELECT doc_id, unnest(range(0, len(tk) - {_SPAN_W - 1})) AS pos, tk
       FROM t WHERE len(tk) >= {_SPAN_W}),
occ AS (SELECT doc_id, pos,
          md5(array_to_string(list_slice(tk, pos + 1, pos + {_SPAN_W}),
                              ' ')) AS dg
        FROM o0),
rn AS (SELECT doc_id, pos,
         row_number() OVER (PARTITION BY dg ORDER BY doc_id, pos) AS rn
       FROM occ),
losers AS (SELECT doc_id, pos FROM rn WHERE rn >= 2),
brk AS (SELECT doc_id, pos,
          CASE WHEN pos > coalesce(max(pos + {_SPAN_W}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS b
        FROM losers),
isl AS (SELECT doc_id, pos, sum(b) OVER (
          PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
          AS island
        FROM brk)
SELECT doc_id,
       CAST(min(pos) AS INTEGER) AS span_start,
       CAST(max(pos) + {_SPAN_W} AS INTEGER) AS span_end
FROM isl GROUP BY doc_id, island
"""


def _q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.duplicate_spans(
        _t(spark, sf_dir, "documents"), width=_SPAN_W
    )


# CCNet-style LM quality gate (operators/lm.py): Laplace-smoothed unigram
# trained on HALF the corpus (doc_id % 2 = 0 — the "clean reference"),
# every document scored, so odd docs exercise real out-of-vocab tokens.
# Determinism contract: integer-exact division operands, per-doc sum =
# sorted sequential fold (list_reduce over list(lp ORDER BY pos); Spark's
# extra 0.0 init is exact because 0.0 + x == x for every x != -0.0, and
# smoothing makes every logprob strictly negative).  The HUGEINT sum is
# CAST to BIGINT (the CLAUDE.md driver-parity trap).  mean_logprob is
# rounded to 9 decimals on BOTH engines: the JVM's ln() intrinsic
# disagrees with glibc/DuckDB by 1 ulp on ~5% of operands (measured r4 —
# the r3 "ln bit-identical" claim was an artifact of this corpus's tiny
# 31-token vocabulary), and per-token 1-ulp noise absorbs to ~1e-16 in
# the mean, seven orders below the rounding grain.
_LM_SCORE_SQL = """
WITH t AS (SELECT doc_id,
                  string_split(lower(coalesce(text, '')), ' ') AS tk
           FROM documents),
tok0 AS (SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM t),
tok AS (SELECT doc_id, pos, tk[pos + 1] AS w FROM tok0),
train AS (SELECT w, count(*) AS c FROM tok
          WHERE doc_id % 2 = 0 GROUP BY w),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM train),
j AS (SELECT tok.doc_id, tok.pos,
        ln((coalesce(train.c, 0) + 1) / (tot.n + tot.v + 1)) AS lp,
        (train.c IS NULL) AS oov
      FROM tok LEFT JOIN train ON tok.w = train.w CROSS JOIN tot),
agg AS (SELECT doc_id,
          list(lp ORDER BY pos) AS lps,
          count(*) AS n_tokens,
          count(*) FILTER (WHERE oov) AS n_oov
        FROM j GROUP BY doc_id)
SELECT doc_id,
  CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(n_oov AS INTEGER) AS n_oov,
  round(list_reduce(lps, (a, x) -> a + x) / n_tokens, 9) AS mean_logprob_r
FROM agg
"""


def _q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import lm

    docs = _t(spark, sf_dir, "documents")
    counts = lm.unigram_counts(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.lm_score(docs, counts).select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round("mean_logprob", 9).alias("mean_logprob_r"),
    )


# Supervised log-odds quality classifier (operators/classifier.py, the
# FineWeb-Edu gate shape): positives = doc_id % 3 = 0, negatives =
# doc_id % 3 = 1, every document scored — the % 3 = 2 docs exercise real
# out-of-vocab tokens.  Same fold-determinism contract as the LM gate;
# mean_log_odds rounded to 9 decimals on both engines (the ln() 1-ulp
# trap above; per-token w = lnA − lnB can carry 2 ulps, still ~1e-16
# after the mean).
_CLS_SCORE_SQL = """
WITH t AS (SELECT doc_id,
                  string_split(lower(coalesce(text, '')), ' ') AS tk
           FROM documents),
tok0 AS (SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM t),
tok AS (SELECT doc_id, pos, tk[pos + 1] AS w FROM tok0),
cpos AS (SELECT w, count(*) AS c FROM tok WHERE doc_id % 3 = 0 GROUP BY w),
cneg AS (SELECT w, count(*) AS c FROM tok WHERE doc_id % 3 = 1 GROUP BY w),
counts AS (SELECT coalesce(cpos.w, cneg.w) AS w,
                  coalesce(cpos.c, 0) AS cp, coalesce(cneg.c, 0) AS cn
           FROM cpos FULL OUTER JOIN cneg ON cpos.w = cneg.w),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
               CAST(sum(cn) AS BIGINT) AS nn, count(*) AS v FROM counts),
j AS (SELECT tok.doc_id, tok.pos,
        ln((coalesce(counts.cp, 0) + 1) / (tot.np + tot.v + 1))
      - ln((coalesce(counts.cn, 0) + 1) / (tot.nn + tot.v + 1)) AS lo,
        (counts.w IS NULL) AS oov
      FROM tok LEFT JOIN counts ON tok.w = counts.w CROSS JOIN tot),
agg AS (SELECT doc_id,
          list(lo ORDER BY pos) AS los,
          count(*) AS n_tokens,
          count(*) FILTER (WHERE oov) AS n_oov
        FROM j GROUP BY doc_id)
SELECT doc_id,
  CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(n_oov AS INTEGER) AS n_oov,
  round(list_reduce(los, (a, x) -> a + x) / n_tokens, 9) AS mean_log_odds_r
FROM agg
"""


def _q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import classifier

    docs = _t(spark, sf_dir, "documents")
    counts = classifier.class_token_counts(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 == 1),
    )
    return classifier.classifier_score(docs, counts).select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round("mean_log_odds", 9).alias("mean_log_odds_r"),
    )


# Hour-bucketed event rollup — the batch twin of the watermarked
# streaming window (streaming.stream_crawl_metrics): same tumbling
# hour-on-event-time semantics over the `events` table.  Buckets are the
# epoch-hour INTEGER (floor(epoch/3600)) rather than a rendered
# timestamp, so the boundary is session-timezone-proof in both engines
# (the io.write_extracted warc_day discipline); min/max of doubles are
# order-independent, so the row hashes are stable under any partitioning
# (a sum of doubles would not be).
_EVENTS_HOUR_SQL = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS epoch_hour,
       event_type,
       CAST(count(*) AS INTEGER) AS n_events,
       CAST(count(DISTINCT user_id) AS INTEGER) AS n_users,
       min(value) AS v_min,
       max(value) AS v_max
FROM events GROUP BY 1, 2
"""


def _q_events_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "epoch_hour",
            F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("bigint"),
        )
        .groupBy("epoch_hour", "event_type")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.count_distinct("user_id").cast("int").alias("n_users"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


# ---------------------------------------------------------------------------
# token-budget mixture (operators/splits.token_budget_sample): the
# Dolma/Pile "N tokens per source" recipe.  Keep rule: a document
# survives iff the token count of the docs hash-ranked before it in its
# stratum is still under the stratum budget (boundary doc kept — ≤ 1 doc
# overshoot, the documented contract).  Pure integer arithmetic, so the
# kept set is engine-exact; the oracle states the rule as one per-source
# window (the Spark side distributes it as the two-phase prefix sum) —
# with the HUGEINT window sum CAST to BIGINT, the CLAUDE.md trap.
_TOK_BUDGET = {"src0": 700, "src1": 100, "src2": 9999}

_TOK_BUDGET_SQL = f"""
WITH t AS (SELECT doc_id, source,
                  len(string_split(coalesce(text, ''), ' ')) AS n_tok,
                  {portable_hash_sql_duckdb(
                      chr(39) + 'tokbudget:v1:' + chr(39)
                      + " || CAST(doc_id AS VARCHAR)")} AS h
           FROM documents),
o AS (SELECT doc_id, source,
        CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS off
      FROM t)
SELECT doc_id, source FROM o
WHERE off < (CASE source {" ".join(
    f"WHEN '{s}' THEN {b}" for s, b in _TOK_BUDGET.items())} ELSE 0 END)
"""


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import splits

    res = splits.token_budget_sample(
        _t(spark, sf_dir, "documents"),
        _TOK_BUDGET,
        hash_mode="portable",
        default_budget=0,
    )
    return res.select("doc_id", "source")


# ---------------------------------------------------------------------------
# deterministic corpus sharding (operators/splits.shard_corpus): the
# training-export global pseudo-shuffle.  shard = portable-hash %
# n_shards; seq = 0-based rank within the shard under (hash, id) order.
# The oracle states the rank as one per-shard window; the Spark side
# distributes it as the two-phase (bucketed local rank + broadcast base
# offsets) prefix pattern — identical output by construction.

_SHARD_N = 16

_SHARD_SQL = f"""
WITH h AS (SELECT doc_id,
                  {portable_hash_sql_duckdb(
                      chr(39) + 'shard:v1:' + chr(39)
                      + " || coalesce(CAST(doc_id AS VARCHAR), '')")} AS h
           FROM documents)
SELECT doc_id, CAST(h % {_SHARD_N} AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {_SHARD_N}
                               ORDER BY h, doc_id) - 1 AS BIGINT) AS seq
FROM h
"""


def _q_shard_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import splits

    return splits.shard_corpus(
        _t(spark, sf_dir, "documents").select("doc_id"),
        _SHARD_N,
        hash_mode="portable",
        n_buckets_log2=6,
    )


# ---------------------------------------------------------------------------
# hashed document embeddings (operators/embed.py): feature-hashing TF
# vectors, L2-normalized.  Parity contract: bucket counts are exact small
# integers in float64, the norm is a sequential index-order fold (DuckDB
# list_reduce == Spark aggregate(0D, +) because 0.0 + x == x), and
# sqrt/division are correctly rounded — the double vectors hash
# bit-identically.  dim=16 keeps the O(dim·n_tokens) oracle lambda cheap
# at sf0.01 (and exercises the 'hof' side of the auto flip).

_EMB_DIM = 16


def _emb_bucket_duck() -> str:
    return f"({portable_hash_sql_duckdb(chr(39) + 'emb:' + chr(39) + ' || t')} % {_EMB_DIM})"


_EMBED_CTE = f"""
t AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS tk
      FROM documents),
hb AS (SELECT doc_id, len(tk) AS n_tokens,
              list_transform(tk, t -> {_emb_bucket_duck()}) AS hs FROM t),
c AS (SELECT doc_id, n_tokens,
             list_transform(range(0, {_EMB_DIM}),
               i -> CAST(len(list_filter(hs, h -> h = i)) AS DOUBLE)) AS cnt
      FROM hb),
nn AS (SELECT doc_id, n_tokens, cnt,
              sqrt(list_reduce(list_transform(cnt, v -> v * v),
                   (a, x) -> a + x)) AS nrm FROM c),
emb AS (SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, nrm AS norm,
               CASE WHEN nrm = 0 THEN cnt
                    ELSE list_transform(cnt, v -> v / nrm) END AS embedding
        FROM nn)
"""

_EMBED_SQL = f"""
WITH {_EMBED_CTE}
SELECT doc_id, n_tokens, norm,
       md5(array_to_string(list_transform(embedding,
             v -> CAST(round(v * norm) AS BIGINT)), ',')) AS embedding_md5
FROM emb
"""


def _q_hashed_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable serialization of the hashed embedding: the raw
    ``array<double>`` column is pytest-pinned (tests/test_embed.py) but
    the driver's canonicalizer sorts every output column through pandas
    ``factorize``, which cannot hash list cells — so the contract row
    emits ``embedding_md5`` instead.  The digest is taken over the
    EXACT pre-normalization integer counts (``round(v * norm)`` undoes
    the division bit-for-bit: counts are exact small integers, sqrt and
    ``/`` are IEEE correctly rounded, so ``v * norm`` is within rounding
    distance of the true integer in both engines).  ``norm`` itself is
    sqrt-of-exact-integer-sum — bit-identical cross-engine, safe
    unrounded (CLAUDE.md transcendental policy: only ln/exp need
    round-9)."""
    from .operators import embed

    emb = embed.hashed_embedding(
        _t(spark, sf_dir, "documents"),
        dim=_EMB_DIM,
        hash_mode="portable",
        strategy="hof",
    )
    counts = F.transform(
        F.col("embedding"),
        lambda v: F.round(v * F.col("norm"), 0).cast("bigint"),
    )
    return emb.select(
        "doc_id",
        "n_tokens",
        "norm",
        F.md5(F.array_join(counts, ",")).alias("embedding_md5"),
    )


# Composed SemDeDup-shaped pipeline: hashed embeddings → hyperplane-bucket
# cosine pairs (the sim_near_dup plan over text instead of a shipped
# embeddings table).  Threshold 0.99 sits in a measured gap of the sf0.01
# cosine distribution (nearest pair 0.9903), so the ≥-filter can't flip on
# engine float noise; cos_r is rounded to 6 like every sim_* pair row.
_EMB_PLANES = 16
_EMB_SIGNS = similarity.plane_signs(_EMB_PLANES, _EMB_DIM)
_EMB_W_LIT = (
    "["
    + ", ".join(
        "[" + ", ".join(f"{s}" for s in row) + "]" for row in _EMB_SIGNS
    )
    + "]"
)

_EMB_SIG_EXPR = f"""
CAST(list_aggregate(list_transform(generate_series(1, {_EMB_PLANES}), j ->
  CASE WHEN list_aggregate(list_transform(generate_series(1, {_EMB_DIM}),
    i -> embedding[i]::DOUBLE * W[j][i]), 'sum') > 0
  THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE CAST(0 AS BIGINT) END),
  'sum') AS BIGINT)
"""

_SEM_PAIRS_SQL = f"""
WITH {_EMBED_CTE},
wm AS (SELECT {_EMB_W_LIT} AS W),
sig AS (SELECT doc_id, embedding, {_EMB_SIG_EXPR} AS sig
        FROM emb CROSS JOIN wm),
banded AS (
  SELECT doc_id, embedding, 0 AS band, sig & 255 AS key FROM sig
  UNION ALL SELECT doc_id, embedding, 1, sig >> 8 FROM sig),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.embedding AS va, b.embedding AS vb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, round(cos, 6) AS cos_r
FROM (SELECT doc_a, doc_b, {_cos_duck('va', 'vb')} AS cos FROM pairs)
WHERE cos >= 0.99
"""


def _q_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import embed

    res = embed.semantic_near_dup(
        _t(spark, sf_dir, "documents"),
        dim=_EMB_DIM,
        threshold=0.99,
        planes=_EMB_PLANES,
        signs=_EMB_SIGNS,
        hash_mode="portable",
        strategy="hof",
    )
    return res.select("doc_a", "doc_b", F.round("cos", 6).alias("cos_r"))


# ---------------------------------------------------------------------------
# Random projection (JL dim-reduce, operators/embed.py).  The ±1 sign
# matrix is generated ONCE at import (driver-side hashlib — deterministic,
# no Spark/DuckDB hashing needed) and inlined as a literal in BOTH
# engines; products are ±x (exact), folds are sequential index-order with
# a 0.0 init on both sides (DuckDB prepends 0.0 to its list_reduce), and
# the 1/sqrt(out_dim) scale is one correctly-rounded multiply — so the
# exploded (vec_id, j, value) rows hash-compare UNROUNDED.

_RP_IN, _RP_OUT = 64, 8


def _rp_sql() -> str:
    from .operators.embed import random_projection_matrix

    m = random_projection_matrix(_RP_IN, _RP_OUT)
    m_lit = (
        "["
        + ", ".join(
            "[" + ", ".join(f"{v!r}" for v in row) + "]" for row in m
        )
        + "]"
    )
    # the matrix literal must be HOISTED out of the lambda body (the
    # repo's inline-array rule applies to DuckDB too: inlined, the
    # 512-literal list rebuilds per element — measured 58 s vs < 1 s)
    return f"""
WITH mr AS (
  SELECT j, ({m_lit})[j] AS mrow
  FROM generate_series(1, {_RP_OUT}) AS g(j))
SELECT vec_id, CAST(mr.j AS INTEGER) AS j,
  list_reduce(
    [CAST(0 AS DOUBLE)] || list_transform(generate_series(1, {_RP_IN}),
      i -> mr.mrow[i] * CAST(embedding[i] AS DOUBLE)),
    (a, b) -> a + b)
  * (CAST(1 AS DOUBLE) / sqrt(CAST({_RP_OUT} AS DOUBLE))) AS value
FROM embeddings, mr
"""


_RP_SQL = _rp_sql()


def _q_random_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import embed

    rp = embed.random_project(
        _t(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        in_dim=_RP_IN,
        out_dim=_RP_OUT,
    )
    return rp.select(
        "vec_id", F.posexplode("rp").alias("j", "value")
    ).select("vec_id", (F.col("j") + 1).alias("j"), "value")


# ---------------------------------------------------------------------------
# outlink extraction + host web graph (operators/links.py)
#
# Same analytic-template strategy as extract_html: Spark builds HTML
# around documents.doc_id, runs the REAL link/metadata scan
# (htmlpage.scan_links via links.extract_outlinks), and DuckDB states
# the expected edges/metadata analytically — base-href resolution,
# implied anchor close, skipped schemes, chrome and nofollow flags are
# all exercised by construction.

_LINKS_URL_EXPR = (
    "concat('http://h', CAST(doc_id % 7 AS STRING), '.example.com/d/', "
    "CAST(doc_id AS STRING), '/index.html')"
)

_LINKS_TPL_EXPR = """
concat(
  '<!doctype html><html lang="en-US"><head><title>T',
  CAST(doc_id AS STRING), ' &amp; co</title>',
  '<meta name="description" content="Crawl page ',
  CAST(doc_id AS STRING), '">',
  '<meta name="robots" content="',
  CASE WHEN doc_id % 5 = 0 THEN 'noindex, nofollow'
       ELSE 'index, follow' END, '">',
  '<link rel="canonical" href="https://h', CAST(doc_id % 7 AS STRING),
  '.example.com/d/', CAST(doc_id AS STRING), '/">',
  CASE WHEN doc_id % 3 = 0 THEN concat('<base href="https://cdn',
    CAST(doc_id % 2 AS STRING), '.base.net/r/">') ELSE '' END,
  '<script>var trap = \\'<a href="http://fake.example/">x</a>\\';</script>',
  '</head><body><nav><a href="/menu">Menu</a></nav>',
  '<p><a href="https://ext', CAST(doc_id % 5 AS STRING), '.org/p/',
  CAST(doc_id AS STRING), '?x=1#s">ref &amp; ', CAST(doc_id AS STRING),
  '</a> <a href="/about">About us</a> <a href="more.html">More</a>',
  ' <a href="http://spam.example.net/x?id=', CAST(doc_id AS STRING),
  '" rel="nofollow sponsored">Ad</a>',
  '<a href="javascript:void(0)">js</a><a href="#top">top</a>',
  '<a href="mailto:a@b.example">m</a></p></body></html>')
"""

# The analytic edge CTE shared by all four oracles: d computes the
# per-doc parameters, l the five kept links per doc in document order
# (link_i 0=nav menu, 1=external ref, 2=/about, 3=more.html,
# 4=nofollow ad; javascript:/#fragment/mailto: never appear).
_LINKS_CTE = """
d AS (
  SELECT doc_id,
         CAST(doc_id % 7 AS VARCHAR) AS h,
         doc_id % 3 = 0 AS hb,
         CAST(doc_id % 2 AS VARCHAR) AS cb,
         CAST(doc_id % 5 AS VARCHAR) AS ek
  FROM documents
),
l AS (
  SELECT doc_id,
    CAST(li.link_i AS INT) AS link_i,
    'h' || h || '.example.com' AS src_host,
    CASE li.link_i
      WHEN 0 THEN CASE WHEN hb THEN 'https://cdn' || cb || '.base.net/menu'
                       ELSE 'http://h' || h || '.example.com/menu' END
      WHEN 1 THEN 'https://ext' || ek || '.org/p/' || doc_id || '?x=1'
      WHEN 2 THEN CASE WHEN hb THEN 'https://cdn' || cb || '.base.net/about'
                       ELSE 'http://h' || h || '.example.com/about' END
      WHEN 3 THEN CASE WHEN hb
                       THEN 'https://cdn' || cb || '.base.net/r/more.html'
                       ELSE 'http://h' || h || '.example.com/d/' || doc_id
                            || '/more.html' END
      ELSE 'http://spam.example.net/x?id=' || doc_id
    END AS dst,
    CASE li.link_i
      WHEN 0 THEN CASE WHEN hb THEN 'cdn' || cb || '.base.net'
                       ELSE 'h' || h || '.example.com' END
      WHEN 1 THEN 'ext' || ek || '.org'
      WHEN 2 THEN CASE WHEN hb THEN 'cdn' || cb || '.base.net'
                       ELSE 'h' || h || '.example.com' END
      WHEN 3 THEN CASE WHEN hb THEN 'cdn' || cb || '.base.net'
                       ELSE 'h' || h || '.example.com' END
      ELSE 'spam.example.net'
    END AS dst_host,
    CASE li.link_i WHEN 0 THEN 'Menu' WHEN 1 THEN 'ref & ' || doc_id
      WHEN 2 THEN 'About us' WHEN 3 THEN 'More' ELSE 'Ad' END AS anchor,
    li.link_i = 4 AS nofollow,
    li.link_i = 0 AS chrome,
    li.link_i IN (0, 2, 3) AND NOT hb AS internal
  FROM d CROSS JOIN (VALUES (0), (1), (2), (3), (4)) li(link_i)
)
"""

_OUTLINKS_SQL = f"""
WITH {_LINKS_CTE}
SELECT doc_id, link_i, dst, anchor, nofollow, chrome, internal,
       FALSE AS links_capped
FROM l
"""


def _links_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.expr(_LINKS_URL_EXPR).alias("url"),
        F.encode(F.expr(_LINKS_TPL_EXPR), "UTF-8").alias("html"),
    )


_LINKS_DOC_ID = r"CAST(regexp_extract(url, '/d/(\\d+)/', 1) AS BIGINT)"


def _q_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template link-rich HTML around documents.doc_id → run the real
    outlink scan (base-href resolution, implied close, scheme skips,
    chrome/nofollow flags) → one row per kept link."""
    from .operators import links as links_ops

    ol = links_ops.extract_outlinks(_links_pages(spark, sf_dir))
    return ol.select(
        F.expr(_LINKS_DOC_ID).alias("doc_id"),
        "link_i", "dst", "anchor", "nofollow", "chrome", "internal",
        "links_capped",
    )


_HTML_META_SQL = """
SELECT doc_id,
  'T' || doc_id || ' & co' AS title,
  'Crawl page ' || doc_id AS description,
  'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/d/'
    || doc_id || '/' AS canonical,
  'en-us' AS lang_attr,
  doc_id % 5 = 0 AS noindex,
  doc_id % 5 = 0 AS nofollow_page
FROM documents
"""


def _q_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same templated pages → page_metadata (title/description/canonical/
    lang/robots), stated analytically by the oracle."""
    from .operators import links as links_ops

    pm = links_ops.page_metadata(_links_pages(spark, sf_dir))
    return pm.select(
        F.expr(_LINKS_DOC_ID).alias("doc_id"),
        "title", "description", "canonical", "lang_attr",
        "noindex", "nofollow_page",
    )


_HOST_DEGREES_SQL = f"""
WITH {_LINKS_CTE},
k AS (SELECT * FROM l WHERE NOT nofollow),
o AS (
  SELECT src_host AS host,
         CAST(count(DISTINCT dst_host) AS BIGINT) AS out_hosts,
         CAST(count(*) AS BIGINT) AS out_w
  FROM k GROUP BY src_host
),
i AS (
  SELECT dst_host AS host,
         CAST(count(DISTINCT src_host) AS BIGINT) AS in_hosts,
         CAST(count(*) AS BIGINT) AS in_w
  FROM k GROUP BY dst_host
)
SELECT coalesce(o.host, i.host) AS host,
       coalesce(out_hosts, 0) AS out_hosts,
       coalesce(out_w, 0) AS out_w,
       coalesce(in_hosts, 0) AS in_hosts,
       coalesce(in_w, 0) AS in_w
FROM o FULL OUTER JOIN i ON o.host = i.host
"""


def _q_host_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated pages → extract_outlinks → host_edges (nofollow
    excluded) → host_degrees.  Pure integer aggregation — engine-exact."""
    from .operators import links as links_ops

    ol = links_ops.extract_outlinks(_links_pages(spark, sf_dir))
    return links_ops.host_degrees(links_ops.host_edges(ol))


def _pagerank_sql(iters: int) -> str:
    """Unrolled deterministic PageRank oracle: the SAME arithmetic event
    order as operators/links.pagerank(fold='sorted') — contribution =
    rank * (w/out_w) with each factor CAST to DOUBLE before the divide,
    per-node sums accumulated in src_host order (aggregate ORDER BY),
    base = (1e0 - 85e-2)/N in DOUBLE literals (a DECIMAL 0.15 would be a
    DIFFERENT double than the binary 1.0-0.85 Spark computes — the
    CLAUDE.md DECIMAL-literal trap)."""
    parts = [
        f"""WITH {_LINKS_CTE},
k AS (SELECT * FROM l WHERE NOT nofollow),
e AS (
  SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS w
  FROM k GROUP BY src_host, dst_host
),
nodes AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM e
    UNION SELECT dst_host AS host FROM e) u
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
ow AS (SELECT src_host, sum(w) AS ow FROM e GROUP BY src_host),
cf AS (
  SELECT e.src_host, e.dst_host,
         CAST(e.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS cf
  FROM e JOIN ow ON e.src_host = ow.src_host
),
r0 AS (SELECT host, 1e0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f""",
c{t} AS (
  SELECT cf.dst_host AS host,
         sum(r.rank * cf.cf ORDER BY cf.src_host) AS s
  FROM cf JOIN r{t - 1} r ON cf.src_host = r.host
  GROUP BY cf.dst_host
),
r{t} AS (
  SELECT nodes.host,
         (1e0 - 85e-2) / (SELECT n FROM nn)
           + 85e-2 * coalesce(c{t}.s, 0e0) AS rank
  FROM nodes LEFT JOIN c{t} ON nodes.host = c{t}.host
)""")
    parts.append(f"\nSELECT host, rank FROM r{iters}")
    return "".join(parts)


_PAGERANK_ITERS = 3
_PAGERANK_SQL = _pagerank_sql(_PAGERANK_ITERS)


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated pages → host graph → pagerank(fold='sorted').  The
    doubles are hash-compared UNROUNDED: every op in the chain (+,*,/)
    is IEEE correctly rounded and both engines fold each node's
    in-contributions in the same src order, so the ranks are
    bit-identical (no transcendentals involved — the round(·,9) policy
    applies only to ln/exp-derived columns)."""
    from .operators import links as links_ops

    ol = links_ops.extract_outlinks(_links_pages(spark, sf_dir))
    edges = links_ops.host_edges(ol)
    return links_ops.pagerank(edges, iters=_PAGERANK_ITERS, fold="sorted")


# ---------------------------------------------------------------------------
# BPE tokenizer (operators/bpe.py).  Three seams, each oracle-checked:
#
# - bpe_pair_counts: round-1 pair statistics over the char-split word
#   table — the aggregation every training round repeats.  Words are
#   filtered to printable ASCII in BOTH engines: Spark splits chars as
#   UTF-16 units, DuckDB as code points, so astral-plane words would
#   diverge (BMP agreement probed; the general path is pytest-pinned).
# - bpe_apply_chars: apply with ZERO merges — n_tokens and an md5 over
#   the US-joined token stream check the whole distinct-word-join +
#   ordered-reassembly plumbing against the analytic char split.  The
#   tokenizer runs in Python (code points), so no ASCII filter is
#   needed; the '' word (consecutive spaces) tokenizes to [END], which
#   the oracle states via list_filter (DuckDB splits '' into ['']).
# - bpe_apply_one_merge: ONE merge ('e', END).  left != right means
#   greedy non-overlapping == plain occurrence count, so the oracle can
#   state the merged stream in closed form: words ending in 'e' lose
#   their last char and gain an 'e ' token.

_BPE_ASCII = "^[!-~]+$"


def _q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bpe

    wc = bpe.word_counts(_t(spark, sf_dir, "documents")).filter(
        F.col("word").rlike(_BPE_ASCII)
    )
    # left/right are SQL keywords — alias for the oracle's sake
    return bpe.pair_counts(bpe.initial_state(wc)).select(
        F.col("left").alias("lsym"), F.col("right").alias("rsym"), "c"
    )


_BPE_PAIRS_SQL = f"""
WITH w AS (SELECT word, count(*) AS cnt
           FROM (SELECT unnest(string_split(lower(coalesce(text, '')), ' '))
                   AS word FROM documents)
           WHERE word <> '' AND regexp_matches(word, '{_BPE_ASCII}')
           GROUP BY word),
s AS (SELECT cnt, list_concat(string_split(word, ''), [' ']) AS syms FROM w),
p0 AS (SELECT cnt, unnest(range(0, len(syms) - 1)) AS i, syms FROM s)
SELECT syms[i + 1] AS lsym, syms[i + 2] AS rsym,
       CAST(sum(cnt) AS BIGINT) AS c
FROM p0 GROUP BY lsym, rsym
"""


def _q_bpe_apply_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bpe

    res = bpe.bpe_apply(_t(spark, sf_dir, "documents"), [])
    return res.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join("tokens", "\x1f")).alias("tok_md5"),
    )


_BPE_CHARS_SQL = """
WITH t AS (SELECT doc_id,
                  string_split(lower(coalesce(text, '')), ' ') AS ws
           FROM documents),
tok AS (SELECT doc_id,
          flatten(list_transform(ws, w -> list_concat(
            list_filter(string_split(w, ''), s -> s <> ''), [' ']))) AS toks
        FROM t)
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
       md5(array_to_string(toks, chr(31))) AS tok_md5
FROM tok
"""


def _q_bpe_apply_one_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bpe

    res = bpe.bpe_apply(
        _t(spark, sf_dir, "documents"), [("e", bpe.END)]
    )
    return res.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join("tokens", "\x1f")).alias("tok_md5"),
    )


_BPE_ONE_MERGE_SQL = """
WITH t AS (SELECT doc_id,
                  string_split(lower(coalesce(text, '')), ' ') AS ws
           FROM documents),
tok AS (SELECT doc_id,
          flatten(list_transform(ws, w -> CASE
            WHEN w LIKE '%e'
              THEN list_concat(string_split(w, '')[1:len(w) - 1], ['e '])
            ELSE list_concat(
              list_filter(string_split(w, ''), s -> s <> ''), [' '])
            END)) AS toks
        FROM t)
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
       md5(array_to_string(toks, chr(31))) AS tok_md5
FROM tok
"""


# Interpolated bigram LM gate (operators/lm.py lm_score_bigram): the
# "swap the counts table for a richer model" upgrade, oracle-mirrored.
# Same determinism contract as the unigram row (ONE ln per token over a
# correctly-rounded IEEE mix of exact-integer divisions; round(·,9) for
# the 1-ulp ln trap).  The lam constants are emitted from the SAME
# Python floats the Spark query uses, so both engines mix with
# bit-identical coefficients (1 − 0.7 is NOT 0.3 in binary).
_LM_LAM = 0.7

_LM_BIGRAM_SQL = f"""
WITH t AS (SELECT doc_id,
                  string_split(lower(coalesce(text, '')), ' ') AS tk
           FROM documents),
tok0 AS (SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM t),
tok AS (SELECT doc_id, pos, tk[pos + 1] AS w,
               CASE WHEN pos > 0 THEN tk[pos] END AS prev
        FROM tok0),
train AS (SELECT w, count(*) AS c FROM tok
          WHERE doc_id % 2 = 0 GROUP BY w),
btrain AS (SELECT prev, w, count(*) AS c FROM tok
           WHERE doc_id % 2 = 0 AND pos > 0 GROUP BY prev, w),
ctx AS (SELECT prev, CAST(sum(c) AS BIGINT) AS ctx FROM btrain
        GROUP BY prev),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM train),
j AS (SELECT tok.doc_id, tok.pos,
        ln(CASE WHEN tok.pos > 0 THEN
             {_LM_LAM!r} * ((coalesce(btrain.c, 0) + 1)
                            / (coalesce(ctx.ctx, 0) + tot.v + 1))
           + {1.0 - _LM_LAM!r} * ((coalesce(train.c, 0) + 1)
                                  / (tot.n + tot.v + 1))
           ELSE ((coalesce(train.c, 0) + 1) / (tot.n + tot.v + 1))
           END) AS lp,
        (train.c IS NULL) AS oov
      FROM tok LEFT JOIN train ON tok.w = train.w
      LEFT JOIN btrain ON tok.prev = btrain.prev AND tok.w = btrain.w
      LEFT JOIN ctx ON tok.prev = ctx.prev
      CROSS JOIN tot),
agg AS (SELECT doc_id,
          list(lp ORDER BY pos) AS lps,
          count(*) AS n_tokens,
          count(*) FILTER (WHERE oov) AS n_oov
        FROM j GROUP BY doc_id)
SELECT doc_id,
  CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(n_oov AS INTEGER) AS n_oov,
  round(list_reduce(lps, (a, x) -> a + x) / n_tokens, 9)
    AS mean_logprob_r
FROM agg
"""


def _q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import lm

    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    return lm.lm_score_bigram(
        docs, lm.unigram_counts(ref), lm.bigram_counts(ref), lam=_LM_LAM
    ).select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round("mean_logprob", 9).alias("mean_logprob_r"),
    )


# DSIR importance resampling (operators/dsir.py — Xie et al. 2023).
# Target model = doc_id % 7 = 0 (the "high-quality" slice), raw model =
# the full corpus, every document weighted.  Portable 48-bit hash so the
# oracle shares the bucket space exactly.  Feature order is unigrams at
# pos 0..n-1 then bigrams at n..2n-2 (the Spark concat+posexplode
# layout); the per-doc sum is the sorted sequential fold on both sides.
# logw rounded to 9 decimals (the ln() 1-ulp engine trap — per-feature
# noise absorbs to ~1e-16).  The scored corpus is a subset of the raw
# model's corpus, so every scored feature hits the ratio table and the
# Spark-only single-ln OOV branch never fires (it would differ from the
# oracle's two-ln difference by 1 ulp — still inside the rounding).
_DSIR_B = 1024

_DSIR_FEATS_CTE = f"""
t AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS tk
      FROM documents),
tok0 AS (SELECT doc_id, len(tk) AS n, unnest(range(0, len(tk))) AS pos, tk
         FROM t),
uni AS (SELECT doc_id, n, pos, tk[pos + 1] AS feat FROM tok0),
feats AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, feat FROM uni
  UNION ALL
  SELECT a.doc_id, CAST(a.n + a.pos AS BIGINT), a.feat || ' ' || b.feat
  FROM uni a JOIN uni b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
fb AS (SELECT doc_id, pos,
              ({portable_hash_sql_duckdb('feat')}) % {_DSIR_B} AS bucket
       FROM feats),
tcnt AS (SELECT bucket, count(*) AS ct FROM fb WHERE doc_id % 7 = 0
         GROUP BY bucket),
rcnt AS (SELECT bucket, count(*) AS cr FROM fb GROUP BY bucket),
tot AS (SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tcnt)
                 AS nt,
               (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rcnt)
                 AS nr),
j AS (SELECT fb.doc_id, fb.pos,
        ln((coalesce(tcnt.ct, 0) + 1) / (tot.nt + {_DSIR_B}))
      - ln((coalesce(rcnt.cr, 0) + 1) / (tot.nr + {_DSIR_B})) AS lr
      FROM fb LEFT JOIN tcnt USING (bucket) LEFT JOIN rcnt USING (bucket)
      CROSS JOIN tot),
agg AS (SELECT doc_id, list(lr ORDER BY pos) AS lrs, count(*) AS n_feats
        FROM j GROUP BY doc_id),
w AS (SELECT doc_id, CAST(n_feats AS INTEGER) AS n_feats,
             list_reduce(lrs, (a, x) -> a + x) AS logw
      FROM agg)
"""

_DSIR_WEIGHTS_SQL = f"""
WITH {_DSIR_FEATS_CTE}
SELECT doc_id, n_feats, round(logw, 9) AS logw_r FROM w
"""


def _dsir_models(spark: SparkSession, sf_dir: str):
    from .operators import dsir

    docs = _t(spark, sf_dir, "documents")
    tc = dsir.hashed_ngram_counts(
        docs.filter(F.col("doc_id") % 7 == 0), _DSIR_B,
        hash_mode="portable",
    )
    rc = dsir.hashed_ngram_counts(docs, _DSIR_B, hash_mode="portable")
    return docs, tc, rc


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dsir

    docs, tc, rc = _dsir_models(spark, sf_dir)
    return dsir.dsir_weights(
        docs, tc, rc, _DSIR_B, hash_mode="portable"
    ).select("doc_id", "n_feats", F.round("logw", 9).alias("logw_r"))


# Gumbel top-100 draw over the same weights: the key adds deterministic
# noise g = -ln(-ln(u)) with u = (portable_hash('dsir:v1:' || id) + 1) /
# (2^48 + 1) — bit-identical operands on both engines, so the oracle
# re-ranks with a window.  Keys are rounded to 9 decimals in the OUTPUT
# only; the rank itself compares full doubles (1-ulp ln noise can flip a
# rank only if two keys collide to ~1e-15 — measure-zero for hashes).
_DSIR_SAMPLE_SQL = f"""
WITH {_DSIR_FEATS_CTE},
g AS (SELECT doc_id, logw,
        logw - ln(-ln(
          ({portable_hash_sql_duckdb(
              chr(39) + 'dsir:v1:' + chr(39)
              + " || CAST(doc_id AS VARCHAR)")} + 1)
          / 281474976710657.0)) AS gk
      FROM w),
r AS (SELECT doc_id, logw, gk,
        row_number() OVER (ORDER BY gk DESC, doc_id ASC) AS rk
      FROM g)
SELECT doc_id, round(logw, 9) AS logw_r, round(gk, 9) AS gk_r
FROM r WHERE rk <= 100
"""


# The zero-exchange inline scoring path must reproduce the join path's
# values exactly (the ratio vector is collected from the same JVM plan),
# so it shares _DSIR_WEIGHTS_SQL verbatim as its oracle.
def _q_dsir_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dsir

    docs, tc, rc = _dsir_models(spark, sf_dir)
    ratios = dsir.dsir_log_ratios(tc, rc, _DSIR_B, hash_mode="portable")
    return dsir.dsir_weights_inline(
        docs, ratios, hash_mode="portable"
    ).select("doc_id", "n_feats", F.round("logw", 9).alias("logw_r"))


def _q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dsir

    docs, tc, rc = _dsir_models(spark, sf_dir)
    weights = dsir.dsir_weights(
        docs, tc, rc, _DSIR_B, hash_mode="portable"
    )
    return dsir.dsir_sample(weights, 100).select(
        "doc_id",
        F.round("logw", 9).alias("logw_r"),
        F.round("gumbel_key", 9).alias("gk_r"),
    )


# Winnowing fingerprints (operators/dedup.py winnow_fingerprints — the
# MOSS local-fingerprinting scheme): k=3 word-gram hashes in position
# order, rightmost minimal hash per w=4 window, distinct (pos, hash)
# selections.  The Spark side is a per-row HOF fold (replace on `<=`, so
# equal minima keep the LATER position); the oracle re-derives the same
# selection RELATIONALLY — min(h) per window, then max(pos) among the
# minima — an independent plan, integer-exact throughout (48-bit
# portable hash, no floats anywhere).
_WINNOW_K, _WINNOW_W = 3, 4

_WINNOW_GRAM_H = portable_hash_sql_duckdb(
    f"array_to_string(list_slice(ws, i, i + {_WINNOW_K - 1}), ' ')"
)

_WINNOW_CTES = f"""
WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
           FROM documents),
base AS (SELECT doc_id, ws, len(ws) AS nw FROM t),
gi AS (SELECT doc_id, ws,
              unnest(range(1, nw - {_WINNOW_K} + 2)) AS i
       FROM base WHERE nw >= {_WINNOW_K}),
grams AS (SELECT doc_id, i, {_WINNOW_GRAM_H} AS h FROM gi),
n AS (SELECT doc_id, count(*) AS nh FROM grams GROUP BY doc_id),
wins AS (SELECT doc_id,
                unnest(range(1, greatest(1, nh - {_WINNOW_W} + 1) + 1))
                  AS wi
         FROM n),
memb AS (SELECT wn.doc_id, wn.wi, g.i AS p, g.h
         FROM wins wn JOIN grams g ON g.doc_id = wn.doc_id
          AND g.i BETWEEN wn.wi AND wn.wi + {_WINNOW_W} - 1),
mn AS (SELECT doc_id, wi, min(h) AS mh FROM memb GROUP BY doc_id, wi),
pick AS (SELECT m.doc_id, m.wi, mn.mh, max(m.p) AS p
         FROM memb m JOIN mn ON m.doc_id = mn.doc_id AND m.wi = mn.wi
          AND m.h = mn.mh
         GROUP BY m.doc_id, m.wi, mn.mh)"""

_WINNOW_SQL = f"""{_WINNOW_CTES}
SELECT DISTINCT doc_id, CAST(p AS INTEGER) AS pos, mh AS fp FROM pick
"""

# Cross-snapshot passage overlap (dedup.winnow_cross_pairs): winnowing
# is per-row, so the oracle runs ONE selection chain over the whole
# table and splits new/old by the same doc_id % 3 convention as
# dedup_incremental; the inverted-index join then counts shared
# fingerprint hashes per (new, old) pair.  min_shared = 2 (the
# operator default) keeps the row set selective on this corpus.
_WINNOW_CROSS_SQL = f"""{_WINNOW_CTES},
fsel AS (SELECT DISTINCT doc_id, mh AS fp FROM pick),
np AS (SELECT doc_id, fp FROM fsel WHERE doc_id % 3 <> 0),
op AS (SELECT doc_id, fp FROM fsel WHERE doc_id % 3 = 0)
SELECT np.doc_id AS new_id, op.doc_id AS old_id,
       CAST(count(*) AS BIGINT) AS shared
FROM np JOIN op ON np.fp = op.fp
GROUP BY np.doc_id, op.doc_id
HAVING count(*) >= 2
"""


def _q_winnow_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.winnow_cross_pairs(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 3 == 0),
        k=_WINNOW_K,
        w=_WINNOW_W,
        min_shared=2,
        hash_mode="portable",
    )


# Quantile-bucket assignment (text_analysis.bucket_by_quantiles — the
# CCNet head/middle/tail shape): quartiles of n_chars, thresholds =
# quantile_cont ≙ percentile rounded to 9 dp before the compare (the
# operator's determinism contract), integer column so row values are
# engine-exact.
_BUCKET_SQL = """
WITH q AS (SELECT quantile_cont(n_chars, [2.5e-1, 5e-1, 7.5e-1]) AS t
           FROM documents)
SELECT doc_id,
       CASE WHEN n_chars IS NULL THEN NULL
            WHEN n_chars <= round(t[1], 9) THEN 'q0'
            WHEN n_chars <= round(t[2], 9) THEN 'q1'
            WHEN n_chars <= round(t[3], 9) THEN 'q2'
            ELSE 'q3' END AS bucket
FROM documents CROSS JOIN q
"""


def _q_bucket_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.bucket_by_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars"
    ).select("doc_id", "bucket")


def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.winnow_fingerprints(
        _t(spark, sf_dir, "documents"),
        k=_WINNOW_K,
        w=_WINNOW_W,
        hash_mode="portable",
    )


# BM25 ranked retrieval (operators/text_analysis.py bm25_topk): four
# fixed queries over the documents table, Lucene non-negative idf,
# k1=1.2 / b=0.75.  idf's ln is not cross-engine bit-identical
# (CLAUDE.md transcendental rule) so both engines round the token-sorted
# sequential fold to 9 dp AND rank on the rounded score (rank stays
# reproducible where raw scores differ at the ulp); float literals are
# e-notation (the DECIMAL-literal trap); list_reduce's missing 0-init
# matches Spark's `0.0 + x` because every BM25 term is > 0.
_BM25_QUERIES = [
    (0, "key agg row"),
    (1, "scan slow table"),
    (2, "spark window join vector"),
    (3, "nosuchtoken row"),
]

_BM25_SQL = f"""
WITH q(query_id, query) AS (VALUES {", ".join(
    f"({i}, '{s}')" for i, s in _BM25_QUERIES)}),
tok AS (SELECT doc_id, w FROM
          (SELECT doc_id,
                  unnest(string_split(lower(coalesce(text, '')), ' ')) AS w
           FROM documents)
        WHERE w <> ''),
tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, w),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf
       GROUP BY doc_id),
dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY w),
tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nd,
               (SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) FROM tf)
                 AS tt),
qt AS (SELECT DISTINCT query_id, w FROM
         (SELECT query_id,
                 unnest(string_split(lower(coalesce(query, '')), ' ')) AS w
          FROM q)
       WHERE w <> ''),
cand AS (SELECT qt.query_id, tf.doc_id, tf.w,
           ln(1e0 + (tot.nd - dfreq.dfc + 5e-1) / (dfreq.dfc + 5e-1))
             * tf.tf * 2.2e0
             / (tf.tf + 1.2e0 * (2.5e-1
                + 7.5e-1 * dl.dl / (tot.tt / tot.nd))) AS ts
         FROM tf JOIN qt ON tf.w = qt.w
                 JOIN dfreq ON tf.w = dfreq.w
                 JOIN dl ON tf.doc_id = dl.doc_id
                 CROSS JOIN tot),
agg AS (SELECT query_id, doc_id,
               CAST(count(*) AS INTEGER) AS n_hit,
               list(ts ORDER BY w) AS l
        FROM cand GROUP BY query_id, doc_id),
sc AS (SELECT query_id, doc_id, n_hit,
              round(list_reduce(l, (a, x) -> a + x), 9) AS score_r
       FROM agg),
rk AS (SELECT *, row_number() OVER (
         PARTITION BY query_id ORDER BY score_r DESC, doc_id ASC) AS rnk
       FROM sc)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_hit, score_r,
       CAST(rnk AS INTEGER) AS rank
FROM rk WHERE rnk <= 10
"""


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    qf = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query string"
    )
    return text_analysis.bm25_topk(
        _t(spark, sf_dir, "documents"), qf, k=10
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        "doc_id",
        "n_hit",
        "score_r",
        "rank",
    )


# registry

#
# ORDERING MATTERS: the driver checks a finite prefix of this registry
# (~50 entries in r3, which left the then-last four oracle-checked rows
# unrecorded — VERDICT r3 "Next round" #3).  Entries are therefore ranked
# by evidence value: (1) the newest / previously-unchecked rows first,
# (2) every operator whose Spark implementation is an independent plan
# checked against a hand-written DuckDB oracle, (3) the six shared-SQL
# engine-parity twins (the SAME SQL string runs on both engines — they
# prove engine parity only; the kernels' real gate is the golden pytest
# suite), and (4) the two rows-only non-SQL-expressible checks last.
_CASES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # (1) newest + previously-unchecked oracle rows — r5: entries whose
    # VALUES changed this round lead (the language_id zero-vote fix
    # changed lang_pred for stopword-free docs — a stale r3 green would
    # be misleading), then the new recall ledger and every entry whose
    # implementation changed (id-only lsh/ivf rerank joins, NULL-digest
    # dedup convention, pack coalesce, quality split binding, pii
    # coalesce).  The late-r5 winnow/bm25 additions lead (never checked);
    # they displace sim_lsh_topk / sim_ivf_topk from the ~50 prefix —
    # the least-evidence-value rows here: green in r4, and their r5
    # change (id-only distinct) is value-preserving, plan-tested, and
    # locally swept.
    "dedup_winnow": (_q_winnow, _WINNOW_SQL),
    "text_bm25_topk": (_q_bm25, _BM25_SQL),
    "sim_prototype_prune": (_q_prototype_prune, _PROTO_PRUNE_SQL),
    "dedup_cluster_best": (_q_cluster_best, _CLUSTER_BEST_SQL),
    "sim_random_project": (_q_random_project, _RP_SQL),
    "mm_image_ahash": (_q_image_ahash, _AHASH_SQL),
    "mm_image_near_dup": (_q_image_near_dup, _AHASH_PAIRS_SQL),
    "mm_audio_fingerprint": (_q_audio_fingerprint, _AUDIO_FP_SQL),
    "mm_audio_near_dup": (_q_audio_near_dup, _AUDIO_NEAR_DUP_SQL),
    "mm_image_dedup": (_q_image_dedup, _AHASH_DEDUP_SQL),
    "mm_audio_dedup": (_q_audio_dedup, _AUDIO_DEDUP_SQL),
    "corpus_boilerplate_filter": (_q_boilerplate_filter, _BP_FILTER_SQL),
    "corpus_boilerplate_lines": (_q_boilerplate_lines, _BP_LINES_SQL),
    "sim_semdedup_pairs": (_q_semdedup_pairs, _SEMDEDUP_PAIRS_SQL),
    "sim_semdedup_corpus": (_q_semdedup_corpus, _SEMDEDUP_CORPUS_SQL),
    "corpus_ngram_report": (_q_ngram_report, _NGRAM_REPORT_SQL),
    "corpus_pack_tokens": (_q_pack_tokens, _PACK_TOKENS_SQL),
    "text_tfidf_keywords": (_q_tfidf, _TFIDF_SQL),
    "corpus_quantile_report": (_q_quantile_report, _QUANTILE_SQL),
    # moved up: implementation changed in the r5 review-hardening
    "extract_html": (_q_extract_html, _HTML_SQL),
    "dedup_url_canonical": (_q_url_dedup, _URL_DEDUP_SQL),
    "dedup_exact": (_q_exact_dedup, _EXACT_DEDUP_SQL),
    "dedup_simhash_pairs": (_q_simhash_pairs, _SIMHASH_PAIRS_SQL),
    "url_domain_filter": (_q_domain_filter, _DOMAIN_FILTER_SQL),
    "mm_media_meta": (_q_media_meta, _MEDIA_SQL),
    "corpus_pack_manifest": (_q_pack, _PACK_SQL),
    "corpus_pack_export": (_q_pack_export, _PACK_EXPORT_SQL),
    # the OTHER r4 driver-red row (array canonicalizer) — its fix must be
    # inside the driver's ~50-entry budget to earn the green r5 row
    "sim_hashed_embed": (_q_hashed_embed, _EMBED_SQL),
    "text_lm_bigram": (_q_lm_bigram, _LM_BIGRAM_SQL),
    "select_dsir_weights": (_q_dsir_weights, _DSIR_WEIGHTS_SQL),
    "select_dsir_inline": (_q_dsir_inline, _DSIR_WEIGHTS_SQL),
    "select_dsir_sample": (_q_dsir_sample, _DSIR_SAMPLE_SQL),
    "mm_gif_frames": (_q_gif_frames, _GIF_FRAMES_SQL),
    "sim_pq_topk": (_q_pq_topk, _PQ_SQL),
    "bpe_pair_counts": (_q_bpe_pair_counts, _BPE_PAIRS_SQL),
    "bpe_apply_chars": (_q_bpe_apply_chars, _BPE_CHARS_SQL),
    "bpe_apply_one_merge": (_q_bpe_apply_one_merge, _BPE_ONE_MERGE_SQL),
    "mm_audio_stats": (_q_audio_stats, _AUDIO_STATS_SQL),
    "mm_audio_resample": (_q_audio_resample, _AUDIO_RESAMPLE_SQL),
    "mm_audio_features": (_q_audio_features, _AUDIO_FEATURES_SQL),
    "text_language_id": (_q_language_id, _lang_sql()),
    "text_language_id_cjk": (_q_language_id_cjk, _cjk_sql()),
    "text_language_id_scripts": (_q_language_id_scripts, _scripts_sql()),
    "text_quality": (_q_quality, _quality_sql()),
    "text_quality_filter": (_q_quality_filter, _quality_filter_sql()),
    "pii_scrub": (_q_pii_scrub, _pii_sql()),
    "sim_recall_report": (_q_recall_report, _RECALL_REPORT_SQL),
    "mm_decode_stats": (_q_decode_stats, _DECODE_STATS_SQL),
    "mm_resize_stats": (_q_resize_stats, _RESIZE_STATS_SQL),
    "mm_image_features": (_q_image_features, _IMAGE_FEATURES_SQL),
    "sim_lsh_topk": (_q_lsh_topk, _LSH_TOPK_SQL),
    "sim_ivf_topk": (_q_ivf_topk, _IVF_SQL),
    "sim_ivf_trained": (_q_ivf_trained, _IVF_TRAINED_SQL),
    # deliberately BELOW the driver's ~50-entry budget (the prefix is
    # exactly full of never-checked + changed rows): this late-close
    # addition relies on the local type-sensitive sweep as its evidence
    "dedup_winnow_cross": (_q_winnow_cross, _WINNOW_CROSS_SQL),
    "corpus_quantile_buckets": (_q_bucket_quantiles, _BUCKET_SQL),
    "corpus_shard": (_q_shard_corpus, _SHARD_SQL),
    "dedup_incremental": (_q_incremental_dedup, _INCREMENTAL_SQL),
    "dedup_incremental_near": (_q_incremental_near, _INCREMENTAL_NEAR_SQL),
    "text_c4_line_filter": (_q_c4_line_filter, _C4_LINE_SQL),
    "text_chunks": (_q_chunk_text, _CHUNK_SQL),
    "text_word_blocklist": (_q_word_blocklist, _WORD_BLOCKLIST_SQL),
    "corpus_gate_report": (_q_gate_report, _gate_report_sql()),
    "dedup_bloom_bitmap": (_q_bloom_bitmap, _BLOOM_BITMAP_SQL),
    "dedup_latest_capture": (_q_latest_capture, _LATEST_CAPTURE_SQL),
    "ext_outlinks": (_q_outlinks, _OUTLINKS_SQL),
    "ext_html_meta": (_q_html_meta, _HTML_META_SQL),
    "graph_host_degrees": (_q_host_degrees, _HOST_DEGREES_SQL),
    "graph_pagerank": (_q_pagerank, _PAGERANK_SQL),
    "sim_semantic_pairs": (_q_semantic_pairs, _SEM_PAIRS_SQL),
    "text_classifier_score": (_q_classifier_score, _CLS_SCORE_SQL),
    "corpus_token_budget": (_q_token_budget, _TOK_BUDGET_SQL),
    "dedup_paragraph_corpus": (_q_para_dedup, _PARA_DEDUP_SQL),
    "dedup_span_corpus": (_q_span_dedup, _SPAN_DEDUP_SQL),
    "dedup_dup_spans": (_q_dup_spans, _DUP_SPANS_SQL),
    "text_lm_score": (_q_lm_score, _LM_SCORE_SQL),
    "decontam_overlap": (_q_decontam_overlap, _DECONTAM_SQL),
    "decontam_clean_corpus": (_q_decontam_clean, _DECONTAM_CLEAN_SQL),
    "corpus_domain_stats": (_q_domain_stats, _DOMAIN_SQL),
    "dedup_clusters": (_q_dup_clusters, _CLUSTERS_SQL),
    "dedup_cluster_corpus": (_q_cluster_corpus, _CLUSTER_CORPUS_SQL),
    "text_normalize": (_q_normalize, _NORMALIZE_SQL),
    "corpus_domain_cap": (_q_cap_domain, _CAP_DOMAIN_SQL),
    # (2) independent-plan oracle rows — training-data dedup
    "dedup_filtered_corpus": (_q_dedup_filtered_corpus, _DEDUP_FILTER_SQL),
    "dedup_minhash": (_q_minhash, _MINHASH_SQL),
    "dedup_lsh_pairs": (_q_lsh_pairs, _LSH_SQL),
    "dedup_jaccard": (_q_jaccard, _JACCARD_SQL),
    "dedup_simhash": (_q_simhash, _SIMHASH_SQL),
    "dedup_simhash_explode": (_q_simhash_explode, _SIMHASH32_SQL),
    "dedup_jaccard_capped": (_q_jaccard_capped, _JACCARD_CAPPED_SQL),
    "dedup_line_corpus": (_q_line_dedup, _LINE_DEDUP_SQL),
    "text_c4_rules": (_q_c4_rules, _C4_SQL),
    "events_hour_rollup": (_q_events_hour, _EVENTS_HOUR_SQL),
    # similarity search
    "sim_cosine_topk": (_q_cosine_topk, _COS_TOPK_SQL),
    "sim_quantized_topk": (_q_quant_topk, _QUANT_TOPK_SQL),
    "sim_near_dup": (_q_near_dup, _NEAR_DUP_SQL),
    # text analysis
    "text_token_count": (_q_token_count, _TOKEN_SQL),
    "text_fingerprint": (_q_fingerprint, _FINGERPRINT_SQL),
    "text_token_freq": (_q_token_freq, _TOKEN_FREQ_SQL),
    "text_repetition": (_q_repetition, _REPETITION_SQL),
    "text_gopher_rules": (_q_gopher, _GOPHER_SQL),
    # multimodal plumbing (Python UDF vs SQL twin)
    "mm_features": (_q_media_features, _FEATURES_SQL),
    "mm_sample_frames": (_q_sample_frames, _FRAMES_SQL),
    # deterministic dataset split + PII + duplicate-line stats
    "corpus_split": (_q_assign_split, _SPLIT_SQL),
    "corpus_sample": (_q_sample, _SAMPLE_SQL),
    "corpus_stratified_sample": (_q_stratified, _STRATIFIED_SQL),
    "text_dup_lines": (_q_dup_lines, _DUP_LINES_SQL),
    # extraction-semantic analogues with independent Spark plans
    # (SURVEY.md §2: P1-P5, F3/F7, S6, A2, A4)
    "ext_ignore_predicates": (_q_ignore_predicates, _IGNORE_SQL),
    "ext_text_assembly": (_q_text_assembly, _ASSEMBLY_SQL),
    "ext_resume_anti_join": (_q_resume_anti_join, _RESUME_SQL),
    "ext_status_counts": (_q_status_counts, _STATUS_SQL),
    "ext_empty_line_filter": (_q_empty_line_filter, _EMPTY_SQL),
    # (3) shared-SQL engine-parity twins (SURVEY.md §2: J1-J3, A1, A3, O1,
    # S7)
    "ext_overlap_join": (
        _run_shared_sql(["part", "supplier"], _OVERLAP_SQL), _OVERLAP_SQL),
    "ext_coverage_agg": (
        _run_shared_sql(["part", "supplier"], _COVERAGE_SQL), _COVERAGE_SQL),
    "ext_bbox_union": (
        _run_shared_sql(["lineitem"], _BBOX_UNION_SQL), _BBOX_UNION_SQL),
    "ext_block_sort": (
        _run_shared_sql(["events"], _BLOCK_SORT_SQL), _BLOCK_SORT_SQL),
    "ext_scalar_funcs": (
        _run_shared_sql(["events"], _SCALAR_SQL), _SCALAR_SQL),
    "ext_raster_cap": (
        _run_shared_sql(["lineitem"], _RASTER_CAP_SQL), _RASTER_CAP_SQL),
    # (4) extraction pipeline (non-SQL-expressible: rows-only checks)
    "extract_flagship": (_q_extract_flagship, None),
    "extract_metrics": (_q_extract_metrics, None),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _CASES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _CASES.items() if sql is not None}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthetic pages table (input_hint shape) → extracted
    documents table with nested page/block/line structs + lineage columns."""
    from . import pipeline

    return pipeline.extract(_pages_df(spark, 24, 12))
