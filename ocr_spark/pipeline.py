"""The end-to-end extraction pipeline as a declarative Spark plan.

Physical shape (SURVEY.md §4):

    Scan pages [project url,warc_ts,html,lang — text column pruned]
    → MapInPandas parse            (doc → page rows; cheap)
    → Exchange xxhash64(url, page_i)   -- salted page-level skew break (R3)
    → MapInPandas analyze          (layout + native probe; heavy)
    → persist / stage table
    → Union( filter(!needs_ocr) → MapInPandas finish_native
           , filter(needs_ocr)  → MapInPandas finish_ocr   -- dense batches
           , filter(error)      → empty blocks (SQL only) )
    → SQL postprocess (P3-P5 as higher-order functions over blocks)
    → groupBy(url) assemble  (sort_array by page i; text joins '\\n'/'\\n\\n')

Everything after the UDFs is pure Catalyst-optimizable SQL: predicates,
text assembly, ids, and metrics never touch Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import extract_udfs as udfs
from .schemas import (
    ANALYZED_SCHEMA,
    BLOCK_TYPE,
    PAGE_BLOCKS_JSON_SCHEMA,
    PAGE_BLOCKS_SCHEMA,
    PAGE_ROW_SCHEMA,
)

# P3 — court-heading regex (document.py:630).  Java regex; `(?i)` prefix
# replaces Python's re.IGNORECASE, `^` anchor replicates re.match.
HEADING_SQL_PATTERN = (
    r"(?i)^.{0,50}ase \d+[-:]\d+[-\w]+.{1,200}\s+Page \d+ of \d+"
)
# Inside a SQL string literal backslashes are escape characters — double them.
_HEADING_SQL_LITERAL = HEADING_SQL_PATTERN.replace("\\", "\\\\")

# Block text = lines joined by '\n' (document.py:328).
_BLOCK_TEXT = "array_join(transform(b.lines, l -> l.content), '\\n')"

# P4 — digit-only predicate (document.py:635 ``text.strip().isdigit()``).
# ``\s``-anchored + ``\p{Nd}`` so tab/newline padding and Unicode decimal
# digits match the Python semantics (residual gap: exotic Unicode spaces
# and superscript digits, which str.strip()/isdigit() also accept — absent
# from web-text line content in practice).
_DIGITS_SQL_PATTERN = r"^\s*\p{Nd}+\s*$"
_DIGITS_SQL_LITERAL = _DIGITS_SQL_PATTERN.replace("\\", "\\\\")

# P3-P5 postprocess predicates (document.py:630-639) as one SQL rewrite of
# the nested blocks column; `should_ignore` in kernels/postprocess.py is the
# oracle twin.  The block text is joined ONCE per block by the inner
# transform (the struct field ``txt``) — inlining {_BLOCK_TEXT} directly
# would rebuild the joined string for every RLIKE (the CLAUDE.md
# inlined-array-build-in-lambda rule; cost bounded by lines-per-block,
# but two joins per block is still one too many).
POSTPROCESS_BLOCKS_EXPR = f"""
transform(
  transform(blocks, b -> named_struct('b', b, 'txt', {_BLOCK_TEXT})),
  x ->
    named_struct(
      'i', x.b.i,
      'bbox', x.b.bbox,
      'type',
        CASE WHEN x.txt RLIKE '{_HEADING_SQL_LITERAL}'
               OR x.txt RLIKE '{_DIGITS_SQL_LITERAL}'
               OR (x.b.type = 'abandon'
                   AND NOT exists(x.b.lines, l -> length(l.content) > 4))
             THEN 'ignore' ELSE x.b.type END,
      'lines', x.b.lines))
"""

# A2 — hierarchical text assembly (document.py:196-207, :328, :389, :150):
# line '\n' block, block '\n\n' page, page '' doc.
PAGE_TEXT_EXPR = (
    "array_join(transform(p.blocks, b -> "
    "array_join(transform(b.lines, l -> l.content), '\\n')), '\\n\\n')"
)
DOC_TEXT_EXPR = f"array_join(transform(pages, p -> {PAGE_TEXT_EXPR}), '')"


@dataclass
class PipelineConfig:
    """Knobs that matter at 100 TB.

    - mode: 'fused' (default) extracts whole documents in ONE mapInPandas
      pass straight off the scan — the binary payload crosses the
      JVM↔Python boundary exactly once and never rides a shuffle or a UDF
      return (binary columns are the expensive thing to move through
      Arrow).  'paged' explodes to page rows first and salts them across
      partitions (R3) — choose it when single documents are big enough to
      dominate a task (giant-PDF corpora).  'staged' is the three-branch
      plan (probe stage → filter split → dense OCR stage → union) for
      deployments where the OCR path runs on different (GPU) executors
      and must be its own stage — pair it with stage_path there.
    - page_partitions: width of the salted page-level exchange before the
      heavy analyze stage (None → spark.sql.shuffle.partitions).
    - persist_intermediate: cache the analyzed stage so the native/OCR/error
      branches don't recompute layout detection (staged mode only); at real
      scale point stage_path at a durable location instead (Iceberg staging
      table).
    - postprocess: apply the P3-P5 ignore rewrite (document.py:625-642).
    """

    mode: str = "fused"
    page_partitions: int | None = None
    persist_intermediate: bool = True
    stage_path: str | None = None
    postprocess: bool = True


def parse_stage(pages: DataFrame) -> DataFrame:
    """Doc rows → page rows.  Prunes the crawl `text` column before any
    shuffle; the scan ships only (url, warc_ts, html, lang)."""
    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        udfs.parse_pages, PAGE_ROW_SCHEMA
    )


def _spread(page_rows: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Salted page-level exchange (R3): giant-doc skew broken before the
    heavy stage — pages of one url scatter across partitions."""
    n = cfg.page_partitions or int(
        page_rows.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return page_rows.repartition(n, F.xxhash64("url", "page_i"))


def analyze_stage(page_rows: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Salted page-level exchange + the heavy probe stage."""
    return _spread(page_rows, cfg).mapInPandas(
        udfs.analyze_pages, ANALYZED_SCHEMA
    )


def fused_finish_stage(page_rows: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Single-pass phase 2: probe + route + consolidate inside one UDF."""
    return _spread(page_rows, cfg).mapInPandas(
        udfs.analyze_and_finish, PAGE_BLOCKS_SCHEMA
    )


def _parse_blocks_json(raw: DataFrame) -> DataFrame:
    """blocks_json string → nested blocks column via codegen'd from_json
    (the cheap direction of the Arrow boundary — see extract_docs)."""
    blocks_type = "array<" + BLOCK_TYPE.simpleString() + ">"
    return raw.withColumn(
        "blocks", F.from_json("blocks_json", blocks_type)
    ).drop("blocks_json")


def doc_fused_stage(pages: DataFrame) -> DataFrame:
    """Doc-level fully-fused extraction: scan → one UDF → block rows.
    No binary shuffle, no binary UDF output; parallelism comes from input
    splits (spark.sql.files.maxPartitionBytes) + AQE."""
    raw = pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        udfs.extract_docs, PAGE_BLOCKS_JSON_SCHEMA
    )
    return _parse_blocks_json(raw)


def branch_and_finish(analyzed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """needs-OCR routing (R2): three branches over the analyzed stage."""
    spark = analyzed.sparkSession
    if cfg.stage_path:
        analyzed.write.mode("overwrite").parquet(cfg.stage_path)
        analyzed = spark.read.parquet(cfg.stage_path)
    elif cfg.persist_intermediate:
        analyzed = analyzed.persist()

    ok = analyzed.filter(F.col("error").isNull())
    native = (
        ok.filter(~F.col("needs_ocr"))
        .drop("page_bytes")  # binary never rides past the stage that needs it
        .mapInPandas(udfs.finish_native, PAGE_BLOCKS_SCHEMA)
    )
    ocr = ok.filter(F.col("needs_ocr")).mapInPandas(
        udfs.finish_ocr, PAGE_BLOCKS_SCHEMA
    )
    blocks_type = "array<" + BLOCK_TYPE.simpleString() + ">"
    errs = analyzed.filter(F.col("error").isNotNull()).select(
        "url",
        "warc_ts",
        "lang",
        "page_i",
        "n_pages",
        F.lit(False).alias("ocr"),
        F.expr(f"CAST(array() AS {blocks_type})").alias("blocks"),
        "truncated",
        "error",
    )
    return native.unionByName(ocr).unionByName(errs)


def postprocess_stage(page_blocks: DataFrame) -> DataFrame:
    """P3-P5 ignore rewrite, pure SQL over the nested blocks column."""
    return page_blocks.withColumn("blocks", F.expr(POSTPROCESS_BLOCKS_EXPR))


def assemble_stage(page_blocks: DataFrame) -> DataFrame:
    """Reassemble documents: one shuffle on url; page order restored by index
    (the reference's out-of-order streaming + index-keyed rehydration,
    document.py:98, :584-597); text joins are byte-exact A2 semantics."""
    assembled = page_blocks.groupBy("url").agg(
        F.first("warc_ts").alias("warc_ts"),
        # collect_list skips NULLs, so error rows and zero-page placeholders
        # (page_i = -1) contribute no page entry
        F.expr(
            "sort_array(collect_list(CASE WHEN error IS NULL AND page_i >= 0 "
            "THEN struct(page_i AS i, blocks) END))"
        ).alias("pages"),
        F.sum(
            F.expr("CASE WHEN error IS NULL AND page_i >= 0 THEN 1 ELSE 0 END")
        ).alias("n_pages_seen"),
        F.sum(F.expr("size(blocks)")).alias("n_blocks"),
        F.sum(F.when(F.col("ocr"), 1).otherwise(0)).alias("ocr_pages"),
        # decode-guard lineage: pages cut at MAX_HTML_BYTES (never silent)
        F.sum(F.when(F.col("truncated"), 1).otherwise(0)).alias(
            "truncated_pages"
        ),
        F.max("error").alias("error"),
    )
    return assembled.select(
        "url",
        "warc_ts",
        F.expr(DOC_TEXT_EXPR).alias("text"),
        "pages",
        F.col("n_pages_seen").cast("int").alias("n_pages"),
        F.col("n_blocks").cast("int").alias("n_blocks"),
        F.col("ocr_pages").cast("int").alias("ocr_pages"),
        F.col("truncated_pages").cast("int").alias("truncated_pages"),
        F.when(F.col("error").isNotNull(), F.lit("FAILED"))
        .otherwise(F.lit("COMPLETED"))
        .alias("status"),
        "error",
    )


def extract_from_path(
    spark: SparkSession, path: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Manifest-mode flagship: distribute (file, row_group) splits and let
    Python workers read the payload column directly with pyarrow — the
    binary never crosses the JVM↔Python boundary (see
    extract_udfs.extract_manifest).  Downstream postprocess/assembly is
    identical to :func:`extract`.

    The driver only LISTS file names (cheap; Iceberg's ``.files`` metadata
    table replaces even that on a real cluster) — the per-file parquet
    FOOTER reads that produce row-group splits run distributed
    (extract_udfs.enumerate_row_groups), so millions of files never
    serialize through a driver loop."""
    import glob as _glob

    cfg = cfg or PipelineConfig()
    files = sorted(_glob.glob(f"{path}/*.parquet")) or [path]
    n = cfg.page_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(n, len(files)))
    mdf = fdf.mapInPandas(
        udfs.enumerate_row_groups, "file string, row_group int"
    ).repartition(n)
    finished = _parse_blocks_json(
        mdf.mapInPandas(udfs.extract_manifest, PAGE_BLOCKS_JSON_SCHEMA)
    )
    if cfg.postprocess:
        finished = postprocess_stage(finished)
    return assemble_stage(finished)


def extract(
    pages: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """pages table → extracted table (the flagship job)."""
    import os

    cfg = cfg or PipelineConfig()
    try:
        executor_backend = pages.sparkSession.conf.get(
            "spark.executorEnv.OCR_SPARK_BACKEND", None
        )
    except Exception:  # conf lookup must never break plan building
        executor_backend = None
    if cfg.mode != "fused" and "model" in (
        os.environ.get("OCR_SPARK_BACKEND"),
        executor_backend,
    ):
        # fail fast on the driver: the model backend has no per-page byte
        # handoff (fitz documents are not page-sliceable), so paged/staged
        # would otherwise surface as misleading per-doc PARSE_ERROR rows
        raise ValueError(
            "OCR_SPARK_BACKEND=model supports mode='fused' only "
            "(PDF payloads are not page-sliceable for the paged/staged "
            "stage handoff)"
        )
    if cfg.mode == "fused":
        finished = doc_fused_stage(pages)
    elif cfg.mode == "paged":
        finished = fused_finish_stage(parse_stage(pages), cfg)
    elif cfg.mode == "staged":
        analyzed = analyze_stage(parse_stage(pages), cfg)
        finished = branch_and_finish(analyzed, cfg)
    else:
        raise ValueError(
            f"unknown PipelineConfig.mode {cfg.mode!r}; "
            "expected 'fused', 'paged', or 'staged'"
        )
    if cfg.postprocess:
        finished = postprocess_stage(finished)
    return assemble_stage(finished)


def flatten_lines(extracted: DataFrame) -> DataFrame:
    """Explode the nested tree to golden-compare granularity
    (url, page_i, block_i, block_type, line_i, content) — the byte-identity
    key space (reference tests/conftest.py:25-34)."""
    return (
        extracted.select("url", F.explode("pages").alias("p"))
        .select("url", F.col("p.i").alias("page_i"), F.explode("p.blocks").alias("b"))
        .select(
            "url",
            "page_i",
            F.col("b.i").alias("block_i"),
            F.col("b.type").alias("block_type"),
            F.explode("b.lines").alias("l"),
        )
        .select(
            "url",
            "page_i",
            "block_i",
            "block_type",
            F.col("l.i").alias("line_i"),
            F.col("l.content").alias("content"),
        )
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
