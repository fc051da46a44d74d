"""Outlink extraction and the host-level web graph.

The Common Crawl ecosystem publishes exactly this surface next to every
crawl: per-page outlinks (anchor + resolved target) and the host-level
webgraph with centrality scores (the cc-webgraph releases).  A training
pipeline uses it three ways: anchor text as a quality/topic signal, the
link graph for crawl-frontier and spam scoring, and in/out-degree as
curation features.

Spark shape:

- :func:`extract_outlinks` / :func:`page_metadata` are Arrow-batched
  ``mapInPandas`` over the binary ``html`` column (the one approved
  Python boundary — same posture as the extraction UDFs); the walk is
  :func:`ocr_spark.htmlpage.scan_links` / ``scan_meta``, which share the
  extraction path's tokenizer, charset decode, and 4 MiB byte guard, so
  links can never resurrect bytes the extraction guard dropped.  The
  per-document ``MAX_HTML_LINKS`` cap (a crawler-trap guard, 2048 ≈ 50×
  the CC median) surfaces as the ``links_capped`` column — never silent.
- :func:`host_edges` collapses page edges to the weighted host graph —
  one projection + one count aggregation (map-side combined).
- :func:`host_degrees` is a pair of integer aggregations — exact.
- :func:`pagerank` iterates rank = (1-d)/N + d·Σ in-contribs with one
  equi-join + one aggregation per round (the connected-components
  posture: lineage cut per round via localCheckpoint at depth).  Two
  fold strategies, same numbers to the last bit at test scale:
  ``fold='sorted'`` collects each node's in-contributions and folds them
  in src order — bit-reproducible across partitionings AND engines
  (+,*,/ are IEEE correctly rounded; the oracle mirrors the order with
  ``sum(... ORDER BY src)``), the contract/test path; ``fold='sum'`` is
  the 100 TB path — map-side-combined partial sums, last-ulp
  order-nondeterministic, for graphs where a mega-host's in-edge list
  must not be collected (CC host in-degree is Zipf: the top host has
  ~10^8 in-edges).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..htmlpage import MAX_HTML_LINKS, scan_links, scan_meta
from .urls import host_of

OUTLINKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("link_i", T.IntegerType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("anchor", T.StringType(), False),
        T.StructField("nofollow", T.BooleanType(), False),
        T.StructField("chrome", T.BooleanType(), False),
        T.StructField("internal", T.BooleanType(), False),
        T.StructField("links_capped", T.BooleanType(), False),
    ]
)

PAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("canonical", T.StringType(), True),
        T.StructField("lang_attr", T.StringType(), True),
        T.StructField("noindex", T.BooleanType(), False),
        T.StructField("nofollow_page", T.BooleanType(), False),
    ]
)


def extract_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_links: int | None = MAX_HTML_LINKS,
) -> DataFrame:
    """Pages (url, html:binary) → one row per resolved outlink.

    Pages with no (kept) links produce no rows.  When the per-document
    link cap cuts a crawler-trap page, every emitted row of that page
    carries ``links_capped=true`` (the decode-guard lineage policy:
    partial output, flagged, never silent)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in OUTLINKS_SCHEMA.fields}
            for url, payload in zip(pdf[url_col], pdf[html_col]):
                data = bytes(payload) if payload is not None else b""
                # a NULL url must not become the literal string 'None'
                # (colliding keys across every null-url page); '' keys
                # behave like an unparseable url downstream
                u = str(url) if url is not None else ""
                links, capped = scan_links(data, u, max_links=max_links)
                for rec in links:
                    out["url"].append(u)
                    out["link_i"].append(rec["link_i"])
                    out["dst"].append(rec["dst"])
                    out["anchor"].append(rec["anchor"])
                    out["nofollow"].append(rec["nofollow"])
                    out["chrome"].append(rec["chrome"])
                    out["internal"].append(rec["internal"])
                    out["links_capped"].append(capped)
            yield pd.DataFrame(out)

    return pages.select(
        F.col(url_col).alias(url_col), F.col(html_col).alias(html_col)
    ).mapInPandas(fn, OUTLINKS_SCHEMA)


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages (url, html:binary) → one metadata row per page (title,
    description, canonical, html-lang, robots noindex/nofollow)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in PAGE_META_SCHEMA.fields
            }
            for url, payload in zip(pdf[url_col], pdf[html_col]):
                data = bytes(payload) if payload is not None else b""
                meta = scan_meta(data)
                # same NULL-url guard as extract_outlinks
                out["url"].append(str(url) if url is not None else "")
                out["title"].append(meta["title"])
                out["description"].append(meta["description"])
                out["canonical"].append(meta["canonical"])
                out["lang_attr"].append(meta["lang"])
                out["noindex"].append(meta["noindex"])
                out["nofollow_page"].append(meta["nofollow_page"])
            yield pd.DataFrame(out)

    return pages.select(
        F.col(url_col).alias(url_col), F.col(html_col).alias(html_col)
    ).mapInPandas(fn, PAGE_META_SCHEMA)


def host_edges(
    outlinks: DataFrame,
    include_nofollow: bool = False,
    include_chrome: bool = True,
) -> DataFrame:
    """Page-level outlinks → weighted host graph (src_host, dst_host, w).

    ``w`` counts link multiplicity (the cc-webgraph convention).  Rows
    with an empty src/dst host are dropped; nofollow edges are excluded
    by default (they are excluded from ranking by construction of the
    rel attribute).  One projection + one map-side-combined count."""
    df = outlinks
    if not include_nofollow:
        df = df.filter(~F.col("nofollow"))
    if not include_chrome:
        df = df.filter(~F.col("chrome"))
    return (
        df.select(
            host_of(F.col("url")).alias("src_host"),
            host_of(F.col("dst")).alias("dst_host"),
        )
        .filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def host_degrees(edges: DataFrame) -> DataFrame:
    """Host graph → per-host degree stats: distinct out/in neighbour
    hosts and total out/in edge weight.  Pure integer aggregation
    (engine-exact); a full outer join of the two sides so pure sources
    and pure sinks both appear."""
    out = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.countDistinct("dst_host").cast("long").alias("out_hosts"),
        F.sum("w").cast("long").alias("out_w"),
    )
    inn = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.countDistinct("src_host").cast("long").alias("in_hosts"),
        F.sum("w").cast("long").alias("in_w"),
    )
    return (
        out.join(inn, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_hosts", F.lit(0)).cast("long").alias("out_hosts"),
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_hosts", F.lit(0)).cast("long").alias("in_hosts"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
        )
    )


# PageRank iteration budget guard — same never-silent policy as
# connected_components: a caller asking for an absurd round count gets an
# error, not a silently truncated lineage chain.
_MAX_PAGERANK_ITERS = 100


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    fold: str = "sorted",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted host-graph PageRank: (host, rank) after ``iters`` rounds.

    rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N + d·Σ_{(u,v,w)} rank_t(u)·w/out_w(u).

    The simplified formulation (dangling mass not redistributed — pure
    sinks keep the base rank, matching the analytic oracle exactly).
    Self-loops participate like any edge.  Per round: one equi-join on
    src + one aggregation on dst — both map-side combinable under
    ``fold='sum'``; ``fold='sorted'`` (default) collects each node's
    in-contributions, sorts by src host, and folds sequentially, making
    the doubles bit-reproducible across partitionings and engines (every
    op is IEEE correctly rounded; see the module docstring for when to
    switch).  Plans are cut with ``localCheckpoint`` every
    ``checkpoint_every`` rounds so deep iteration counts don't build an
    unbounded lineage tree."""
    if not 0 < iters <= _MAX_PAGERANK_ITERS:
        raise ValueError(
            f"iters={iters} outside (0, {_MAX_PAGERANK_ITERS}]"
        )
    if fold not in ("sorted", "sum"):
        raise ValueError(f"unknown fold {fold!r}")
    if checkpoint_every < 1:
        # 0 would ZeroDivisionError mid-iteration after the persists ran
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    # nodes and cedges are referenced by EVERY iteration level of the
    # final plan (and localCheckpoint only cuts lineage every
    # checkpoint_every rounds), and Spark does not reuse-merge identical
    # non-broadcast subtrees (CLAUDE.md, measured r4) — without the
    # persists one action re-runs the union+distinct and the out-weight
    # join up to checkpoint_every times each
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return edges.select(F.col("src_host").alias("host")).limit(
            0
        ).withColumn("rank", F.lit(0.0))
    out_w = edges.groupBy("src_host").agg(F.sum("w").alias("ow"))
    # contribution factor is rank-independent: weight / out-weight, fixed
    # per edge — computed once, reused every round
    cedges = edges.join(out_w, "src_host").select(
        "src_host", "dst_host", (F.col("w") / F.col("ow")).alias("cf")
    ).persist()
    n_dbl = F.lit(float(n))
    base = (F.lit(1.0) - F.lit(damping)) / n_dbl
    ranks = nodes.select("host", (F.lit(1.0) / n_dbl).alias("rank"))
    for it in range(iters):
        contribs = cedges.join(
            ranks, cedges.src_host == ranks.host
        ).select(
            F.col("dst_host").alias("host"),
            F.col("src_host").alias("src"),
            (F.col("rank") * F.col("cf")).alias("c"),
        )
        if fold == "sorted":
            summed = contribs.groupBy("host").agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
        else:
            summed = contribs.groupBy("host").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "host", "left").select(
            "host",
            (
                base + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    # materialize before releasing the shared subtrees the plan references
    ranks = ranks.localCheckpoint()
    nodes.unpersist()
    cedges.unpersist()
    return ranks
