#!/usr/bin/env python
"""spark-submit entrypoint for the training-data curation pipeline —
the post-extraction half of the engine (the extraction half is
jobs/extract_job.py; chain them for raw-crawl → training-corpus).

Cluster::

    spark-submit --master yarn --deploy-mode cluster \
      --py-files ocr_spark.zip \
      jobs/curate_job.py --input s3a://bucket/extracted \
      --output s3a://bucket/curated \
      --blocklist blocked_domains.txt --min-quality 0.3 \
      --near-dup --max-bucket 10000 --line-dedup --pii \
      --split train=0.98,val=0.01,test=0.01

Local smoke::

    spark-submit --master 'local[8]' --py-files ocr_spark.zip \
      jobs/curate_job.py --input /tmp/extracted --output /tmp/curated

Stage order is fixed (cheapest-filter-first): crawl revisit dedup
(optional; newest capture per canonical url, winners from a payload-free
key projection) → URL blocklist → word blocklist (optional; C4 badwords
stage) → C4 line filter (optional; line-level cleaning, emptied docs
dropped with counts) → language
filter (optional; the CCNet order — languages split before quality) →
quality gates (Gopher + composite + C4 hard drops) → canonical-url +
exact dedup → cross-snapshot incremental dedup vs a previously-kept
corpus (optional; bloom pre-filter + exact verify, plus an optional
MinHash near-dup layer vs the same reference) → MinHash-LSH
near-dup with cluster-aware removal (connected
components of the pair graph keep ONE representative per duplicate
cluster; EXPLICIT cap, audit count logged in the summary — the
never-cap-silently contract) → per-domain doc cap (optional) →
corpus-global line dedup → duplicate-SPAN dedup (optional; Lee et al.
2022 substring granularity) → CCNet-style LM head cut (optional;
self-trained unigram, threshold reported) → benchmark decontamination
(optional; word n-gram overlap vs a broadcast eval set) → PII scrub →
BPE tokenizer training + tokenization (optional; the vocabulary is
learned from the post-curation text and the export gains token
columns) → deterministic split/sample assignment.  Every stage is a
pure DataFrame plan; the one JSON summary line reports what each stage
removed so a production run is auditable end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# local runs (python jobs/X.py) see the repo root like --py-files would
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="extracted table (parquet dir; url + text columns)")
    ap.add_argument("--output", required=True, help="curated parquet dir")
    ap.add_argument("--blocklist", default=None,
                    help="file of blocked domains, one per line")
    ap.add_argument("--word-blocklist", default=None, metavar="FILE",
                    help="file of blocked words (one per line); drop "
                         "documents containing any as a token (the C4 "
                         "badwords stage; pure projection filter)")
    ap.add_argument("--c4-line-filter", action="store_true",
                    help="C4 line-level cleaning before the page gates: "
                         "keep only lines ending in terminal punctuation "
                         "with >=3 words and no 'javascript'; docs whose "
                         "every line is removed are dropped (counts "
                         "reported)")
    ap.add_argument("--lang", default=None, metavar="CODE",
                    help="keep only documents whose predicted language "
                         "is CODE (script-ratio + stopword-vote language "
                         "ID; the CCNet stage order — language first)")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="composite quality threshold (enables the gate)")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher rule gate")
    ap.add_argument("--c4-hard-drops", action="store_true",
                    help="drop curly-brace/lorem-ipsum documents")
    ap.add_argument("--latest-capture", action="store_true",
                    help="crawl revisit dedup before anything else: keep "
                         "only the newest capture per canonical url "
                         "(needs a warc_ts column in --input)")
    ap.add_argument("--incremental-ref", default=None, metavar="PATH",
                    help="previously-kept corpus parquet (text column); "
                         "drop documents whose content already appears "
                         "there — cross-snapshot dedup via a bloom "
                         "pre-filter + exact digest verify (monthly "
                         "recrawl shape)")
    ap.add_argument("--near-dup", action="store_true",
                    help="MinHash-LSH near-duplicate removal")
    ap.add_argument("--keep-longest", action="store_true",
                    help="--near-dup / --semdedup keep the LONGEST "
                         "member of each duplicate cluster (ties to min "
                         "id) instead of the min-id member — the "
                         "keep-the-best-capture policy")
    ap.add_argument("--near-dup-ref", default=None, metavar="PATH",
                    help="previously-kept corpus parquet (text column); "
                         "also drop documents that NEAR-duplicate it "
                         "(MinHash band collision — the LSH layer of "
                         "--incremental-ref's exact pass)")
    ap.add_argument("--max-bucket", type=int, default=10_000,
                    help="LSH hot-bucket cap (audited; see summary)")
    ap.add_argument("--semdedup", type=float, default=None, metavar="COS",
                    help="semantic near-dup removal at cosine >= COS over "
                         "model-free hashed embeddings (SemDeDup, D4 stage "
                         "one): k-means cells, within-cell pairs, one "
                         "representative per transitive group")
    ap.add_argument("--prototype", type=float, default=None, metavar="FRAC",
                    help="prototype pruning (D4 stage two): drop the FRAC "
                         "most-centroid-like documents of each embedding "
                         "cluster; shares the --semdedup embedding, "
                         "centroid fit, and scored frame when both run")
    ap.add_argument("--embed-dim", type=int, default=64,
                    help="hashed-embedding dimension for --semdedup / "
                         "--prototype (default 64)")
    ap.add_argument("--n-clusters", type=int, default=64,
                    help="k-means cell count for --semdedup / --prototype "
                         "(default 64; SCALE THIS WITH THE CORPUS — "
                         "within-cell pairing is quadratic in cell size, "
                         "SemDeDup uses tens of thousands of clusters at "
                         "web scale)")
    ap.add_argument("--centroid-fit-frac", type=float, default=1.0,
                    help="deterministic-hash fraction of the corpus the "
                         "centroid fit sees (default 1.0 — exact at test "
                         "scale; LOWER AT CORPUS SCALE: the Lloyd mean "
                         "gathers each cell's sampled vectors into one "
                         "row, so fit on ~10^5 docs and assign all)")
    ap.add_argument("--max-cell", type=int, default=None,
                    help="opt-in mega-cell cap for --semdedup / "
                         "--prototype: cells above it produce no pairs "
                         "(semdedup) and are exempted whole from pruning "
                         "(prototype); the excluded cells are counted in "
                         "the summary — never silent")
    ap.add_argument("--boilerplate", type=int, default=None,
                    metavar="MIN_DOCS",
                    help="remove ALL occurrences of any line present in"
                         " >= MIN_DOCS distinct documents (template chrome:"
                         " cookie banners, nav, share buttons); runs before"
                         " line dedup — per-host scoping is available via"
                         " dedup.corpus_boilerplate_filter(scope_col=)")
    ap.add_argument("--line-dedup", action="store_true",
                    help="corpus-global duplicate-line removal")
    ap.add_argument("--span-dedup", type=int, default=None, metavar="W",
                    help="corpus-global duplicate-SPAN removal at window "
                         "width W tokens (Lee et al. 2022 exact-substring "
                         "dedup; 50 is the published setting)")
    ap.add_argument("--lm-head", type=float, default=None, metavar="FRAC",
                    help="CCNet-style LM gate: self-train a unigram model "
                         "on the surviving corpus and keep the top FRAC "
                         "by mean log-probability (the cut threshold is "
                         "reported in the summary)")
    ap.add_argument("--classifier-ref", default=None, metavar="PATH",
                    help="parquet of positive reference documents (text "
                         "column) for the FineWeb-Edu-style log-odds "
                         "classifier gate (required with "
                         "--classifier-head)")
    ap.add_argument("--classifier-head", type=float, default=None,
                    metavar="FRAC",
                    help="train the token log-odds classifier on "
                         "--classifier-ref (positives) vs the surviving "
                         "corpus (negatives) and keep the top FRAC by "
                         "mean log-odds (the cut threshold is reported "
                         "in the summary)")
    ap.add_argument("--dsir-ref", default=None, metavar="PATH",
                    help="parquet dir with a `text` column: the TARGET "
                         "corpus for DSIR importance resampling (with "
                         "--dsir-keep)")
    ap.add_argument("--dsir-keep", type=int, default=None, metavar="K",
                    help="keep K documents via DSIR Gumbel top-k over "
                         "target-vs-corpus hashed-ngram importance "
                         "weights (Xie et al. 2023; requires --dsir-ref; "
                         "re-deal with --salt)")
    ap.add_argument("--dsir-buckets", type=int, default=8192,
                    help="hashed n-gram feature space for --dsir-keep "
                         "(default 8192)")
    ap.add_argument("--max-per-domain", type=int, default=None,
                    help="keep at most N docs per host (FineWeb-style "
                         "domain balancer; deterministic smallest-id "
                         "winners)")
    ap.add_argument("--decontam-ref", default=None, metavar="PATH",
                    help="parquet of benchmark/eval texts (text column); "
                         "drop documents whose word n-gram overlap with "
                         "any benchmark row reaches --decontam-threshold")
    ap.add_argument("--decontam-ngram", type=int, default=13,
                    help="shingle width for --decontam-ref (13 is the "
                         "published decontamination setting)")
    ap.add_argument("--decontam-threshold", type=float, default=0.5,
                    help="overlap fraction at/above which a document is "
                         "dropped")
    ap.add_argument("--pii", action="store_true",
                    help="redact emails/IPs/phones")
    ap.add_argument("--split", default=None,
                    help="label=weight,... deterministic split assignment")
    ap.add_argument("--sample", type=float, default=None,
                    help="deterministic corpus sample fraction")
    ap.add_argument("--shards", type=int, default=None, metavar="N",
                    help="write the output as N hash-shuffled shard "
                         "directories (shard=K/), each sorted by the "
                         "deterministic within-shard rank — the "
                         "training-export layout")
    ap.add_argument("--bpe-merges", type=int, default=None, metavar="N",
                    help="train an N-merge BPE vocabulary on the curated "
                         "corpus and add bpe_tokens/bpe_n_tokens columns "
                         "to the export; the learned merge list lands in "
                         "the summary (the tokenizer artifact)")
    ap.add_argument("--bpe-min-count", type=int, default=2,
                    help="stop BPE training early when no pair reaches "
                         "this count")
    ap.add_argument("--pack-seq-len", type=int, default=None, metavar="L",
                    help="also pack the curated corpus into fixed-length "
                         "training sequences of L tokens (BPE tokens when "
                         "--bpe-merges is set, whitespace tokens "
                         "otherwise); writes chunk_id/token_ids/n_tok "
                         "parquet to <output>_packed")
    ap.add_argument("--salt", default="v1",
                    help="hash salt for split/sample assignment")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("ocr-spark-curate").getOrCreate()
    t0 = time.time()
    summary: dict = {}
    # per-stage wall-times: each enabled stage ends at its summary count
    # (the count is the stage's materialization barrier), so the split
    # below is the real cost attribution a capacity planner needs.  Lazy
    # stages with no count (pii / sample / split / shard) fold into
    # "write" — they execute inside the output job.
    stage_seconds: dict[str, float] = {}
    _stage_last = [time.time()]

    def _stage(name: str) -> None:
        now = time.time()
        stage_seconds[name] = round(now - _stage_last[0], 2)
        _stage_last[0] = now

    # rolling stage cache: persist THIS stage's output before counting
    # it, so the count executes only this stage's work (an uncached
    # count re-runs the entire upstream chain and charges the whole
    # prefix to whichever stage counted — the early stages' attribution
    # was cumulative, not per-stage); release the previous stage's cache
    # right after, so at most two stage frames are pinned at once
    _live = [None]

    def _count(df):
        cached = df.persist()
        n = cached.count()
        prev = _live[0]
        if prev is not None:
            prev.unpersist()
        _live[0] = cached
        return cached, n

    raw = spark.read.parquet(args.input)
    if "status" in raw.columns:
        raw = raw.filter(F.col("status") == "COMPLETED")
    if args.latest_capture and "warc_ts" not in raw.columns:
        ap.error("--latest-capture needs a warc_ts column in --input")
    keep_cols = ["url", "text"] + (["warc_ts"] if args.latest_capture else [])
    docs = raw.select(*keep_cols)

    if args.latest_capture:
        # crawl revisit dedup FIRST (cheapest win: stale captures never
        # pay any later stage).  The operator's groupBy(canonical_url)
        # guarantees exactly ONE winning row per canonical url, so its
        # output is taken DIRECTLY — doc_id = xxhash64(url) is derived
        # only afterwards, when urls are unique.  (Deriving doc_id from
        # the url BEFORE this stage and semi-joining winners back on it
        # kept every capture of the winning url — all captures share the
        # url hash — and shipped duplicate doc_ids into every later
        # id-keyed stage.  A semi-join is also no cheaper: it exchanges
        # the text payload by join key, exactly what the max_by groupBy
        # does, minus its map-side one-winner-per-partition combine.)
        from ocr_spark.operators.urls import latest_capture

        docs = latest_capture(
            docs.withColumn(
                # per-CAPTURE tie-break id: equal-ts recrawls of one url
                # resolve deterministically by content hash
                "capture_id", F.xxhash64("url", "warc_ts", "text")
            ),
            url_col="url", ts_col="warc_ts", id_col="capture_id",
        ).select("url", "text")
    docs = docs.withColumn("doc_id", F.xxhash64("url"))
    if args.latest_capture:
        docs, summary["after_latest_capture"] = _count(docs)
        _stage("latest_capture")
    if "truncated_pages" in raw.columns:
        # decode-guard hits travel with the corpus: surface the total in
        # the summary so a curator sees truncated extractions even if
        # they never look at the column (never-silent policy)
        row = raw.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("truncated_pages"), F.lit(0)).alias("trunc"),
        ).collect()[0]
        summary["input_docs"] = row["n"]
        summary["input_truncated_pages"] = int(row["trunc"])
    else:
        summary["input_docs"] = docs.count()
    _stage("input_scan")

    if args.blocklist:
        from ocr_spark.operators.urls import filter_blocked_domains

        with open(args.blocklist) as f:
            # comment lines are file format, skipped here; anything else
            # that cannot match a host makes filter_blocked_domains
            # RAISE (never-silent: a dead entry lets blocked content in)
            blocked = [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
        docs = filter_blocked_domains(docs, blocked)
        docs, summary["after_blocklist"] = _count(docs)
        _stage("blocklist")

    if args.word_blocklist:
        from ocr_spark.operators.text_analysis import blocked_words_filter

        with open(args.word_blocklist) as f:
            words = [ln.strip() for ln in f if ln.strip()]
        docs = blocked_words_filter(docs, words)
        docs, summary["after_word_blocklist"] = _count(docs)
        _stage("word_blocklist")

    if args.c4_line_filter:
        from ocr_spark.operators.text_analysis import c4_line_filter

        from pyspark.sql import Observation

        obs = Observation("c4_lines")
        cleaned = c4_line_filter(docs).observe(
            obs, F.sum("c4_lines_removed").alias("lines_removed")
        )
        docs = (
            cleaned.filter(F.col("clean_text") != "")
            .drop("text", "c4_lines_removed")
            .withColumnRenamed("clean_text", "text")
            .select("doc_id", "url", "text")
        )
        docs, summary["after_c4_line_filter"] = _count(docs)
        summary["c4_lines_removed"] = int(obs.get["lines_removed"] or 0)
        _stage("c4_line_filter")

    if args.lang:
        from ocr_spark.operators.text_analysis import language_id

        docs = (
            language_id(docs)
            .filter(F.col("lang_pred") == args.lang)
            .select("doc_id", "url", "text")
        )
        docs, summary["after_lang"] = _count(docs)
        _stage("lang")

    if args.gopher or args.min_quality is not None or args.c4_hard_drops:
        from ocr_spark.operators.text_analysis import (
            c4_rules,
            gopher_rules,
            quality_score,
        )

        scored = c4_rules(quality_score(gopher_rules(docs)))
        cond = F.lit(True)
        if args.gopher:
            cond = cond & F.col("g_keep")
        if args.min_quality is not None:
            cond = cond & (F.col("quality") >= args.min_quality)
        if args.c4_hard_drops:
            cond = cond & ~F.col("c4_has_curly") & ~F.col("c4_has_lorem")
        docs = scored.filter(cond).select("doc_id", "url", "text")
        docs, summary["after_quality"] = _count(docs)
        _stage("quality")

    # exact dedup on (canonical url, content digest) always runs
    from ocr_spark.operators.dedup import exact_dedup
    from ocr_spark.operators.urls import canonicalize

    docs = docs.withColumn("canonical_url", canonicalize(F.col("url")))
    reps = exact_dedup(docs, text_col="text").select(
        F.col("representative").alias("doc_id")
    )
    docs, summary["after_exact_dedup"] = _count(
        docs.join(reps, "doc_id", "left_semi")
    )
    _stage("exact_dedup")

    if args.incremental_ref:
        # cross-snapshot dedup AFTER intra-snapshot exact dedup: the
        # reference is the already-kept corpus from earlier crawls
        from ocr_spark.operators.bloom import bloom_bitmap, incremental_dedup

        ref = spark.read.parquet(args.incremental_ref).select("text")
        # The job owns the bitmap lifecycle: build + persist it here,
        # unpersist right after the localCheckpoint materializes the
        # stage output (an internally-built bitmap would stay pinned in
        # the cache for the rest of the session).
        bitmap = bloom_bitmap(ref, "text").persist()
        # The union's two branches (bloom-negative pass-through and
        # verified candidates) each re-reference the flagged plan, and
        # every later stage compounds that doubling — deep enough that
        # rendering the plan overflows the driver stack mid-chain.  Cut
        # lineage here (same rationale as the classifier-stage cut).
        docs = incremental_dedup(
            docs, ref, text_col="text", bitmap=bitmap
        ).localCheckpoint()
        bitmap.unpersist()
        docs, summary["after_incremental"] = _count(docs)
        _stage("incremental")

    if args.near_dup_ref:
        from ocr_spark.operators.dedup import incremental_near_dedup

        ref = spark.read.parquet(args.near_dup_ref).select("text").withColumn(
            "doc_id", F.xxhash64("text")
        )
        docs = incremental_near_dedup(docs, ref).localCheckpoint()
        docs, summary["after_incremental_near"] = _count(docs)
        _stage("incremental_near")

    if args.near_dup:
        from ocr_spark.operators.dedup import (
            connected_components,
            lsh_candidate_pairs,
            lsh_hot_buckets,
            minhash_signatures,
        )

        sigs = minhash_signatures(docs, num_perm=8).cache()
        pairs = lsh_candidate_pairs(
            sigs, num_perm=8, max_bucket=args.max_bucket
        )
        # cluster-aware removal: A~B~C keeps exactly one representative
        # (pairwise doc_b removal could keep two near-copies of the same
        # transitively-linked content).  ONE propagation run feeds both
        # the cluster count and the removal (components= share).
        from ocr_spark.operators.dedup import dedup_by_clusters

        components = connected_components(pairs)
        summary["dup_clusters"] = (
            components.select("cluster_id").distinct().count()
        )
        summary["lsh_capped_buckets"] = lsh_hot_buckets(
            sigs, num_perm=8, max_bucket=args.max_bucket
        ).count()
        sigs.unpersist()
        if args.keep_longest:
            deduped = dedup_by_clusters(
                docs.withColumn("_len", F.length("text")),
                components=components,
                score_col="_len",
            ).drop("_len")
        else:
            deduped = dedup_by_clusters(docs, components=components)
        docs, summary["after_near_dup"] = _count(deduped)
        _stage("near_dup")

    if args.semdedup is not None or args.prototype is not None:
        # D4 (SemDeDup then prototype pruning) over model-free hashed
        # embeddings: ONE embedding projection, ONE centroid fit, ONE
        # scored frame shared by both stages and the mega-cell audit.
        from ocr_spark.operators.embed import hashed_embedding
        from ocr_spark.operators.similarity import (
            prototype_prune,
            prototype_scores,
            semdedup_hot_cells,
            semdedup_pairs,
            train_centroids,
        )

        emb = hashed_embedding(docs, dim=args.embed_dim).select(
            "doc_id", "embedding"
        )
        fit = emb
        if args.centroid_fit_frac < 1.0:
            from ocr_spark.operators.splits import deterministic_sample

            fit = deterministic_sample(
                emb, args.centroid_fit_frac, salt=args.salt
            )
        cents = train_centroids(
            fit, id_col="doc_id", n_centroids=args.n_clusters, iters=1
        )
        scored = prototype_scores(
            emb, cents, id_col="doc_id"
        ).persist()
        if args.max_cell is not None:
            # the cap is never silent: the excluded cells are counted
            # whether or not either stage ends up hitting them
            summary["semdedup_hot_cells"] = semdedup_hot_cells(
                cells=scored, id_col="doc_id", max_cell=args.max_cell
            ).count()
        if args.semdedup is not None:
            from ocr_spark.operators.dedup import dedup_by_clusters

            pairs = semdedup_pairs(
                cells=scored,
                cents=cents,
                id_col="doc_id",
                threshold=args.semdedup,
                max_cell=args.max_cell,
            )
            if args.keep_longest:
                deduped = dedup_by_clusters(
                    docs.withColumn("_len", F.length("text")),
                    pairs,
                    score_col="_len",
                ).drop("_len")
            else:
                deduped = dedup_by_clusters(docs, pairs)
            docs, summary["after_semdedup"] = _count(deduped)
            _stage("semdedup")
        if args.prototype is not None:
            # the operator reconciles membership itself: ranks cover the
            # CURRENT survivors only (D4 prunes after dedup), and a doc
            # the frame cannot score raises rather than vanishing
            docs, summary["after_prototype"] = _count(
                prototype_prune(
                    docs,
                    cents,
                    id_col="doc_id",
                    prune_fraction=args.prototype,
                    scored=scored,
                    max_cell=args.max_cell,
                ).drop("cell", "proto_cos", "proto_rank", "cell_n")
            )
            _stage("prototype")
        scored.unpersist()

    if args.max_per_domain is not None:
        from ocr_spark.operators.text_analysis import cap_per_domain

        docs, summary["after_domain_cap"] = _count(
            cap_per_domain(docs, args.max_per_domain)
        )
        _stage("domain_cap")

    if args.boilerplate is not None:
        from ocr_spark.operators.dedup import corpus_boilerplate_filter

        bp = corpus_boilerplate_filter(docs, min_docs=args.boilerplate).cache()
        summary["boilerplate_lines_removed"] = int(
            bp.agg(
                F.sum(F.col("n_lines") - F.col("n_lines_kept"))
            ).collect()[0][0]
            or 0
        )
        docs = docs.drop("text").join(
            bp.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )
        _stage("boilerplate")

    if args.line_dedup:
        from ocr_spark.operators.dedup import corpus_line_dedup

        ld = corpus_line_dedup(docs).cache()
        summary["dup_lines_removed"] = int(
            ld.agg(
                F.sum(F.col("n_lines") - F.col("n_lines_kept"))
            ).collect()[0][0]
            or 0
        )
        docs = docs.drop("text").join(
            ld.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )
        _stage("line_dedup")

    if args.span_dedup is not None:
        from ocr_spark.operators.dedup import corpus_span_dedup

        sd = corpus_span_dedup(docs, width=args.span_dedup).cache()
        summary["dup_span_tokens_removed"] = int(
            sd.agg(
                F.sum(F.col("n_tokens") - F.col("n_tokens_kept"))
            ).collect()[0][0]
            or 0
        )
        docs = docs.drop("text").join(
            sd.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )
        _stage("span_dedup")

    if args.lm_head is not None:
        from ocr_spark.operators.lm import lm_score, unigram_counts

        scores = lm_score(docs, unigram_counts(docs)).select(
            "doc_id", "mean_logprob"
        )
        # approx_percentile keeps the cut scale-safe (an exact percentile
        # materializes every score in one aggregation buffer); the
        # threshold actually applied is REPORTED, never silent
        thr = scores.agg(
            F.expr(
                f"approx_percentile(mean_logprob, "
                f"{1.0 - args.lm_head}, 10000)"
            )
        ).collect()[0][0]
        keep = scores.filter(F.col("mean_logprob") >= thr).select("doc_id")
        docs, summary["after_lm_head"] = _count(
            docs.join(keep, "doc_id", "left_semi")
        )
        summary["lm_threshold"] = thr
        _stage("lm_head")

    if args.classifier_head is not None:
        if not args.classifier_ref:
            ap.error("--classifier-head requires --classifier-ref")
        from ocr_spark.operators.classifier import (
            class_token_counts,
            classifier_score,
        )

        # The classifier references the surviving corpus THREE times
        # (negative counts, scoring, and the semi-join back); stacked on
        # the dedup stages' self-referencing rewrites the logical plan
        # grows multiplicatively — large enough that merely RENDERING it
        # (AQE's plan-update string) OOMs the driver.  Cut lineage once
        # here; at cluster scale this is also where you'd checkpoint to
        # reliable storage before the most re-referenced stage.
        docs = docs.localCheckpoint()
        # positives = the reference corpus, negatives = the surviving
        # corpus itself (the FineWeb-Edu train-on-reference shape); the
        # ref table only contributes tokens, so any deterministic id does
        ref = (
            spark.read.parquet(args.classifier_ref)
            .select("text")
            .withColumn("doc_id", F.xxhash64("text"))
        )
        counts = class_token_counts(ref, docs)
        scores = classifier_score(docs, counts).select(
            "doc_id", "mean_log_odds"
        )
        # same scale-safe approx_percentile cut as --lm-head; the
        # threshold actually applied is REPORTED, never silent
        cthr = scores.agg(
            F.expr(
                f"approx_percentile(mean_log_odds, "
                f"{1.0 - args.classifier_head}, 10000)"
            )
        ).collect()[0][0]
        keep = scores.filter(F.col("mean_log_odds") >= cthr).select(
            "doc_id"
        )
        docs, summary["after_classifier_head"] = _count(
            docs.join(keep, "doc_id", "left_semi")
        )
        summary["classifier_threshold"] = cthr
        _stage("classifier_head")

    if args.dsir_keep is not None:
        if not args.dsir_ref:
            ap.error("--dsir-keep requires --dsir-ref")
        from ocr_spark.operators.dsir import (
            dsir_log_ratios,
            dsir_sample,
            dsir_weights_inline,
            hashed_ngram_counts,
        )

        # the surviving corpus is referenced three times (raw model,
        # scoring, semi-join back) — same lineage-cut rationale as the
        # classifier stage above
        docs = docs.localCheckpoint()
        ref = spark.read.parquet(args.dsir_ref).select("text").withColumn(
            "doc_id", F.xxhash64("text")
        )
        tc = hashed_ngram_counts(ref, args.dsir_buckets)
        rc = hashed_ngram_counts(docs, args.dsir_buckets)
        # the default bucket space is well inside the inline regime
        # (≲64k cells), so scoring is the ZERO-exchange literal fold —
        # measured 8.6× / 16.6 MB → 0 MB shuffle over the join path at
        # 200k docs (tools/scale_probes.py dsir), bit-identical values
        ratios = dsir_log_ratios(tc, rc, args.dsir_buckets)
        weights = dsir_weights_inline(docs, ratios)
        keep = dsir_sample(
            weights, args.dsir_keep, salt=args.salt
        ).select("doc_id")
        docs, summary["after_dsir"] = _count(
            docs.join(keep, "doc_id", "left_semi")
        )
        _stage("dsir")

    if args.decontam_ref:
        from ocr_spark.operators.decontam import decontaminate

        bench = (
            spark.read.parquet(args.decontam_ref)
            .select("text")
            .withColumn("bench_id", F.xxhash64("text"))
        )
        docs = decontaminate(
            docs,
            bench,
            n=args.decontam_ngram,
            threshold=args.decontam_threshold,
)
        docs, summary["after_decontam"] = _count(docs)
        _stage("decontam")

    if args.pii:
        from ocr_spark.operators.pii import scrub_pii

        docs = (
            scrub_pii(docs)
            .drop("text")
            .withColumnRenamed("clean_text", "text")
        )

    if args.bpe_merges is not None:
        # tokenizer training BELONGS after curation: the vocabulary must
        # be learned from exactly the text the model will train on, not
        # from the pre-filter crawl.  The merge list goes into the
        # summary — without it the token columns are undecodable.
        from ocr_spark.operators.bpe import bpe_apply, bpe_train, word_counts

        merges = bpe_train(
            word_counts(docs),
            args.bpe_merges,
            min_count=args.bpe_min_count,
            state_partitions=spark.sparkContext.defaultParallelism,
        )
        summary["bpe_merges_learned"] = len(merges)
        summary["bpe_merges"] = [[left, right] for left, right in merges]
        toks = bpe_apply(docs, merges).select(
            "doc_id",
            F.col("tokens").alias("bpe_tokens"),
            F.col("n_tokens").alias("bpe_n_tokens"),
        )
        docs = docs.join(toks, "doc_id")
        _stage("bpe_tokenize")

    if args.sample is not None:
        from ocr_spark.operators.splits import deterministic_sample

        docs = deterministic_sample(docs, args.sample, salt=args.salt)

    if args.split:
        from ocr_spark.operators.splits import assign_split

        docs = assign_split(docs, _parse_weights(args.split), salt=args.salt)

    if args.shards is not None:
        # training-export layout: deterministic pseudo-shuffle, one
        # hash-ordered directory per shard (readers stream shards
        # round-robin for a decorrelated sample order)
        from ocr_spark.operators.splits import shard_corpus

        sharded = shard_corpus(docs, args.shards, salt=args.salt)
        (
            sharded.repartition(args.shards, F.col("shard"))
            .sortWithinPartitions("seq")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.output)
        )
        summary["shards"] = args.shards
    else:
        docs.write.mode("overwrite").parquet(args.output)
    summary["output_docs"] = spark.read.parquet(args.output).count()
    _stage("write")

    if args.pack_seq_len is not None:
        # training-export packing over the FINAL curated corpus.  doc_ids
        # here are xxhash64 values — uniform in the 64-bit space, not
        # dense — so the prefix sum's order-contiguous buckets slice the
        # ID SPACE: bucket_size = 2^52 gives ≤ 4096 buckets no matter how
        # large the corpus, keeping the driver-side cumsum bounded (the
        # dense-id default of 2^22 would make one bucket PER DOC on
        # random ids — a corpus-sized collect).
        from ocr_spark.operators.packing import pack_export, pack_sequences

        tok_col = "bpe_tokens" if args.bpe_merges is not None else None
        # rebase on the parquet written above: the pack stage references
        # the docs subtree THREE more times (the eager totals collect,
        # the manifest side and the _toks side of the export join) and
        # Spark does not reuse-merge identical non-broadcast subtrees
        # (CLAUDE.md) — reading the materialized output back replaces
        # three full re-runs of the curation lineage (incl. bpe_apply's
        # mapInPandas) with columnar scans
        written = spark.read.parquet(args.output)
        manifest = pack_sequences(
            written,
            args.pack_seq_len,
            bucket_size=1 << 52,
            tokens_col=tok_col,
        )
        packed = pack_export(manifest, written, tokens_col=tok_col)
        packed_dir = args.output.rstrip("/") + "_packed"
        packed.write.mode("overwrite").parquet(packed_dir)
        summary["pack_seq_len"] = args.pack_seq_len
        summary["packed_chunks"] = spark.read.parquet(packed_dir).count()
        _stage("pack_export")
    summary["stage_seconds"] = stage_seconds
    summary["seconds"] = round(time.time() - t0, 1)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
