#!/usr/bin/env python
"""One-off A/B scale probes backing the r5 BENCH.md evidence rows.

Not part of bench.py's per-round JSON (each probe deliberately runs a
known-bad plan shape for comparison); run manually::

    python tools/scale_probes.py ann      # id-only pair join vs the old
                                          # vector-through-distinct shape
                                          # at dim 256
    python tools/scale_probes.py bloom    # single-join bitmap probe vs
                                          # the k-broadcast probe at
                                          # m = 2^28

Both probes print one JSON line.  Methodology follows BENCH.md: fresh
process per probe, best-of-2 per variant, JVM-side data generation with
a localCheckpoint so the timed window is the operator, not the
generator.

``ann`` replays the exact pre-r5 ``lsh_topk`` shape (the distinct and
rerank carried ``c_vec``/``q_vec`` through the bucket join —
similarity.py's r4 state, VERDICT r4 "What's wrong" #2) against the
shipped id-only shape, at a dimension where the payload matters
(256 doubles ≈ 2 KB/vector; the r4 bench corpus was dim 8, which is why
the defect was invisible there).

``bloom`` compares ``incremental_dedup(probe_mode='broadcast-k')``
(bloom_flag: k broadcast joins, each shipping the full mask table —
Spark does not reuse-merge the identical broadcasts, measured r4)
against ``probe_mode='single-join'`` (bloom_probe_digests: the bitmap
appears ONCE in the plan; probes explode to rows) at the large-``m``
regime the single-join mode exists for.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across all completed stages so far
    (Spark UI REST; the probes enable the UI for exactly this).  The
    per-variant DELTA is the cluster-relevant number local wall-time
    can't show: on one JVM a shuffle is a memory copy, on 1000
    executors it is the network."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _timed(df, reps: int = 2) -> tuple[float, int]:
    """(best-of-reps seconds, shuffle-write bytes of ONE run)."""
    spark = df.sparkSession
    best = float("inf")
    before = _shuffle_write_bytes(spark)
    t0 = time.time()
    _noop(df)
    best = min(best, time.time() - t0)
    bytes_one = _shuffle_write_bytes(spark) - before
    for _ in range(reps - 1):
        t0 = time.time()
        _noop(df)
        best = min(best, time.time() - t0)
    return round(best, 2), bytes_one


def probe_ann(n: int = 200_000, dim: int = 256, n_queries: int = 256) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.operators import similarity
    from ocr_spark.operators.similarity import (
        _dot,
        _norm,
        hyperplane_signature,
    )
    from ocr_spark.session import get_spark

    spark = get_spark(
        "ann-probe", cores=None, extra_conf={"spark.ui.enabled": "true"}
    )
    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), j -> "
                f"CAST(pmod(xxhash64(id, j), 2001) - 1000 AS DOUBLE) "
                f"/ 1000.0D)"
            ).alias("embedding"),
        )
        .localCheckpoint()  # time the join machinery, not the generator
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).localCheckpoint()

    def lsh_topk_vec_through(df, qs_df, k=10, planes=16):
        """The r4 shape, verbatim semantics: vectors ride the bucket
        join and the distinct (similarity.py pre-r5; kept ONLY here,
        as the A/B baseline)."""
        from pyspark.sql import Window

        half = planes // 2
        mask = (1 << half) - 1

        def banded(x, pref):
            s = hyperplane_signature(
                x.select("vec_id", "embedding"), "embedding", planes
            )
            withv = s.join(
                x.select(
                    F.col("vec_id"),
                    F.col("embedding").alias(f"{pref}_vec"),
                ),
                "vec_id",
            )
            return withv.select(
                F.col("vec_id").alias(f"{pref}_id"),
                f"{pref}_vec",
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(0).alias("band"),
                            F.expr(f"sig & {mask}").alias("key"),
                        ),
                        F.struct(
                            F.lit(1).alias("band"),
                            F.expr(f"shiftright(sig, {half})").alias("key"),
                        ),
                    )
                ).alias("bk"),
            ).select(f"{pref}_id", f"{pref}_vec", "bk.band", "bk.key")

        cand = (
            banded(df, "c")
            .join(F.broadcast(banded(qs_df, "q")), on=["band", "key"])
            .filter(F.col("c_id") != F.col("q_id"))
            .select("q_id", "c_id", "c_vec", "q_vec")
            .distinct()
            .withColumn(
                "cos",
                F.expr(
                    f"{_dot('c_vec', 'q_vec')} / "
                    f"({_norm('c_vec')} * {_norm('q_vec')})"
                ),
            )
        )
        w = Window.partitionBy("q_id").orderBy(
            F.desc("cos"), F.col("c_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.col("q_id").alias("query_id"),
                F.col("c_id").alias("neighbor_id"),
                "rank",
                "cos",
            )
        )

    new_df = similarity.lsh_topk(corpus, queries, k=10)
    old_df = lsh_topk_vec_through(corpus, queries, k=10)
    # same candidates, same ranks — the A/B changes the plan only
    mismatch = new_df.exceptAll(old_df).count() + old_df.exceptAll(
        new_df
    ).count()
    id_sec, id_bytes = _timed(new_df)
    old_sec, old_bytes = _timed(old_df)
    out = {
        "probe": "ann_idonly_vs_vecthrough",
        "n": n,
        "dim": dim,
        "n_queries": n_queries,
        "result_mismatch_rows": mismatch,
        "id_only_sec": id_sec,
        "vec_through_sec": old_sec,
        "id_only_shuffle_mb": round(id_bytes / 2**20, 1),
        "vec_through_shuffle_mb": round(old_bytes / 2**20, 1),
    }
    out["speedup"] = round(out["vec_through_sec"] / out["id_only_sec"], 2)
    out["shuffle_reduction"] = (
        round(old_bytes / id_bytes, 1) if id_bytes else None
    )
    spark.stop()
    return out


def probe_bloom(
    n_old: int = 2_000_000, n_new: int = 2_000_000, m_bits: int = 2**28
) -> dict:
    from pyspark.sql import functions as F

    from ocr_spark.operators import bloom
    from ocr_spark.session import get_spark

    spark = get_spark(
        "bloom-probe", cores=None, extra_conf={"spark.ui.enabled": "true"}
    )

    def corpus(n, offset, name):
        return (
            spark.range(n)
            .select(
                F.concat(
                    F.lit(f"document body {name} number "),
                    (F.col("id") + offset).cast("string"),
                ).alias("text")
            )
            .localCheckpoint()
        )

    # same text template for both sides: new ids start at n_old/2, so
    # half the new snapshot repeats old content (revisits), half is fresh
    old = corpus(n_old, 0, "old")
    new = corpus(n_new, n_old // 2, "old")
    results = {
        "probe": "bloom_singlejoin_vs_kbroadcast",
        "n_old": n_old,
        "n_new": n_new,
        "m_bits": m_bits,
        "k": 4,
    }
    counts = {}
    for mode in ("single-join", "broadcast-k"):
        best = float("inf")
        before = _shuffle_write_bytes(spark)
        for rep in range(2):
            t0 = time.time()
            got = bloom.incremental_dedup(
                new, old, m_bits=m_bits, k=4, probe_mode=mode
            )
            counts[mode] = got.count()
            best = min(best, time.time() - t0)
            if rep == 0:
                results[mode.replace("-", "_") + "_shuffle_mb"] = round(
                    (_shuffle_write_bytes(spark) - before) / 2**20, 1
                )
        results[mode.replace("-", "_") + "_sec"] = round(best, 2)
    # the broadcast-k mode's distinguishing cost is not a shuffle: it
    # ships the (word, mask) table to every executor k times.  Measure
    # the table once and report the per-executor payload arithmetic.
    bitmap_rows = bloom.bloom_bitmap(old, m_bits=m_bits, k=4).count()
    results["bitmap_rows"] = bitmap_rows
    results["broadcast_k_payload_mb_per_executor"] = round(
        bitmap_rows * 16 * 4 / 2**20, 1
    )
    results["rows_match"] = counts["single-join"] == counts["broadcast-k"]
    results["kept_rows"] = counts["single-join"]
    spark.stop()
    return results


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ann"
    extra = [int(float(x)) for x in sys.argv[2:]]
    if which == "ann":
        print(json.dumps(probe_ann(*extra)))
    elif which == "bloom":
        print(json.dumps(probe_bloom(*extra)))
    else:
        raise SystemExit(f"unknown probe {which!r}")
