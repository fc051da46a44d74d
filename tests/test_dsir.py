"""DSIR importance resampling (operators/dsir.py): feature extraction,
model fit, log-weight vs a transparent Python reference, Gumbel top-k
sampling semantics, determinism under partitioning, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dsir


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_features(text):
    toks = (text or "").lower().split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(feat, buckets):
    import hashlib

    h = int(hashlib.md5(feat.encode()).hexdigest()[:12], 16)
    return h % buckets


def _py_counts(texts, buckets):
    c = {}
    for t in texts:
        for f in _py_features(t):
            b = _py_bucket(f, buckets)
            c[b] = c.get(b, 0) + 1
    return c


def _py_logw(text, tc, rc, buckets):
    nt, nr = sum(tc.values()), sum(rc.values())
    acc = 0.0
    for f in _py_features(text):
        b = _py_bucket(f, buckets)
        acc += math.log((tc.get(b, 0) + 1) / (nt + buckets))
        acc -= math.log((rc.get(b, 0) + 1) / (nr + buckets))
    return acc


class TestHashedNgramCounts:
    def test_feature_mass_is_2n_minus_1(self, spark):
        # a doc with n tokens contributes n unigrams + n-1 bigrams
        df = _mk(spark, [(1, "a b c"), (2, "x"), (3, None)])
        total = (
            dsir.hashed_ngram_counts(df, buckets=64, hash_mode="portable")
            .agg(F.sum("c"))
            .collect()[0][0]
        )
        # n=3 -> 5, n=1 -> 1, NULL -> '' -> one empty token -> 1
        assert total == 5 + 1 + 1

    def test_counts_match_python_reference(self, spark):
        texts = ["the cat sat", "the cat", "dog the cat sat sat"]
        df = _mk(spark, list(enumerate(texts)))
        got = {
            r.bucket: r.c
            for r in dsir.hashed_ngram_counts(
                df, buckets=32, hash_mode="portable"
            ).collect()
        }
        assert got == _py_counts(texts, 32)

    def test_rejects_bad_buckets(self, spark):
        with pytest.raises(ValueError):
            dsir.hashed_ngram_counts(_mk(spark, [(1, "a")]), buckets=0)

    def test_mismatched_feature_space_raises(self, spark):
        df = _mk(spark, [(1, "a b")])
        c64 = dsir.hashed_ngram_counts(df, 64)
        c32 = dsir.hashed_ngram_counts(df, 32)
        with pytest.raises(ValueError, match="feature spaces"):
            dsir.dsir_weights(df, c64, c32, 64)
        with pytest.raises(ValueError, match="feature spaces"):
            dsir.dsir_weights(df, c64, c64, 64, hash_mode="portable")
        # matched frames (and the guard surviving a persist) pass
        assert dsir.dsir_weights(df, c64.persist(), c64, 64).count() == 1


class TestDsirWeights:
    def test_matches_python_reference(self, spark):
        target = ["clean prose flows here", "clean text here"]
        raw = ["spam spam buy now", "clean prose flows here", "buy spam"]
        b = 256
        tdf, rdf = _mk(spark, list(enumerate(target))), _mk(
            spark, list(enumerate(raw))
        )
        tc = dsir.hashed_ngram_counts(tdf, b, hash_mode="portable")
        rc = dsir.hashed_ngram_counts(rdf, b, hash_mode="portable")
        got = {
            r.doc_id: r
            for r in dsir.dsir_weights(
                rdf, tc, rc, b, hash_mode="portable"
            ).collect()
        }
        ptc, prc = _py_counts(target, b), _py_counts(raw, b)
        for i, t in enumerate(raw):
            assert got[i].n_feats == len(_py_features(t))
            assert got[i].logw == pytest.approx(
                _py_logw(t, ptc, prc, b), abs=1e-12
            )
        # the target-like doc outranks the spam docs
        assert got[1].logw > got[0].logw and got[1].logw > got[2].logw

    def test_unseen_bucket_gets_smoothed_floor(self, spark):
        tdf = _mk(spark, [(1, "alpha")])
        rdf = _mk(spark, [(1, "alpha")])
        b = 512
        tc = dsir.hashed_ngram_counts(tdf, b, hash_mode="portable")
        rc = dsir.hashed_ngram_counts(rdf, b, hash_mode="portable")
        # one never-seen feature: logw = ln(1/(1+B)) - ln(1/(1+B)) = 0
        row = dsir.dsir_weights(
            _mk(spark, [(9, "zzz-never-seen")]), tc, rc, b,
            hash_mode="portable",
        ).collect()[0]
        assert row.n_feats == 1 and row.logw == pytest.approx(0.0)

    def test_partitioning_invariance_bit_exact(self, spark):
        rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 5} filler") for i in
                range(40)]
        df = _mk(spark, rows)
        tc = dsir.hashed_ngram_counts(df.filter("doc_id % 2 = 0"), 128)
        rc = dsir.hashed_ngram_counts(df, 128)
        a = {r.doc_id: r.logw for r in
             dsir.dsir_weights(df.repartition(1), tc, rc, 128).collect()}
        z = {r.doc_id: r.logw for r in
             dsir.dsir_weights(df.repartition(16), tc, rc, 128).collect()}
        assert a == z  # exact float equality — the sorted-fold guarantee

    def test_ratio_join_is_broadcast(self, spark):
        df = _mk(spark, [(i, f"w{i}") for i in range(10)])
        tc = dsir.hashed_ngram_counts(df, 64)
        plan = dsir.dsir_weights(df, tc, tc, 64)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestDsirInline:
    def _corpus(self, spark, n=50):
        rows = [(i, f"tok{i % 11} tok{i % 5} tok{i % 3} tail{i % 2}")
                for i in range(n)]
        return _mk(spark, rows)

    @pytest.mark.parametrize("hash_mode", ["xxhash64", "portable"])
    def test_inline_bit_identical_to_join_path(self, spark, hash_mode):
        df = self._corpus(spark)
        b = 128
        tc = dsir.hashed_ngram_counts(
            df.filter("doc_id % 4 = 0"), b, hash_mode=hash_mode
        )
        rc = dsir.hashed_ngram_counts(df, b, hash_mode=hash_mode)
        joined = {
            r.doc_id: (r.n_feats, r.logw)
            for r in dsir.dsir_weights(
                df, tc, rc, b, hash_mode=hash_mode
            ).collect()
        }
        ratios = dsir.dsir_log_ratios(tc, rc, b, hash_mode=hash_mode)
        inline = {
            r.doc_id: (r.n_feats, r.logw)
            for r in dsir.dsir_weights_inline(
                df, ratios, hash_mode=hash_mode
            ).collect()
        }
        assert inline == joined  # exact float equality, not approx

    def test_inline_plan_has_no_exchange(self, spark):
        df = self._corpus(spark, 10)
        plan = dsir.dsir_weights_inline(
            df, [0.5] * 64
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_oov_floor_fills_unseen_buckets(self, spark):
        df = _mk(spark, [(1, "alpha")])
        tc = dsir.hashed_ngram_counts(df, 512)
        ratios = dsir.dsir_log_ratios(tc, tc, 512)
        assert len(ratios) == 512
        # target == raw: every cell (seen or floor) is exactly 0
        assert set(ratios) == {0.0}

    def test_with_dsir_weight_preserves_columns(self, spark):
        df = self._corpus(spark, 5).withColumn("extra", F.lit("x"))
        out = dsir.with_dsir_weight(df, [0.25] * 16)
        assert set(out.columns) == {
            "doc_id", "text", "extra", "n_feats", "logw"
        }
        row = out.filter("doc_id = 0").collect()[0]
        # 4 unigrams + 3 bigrams, every bucket scores 0.25
        assert row.n_feats == 7 and row.logw == pytest.approx(7 * 0.25)

    def test_rejects_empty_ratios(self, spark):
        with pytest.raises(ValueError):
            dsir.with_dsir_weight(self._corpus(spark, 2), [])


class TestDsirSample:
    def _weights(self, spark, n=60):
        # heavy head: docs 0-4 get logw 50.., the rest ~0
        rows = [(i, 50.0 + i if i < 5 else float(i % 3) / 10) for i in
                range(n)]
        return spark.createDataFrame(rows, "doc_id bigint, logw double")

    def test_k_without_replacement_and_deterministic(self, spark):
        w = self._weights(spark)
        s1 = dsir.dsir_sample(w, 10).collect()
        s2 = dsir.dsir_sample(w, 10).collect()
        ids = [r.doc_id for r in s1]
        assert len(ids) == 10 and len(set(ids)) == 10
        assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))

    def test_weight_dominance_and_salt_redeal(self, spark):
        w = self._weights(spark)
        picked = {r.doc_id for r in dsir.dsir_sample(w, 10).collect()}
        # logw 50+ vs Gumbel noise (stddev ~1.3): the head always wins
        assert {0, 1, 2, 3, 4} <= picked
        other = {r.doc_id for r in
                 dsir.dsir_sample(w, 10, salt="v2").collect()}
        assert picked != other  # the tail re-deals with the salt

    def test_salted_rank_matches_single_stage(self, spark):
        w = self._weights(spark, n=97)
        a = sorted(r.doc_id for r in dsir.dsir_sample(w, 20, salts=1)
                   .collect())
        b = sorted(r.doc_id for r in dsir.dsir_sample(w, 20, salts=16)
                   .collect())
        assert a == b  # two-stage top-k is exact

    def test_gumbel_key_reproducible_formula(self, spark):
        import hashlib

        w = spark.createDataFrame([(7, 1.5)], "doc_id bigint, logw double")
        row = dsir.dsir_sample(w, 1).collect()[0]
        h = int(hashlib.md5(b"dsir:v1:7").hexdigest()[:12], 16)
        u = (h + 1) / float((1 << 48) + 1)
        assert row.gumbel_key == pytest.approx(
            1.5 - math.log(-math.log(u)), rel=1e-15
        )

    def test_rejects_bad_k(self, spark):
        with pytest.raises(ValueError):
            dsir.dsir_sample(self._weights(spark), 0)
