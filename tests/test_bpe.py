"""BPE tokenizer training + application (ocr_spark.operators.bpe).

The hard gate is a DIFFERENTIAL against a transparent single-machine
reference implementation of Sennrich et al. 2016 (written here, ~30
lines): the distributed trainer must learn the identical merge list, and
the distributed apply must tokenize every document identically.  Plus:
greedy-overlap semantics pinned, partitioning invariance, the min_count
early stop, the exact salted word-table cap, detokenization round-trip,
and plan shape (vocab-bounded aggregation, no cartesian join).
"""

from collections import Counter

import pytest

from ocr_spark.operators import bpe


def local_bpe_train(word_cnt: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference trainer: straight from the paper's algorithm 1, with the
    repo's deterministic tie-break (count desc, pair asc) and space END
    marker."""
    state = {
        w: (list(w) + [bpe.END], c) for w, c in word_cnt.items() if w != ""
    }
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in state.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best_c = max(pc.values())
        if best_c < min_count:
            break
        pair = min(p for p, c in pc.items() if c == best_c)
        merges.append(pair)
        left, right = pair
        for w, (syms, c) in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = (out, c)
    return merges


CORPUS = [
    (1, "the cat sat on the mat and the rat sat there"),
    (2, "then ten thin hens went in the rain"),
    (3, "banana bandana and a canal plan"),
    (4, None),
    (5, "aaa aaab baaa aa"),
    (6, "the theory of the theme is thorough"),
    (7, "Mixed CASE Words lower the same WAY"),
    (8, "punct, stays. glued-to words!  double  spaces"),
    (9, "sat sat sat mat mat the the the the"),
]


class TestTrainer:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(CORPUS, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def wc(self, docs):
        return bpe.word_counts(docs).persist()

    def test_word_counts_drop_empty_and_lowercase(self, wc):
        rows = {r.word: r.cnt for r in wc.collect()}
        assert "" not in rows
        assert rows["the"] == 11  # incl. lowered 'the' from doc 7
        assert rows["case"] == 1 and "CASE" not in rows
        assert rows["punct,"] == 1  # punctuation glues, as whitespace split

    def test_differential_vs_reference(self, wc):
        got = bpe.bpe_train(wc, 20, min_count=2)
        want = local_bpe_train(
            {r.word: r.cnt for r in wc.collect()}, 20, min_count=2
        )
        assert got == want and len(got) > 5

    def test_partitioning_invariance(self, wc):
        a = bpe.bpe_train(wc.repartition(1), 8)
        b = bpe.bpe_train(wc.repartition(16, "word"), 8)
        assert a == b

    def test_greedy_overlap_semantics(self, spark):
        """'aaaa' + merge (a,a) collapses left-to-right non-overlapping:
        one round yields [aa, aa, END], never [aa, a, a, END] or a
        re-scan within the round."""
        wc = spark.createDataFrame([("aaaa", 10)], "word string, cnt long")
        state = bpe.initial_state(wc)
        merges = bpe.bpe_train(wc, 1)
        assert merges == [("a", "a")]
        from pyspark.sql import functions as F

        merged = state.withColumn(
            "syms", bpe._merge_fold(F.col("syms"), "a", "a")
        ).collect()[0]
        assert list(merged.syms) == ["aa", "aa", bpe.END]

    def test_min_count_early_stop(self, spark):
        """All pairs unique (count 1) → zero merges at min_count=2, and
        the requested budget is not silently consumed."""
        wc = spark.createDataFrame(
            [("abc", 1), ("def", 1)], "word string, cnt long"
        )
        assert bpe.bpe_train(wc, 10, min_count=2) == []
        # with min_count=1 training proceeds deterministically
        got = bpe.bpe_train(wc, 3, min_count=1)
        assert got == local_bpe_train({"abc": 1, "def": 1}, 3, min_count=1)

    def test_checkpoint_boundary_equivalence(self, wc):
        """Lineage cuts must not change the learned merges."""
        assert bpe.bpe_train(wc, 9, checkpoint_every=2) == bpe.bpe_train(
            wc, 9, checkpoint_every=100
        )

    def test_cap_word_table_exact_and_salt_invariant(self, wc):
        rows = [(r.word, r.cnt) for r in wc.collect()]
        want = sorted(rows, key=lambda t: (-t[1], t[0]))[:10]
        got = sorted(
            [(r.word, r.cnt) for r in bpe.cap_word_table(wc, 10).collect()],
            key=lambda t: (-t[1], t[0]),
        )
        unsalted = sorted(
            [
                (r.word, r.cnt)
                for r in bpe.cap_word_table(wc, 10, salts=1).collect()
            ],
            key=lambda t: (-t[1], t[0]),
        )
        assert got == want == unsalted
        with pytest.raises(ValueError, match=">= 1"):
            bpe.cap_word_table(wc, 0)


class TestApply:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(CORPUS, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def merges(self, docs):
        return bpe.bpe_train(bpe.word_counts(docs), 15)

    def test_apply_matches_reference_tokenizer(self, docs, merges):
        ranks = {p: i for i, p in enumerate(merges)}
        got = {
            r.doc_id: list(r.tokens)
            for r in bpe.bpe_apply(docs, merges).collect()
        }
        for doc_id, text in CORPUS:
            words = (text or "").lower().split(" ")
            want = [t for w in words for t in bpe.tokenize_word(w, ranks)]
            assert got[doc_id] == want, doc_id

    def test_detokenize_round_trip(self, docs, merges):
        """concat(tokens) == lowercased text + one trailing END marker —
        the END-as-separator property that makes the space marker safe."""
        out = bpe.bpe_apply(docs, merges).collect()
        src = {d: t for d, t in CORPUS}
        for r in out:
            assert "".join(r.tokens) == (src[r.doc_id] or "").lower() + " "
            assert r.n_tokens == len(r.tokens)

    def test_zero_merges_is_char_split(self, docs):
        got = {
            r.doc_id: list(r.tokens)
            for r in bpe.bpe_apply(docs, []).collect()
        }
        assert got[4] == [bpe.END]  # NULL text → one empty word
        assert got[1][:4] == ["t", "h", "e", bpe.END]

    def test_token_order_partitioning_invariant(self, docs, merges):
        a = {
            r.doc_id: list(r.tokens)
            for r in bpe.bpe_apply(docs.repartition(1), merges).collect()
        }
        b = {
            r.doc_id: list(r.tokens)
            for r in bpe.bpe_apply(docs.repartition(7), merges).collect()
        }
        assert a == b

    def test_rank_order_matters(self):
        """Apply must replay merges by RANK, not by scan convenience:
        with ranks [(e,END), (h,e)], word 'he' merges e+END first (rank
        0), leaving 'h'+'e ' for rank-1's (h,e)-pair which no longer
        matches — tokenize accordingly."""
        toks = bpe.tokenize_word("he", {("e", bpe.END): 0, ("h", "e"): 1})
        assert toks == ["h", "e "]
        toks2 = bpe.tokenize_word("he", {("h", "e"): 0, ("e", bpe.END): 1})
        assert toks2 == ["he", bpe.END]


class TestPlans:
    def test_pair_counts_vocab_bounded_aggregation(self, spark):
        """The per-round aggregation must plan a partial (map-side
        combined) hash aggregate and no cartesian product."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pc = bpe.pair_counts(bpe.initial_state(bpe.word_counts(docs)))
        plan = pc._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "partial" in plan.lower()  # map-side combine before exchange

    def test_apply_join_not_cartesian(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = bpe.bpe_apply(docs, [("e", bpe.END)])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
