"""Unit tests for the round-3 text/curation additions: Gopher quality
flags, unigram log-prob scoring, token-window chunking, deterministic
split assignment, hard-negative mining."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.curation import (
    assign_split,
    hard_negatives,
)
from fred_economic_data_pipeline_local_spark.operators.text import (
    chunk_tokens,
    gopher_quality_flags,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherFlags:
    def test_short_doc_fails_word_count_only_rules_it_fails(self, spark):
        df = _docs(spark, [(1, "the cat sat on a mat")])  # 6 tokens
        row = gopher_quality_flags(df).collect()[0]
        assert not row.r_word_count
        assert not row.q_keep

    def test_good_doc_keeps(self, spark):
        text = " ".join(["the quick brown fox jumps over a lazy dog and"] * 3)
        df = _docs(spark, [(1, text)])  # 30 tokens, clean prose
        row = gopher_quality_flags(df).collect()[0]
        assert row.r_word_count and row.r_mean_word_len and row.r_symbol_ratio
        assert row.r_alpha_words and row.r_stopwords
        assert row.q_keep

    def test_symbol_heavy_doc_fails_symbol_rule(self, spark):
        words = ["the", "and", "word"] * 8
        text = " ".join(words) + " " + " ".join(["#"] * 6)  # 6 symbols / 30 tokens
        row = gopher_quality_flags(_docs(spark, [(1, text)])).collect()[0]
        assert not row.r_symbol_ratio
        assert not row.q_keep

    def test_numeric_doc_fails_alpha_rule(self, spark):
        text = " ".join(["123"] * 18 + ["the", "and"])
        row = gopher_quality_flags(_docs(spark, [(1, text)])).collect()[0]
        assert not row.r_alpha_words


class TestUnigramLogprob:
    def test_matches_hand_computation(self, spark):
        # corpus: "a a b" + "b c" -> counts a:2 b:2 c:1, N=5
        df = _docs(spark, [(1, "a a b"), (2, "b c")])
        out = {r.id: r for r in unigram_logprob(df).collect()}
        lp_a, lp_b, lp_c = math.log(2 / 5), math.log(2 / 5), math.log(1 / 5)
        assert out[1].n_tokens == 3
        assert out[1].logprob == pytest.approx(
            round((lp_a + lp_a + lp_b) / 3, 6), abs=1e-6
        )
        assert out[2].logprob == pytest.approx(round((lp_b + lp_c) / 2, 6), abs=1e-6)

    def test_rare_token_doc_scores_lower(self, spark):
        rows = [(i, "common words here again") for i in range(10)]
        rows.append((99, "zyzzyva qwerty plugh"))
        out = {r.id: r.logprob for r in unigram_logprob(_docs(spark, rows)).collect()}
        assert out[99] < out[0]


class TestChunkTokens:
    def test_window_stride_layout(self, spark):
        df = _docs(spark, [(1, "a b c d e")])
        rows = sorted(
            chunk_tokens(df, window=3, stride=2).collect(), key=lambda r: r.chunk_id
        )
        assert [(r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in rows] == [
            (0, "a b c", 3),
            (1, "c d e", 3),
            (2, "e", 1),
        ]

    def test_every_token_covered_and_chunk_zero_exists(self, spark):
        df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(50)))])
        rows = chunk_tokens(df, window=8, stride=5).collect()
        assert min(r.chunk_id for r in rows) == 0
        covered = set()
        for r in rows:
            covered.update(r.chunk_text.split())
        assert covered == {f"t{i}" for i in range(50)}

    def test_short_doc_single_chunk(self, spark):
        rows = chunk_tokens(_docs(spark, [(1, "only two")]), window=32, stride=24).collect()
        assert len(rows) == 1 and rows[0].chunk_text == "only two"


class TestAssignSplit:
    def test_deterministic_and_total(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in assign_split(df).collect()}
        b = {r.doc_id: r.split for r in assign_split(df).collect()}
        assert a == b
        assert set(a.values()) == {"train", "val", "test"}

    def test_proportions_roughly_match_weights(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        counts = (
            assign_split(df).groupBy("split").count().rdd.collectAsMap()
        )
        assert counts["train"] / 2000 == pytest.approx(0.9, abs=0.05)
        assert counts["val"] / 2000 == pytest.approx(0.05, abs=0.03)
        assert counts["test"] / 2000 == pytest.approx(0.05, abs=0.03)

    def test_rejects_bad_weights(self, spark):
        df = spark.range(10).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            assign_split(df, weights=(("train", 50), ("test", 40)))


class TestHardNegatives:
    @pytest.fixture()
    def emb(self, spark):
        # two clusters on orthogonal axes plus a near-miss with wrong label
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0], 0),
            (2, [0.8, 0.2, 0.0], 1),  # hard negative for label-0 queries
            (3, [0.0, 1.0, 0.0], 1),
            (4, [0.0, 0.9, 0.1], 1),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_negatives_never_share_label(self, emb):
        out = hard_negatives(emb, k=3, unbounded=True).collect()
        labels = {0: 0, 1: 0, 2: 1, 3: 1, 4: 1}
        for r in out:
            assert labels[r.query_id] != r.neg_label

    def test_hardest_negative_ranks_first(self, emb):
        out = [
            r
            for r in hard_negatives(emb, k=3, unbounded=True).collect()
            if r.query_id == 0
        ]
        best = max(out, key=lambda r: r.cos_sim)
        assert best.neg_id == 2  # the near-miss, not the orthogonal vectors

    def test_k_bounds_output(self, emb):
        out = hard_negatives(emb, k=1, unbounded=True).collect()
        per_query = {}
        for r in out:
            per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
        assert all(v == 1 for v in per_query.values())


class TestScoreLinear:
    def test_matches_hand_sigmoid(self, spark):
        import math

        from fred_economic_data_pipeline_local_spark.operators.text import score_linear

        df = _docs(spark, [(1, "good good bad"), (2, "neutral words")])
        out = {r.id: r for r in score_linear(df, {"good": 1.0, "bad": -2.0}).collect()}
        assert out[1].score == pytest.approx(
            round(1 / (1 + math.exp(-((1.0 + 1.0 - 2.0) / 3))), 6), abs=1e-6
        )
        assert out[2].score == pytest.approx(0.5, abs=1e-6)  # all OOV -> logit 0

    def test_bias_shifts_score(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import score_linear

        df = _docs(spark, [(1, "x y z")])
        lo = score_linear(df, {}, bias=-1.0).collect()[0].score
        hi = score_linear(df, {}, bias=1.0).collect()[0].score
        assert lo < 0.5 < hi


class TestResolveNeardups:
    def test_keeps_min_per_component_and_singletons(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.dedup import (
            resolve_neardups,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
        )
        # components: {0,1,2} via chain 0-1, 1-2; {4,5}; 3 singleton
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
        )
        out = sorted(
            (r.doc_id, r.component)
            for r in resolve_neardups(docs, pairs, id_col="doc_id").collect()
        )
        assert out == [(0, 0), (3, 3), (4, 4)]


class TestReviewFixes:
    def test_resolve_neardups_with_id_col_named_id(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.dedup import (
            resolve_neardups,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(4)], "id long, text string"
        )
        pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        out = sorted(
            (r.id, r.component)
            for r in resolve_neardups(docs, pairs, id_col="id").collect()
        )
        assert out == [(0, 0), (2, 2), (3, 3)]

    def test_unigram_logprob_external_vocab_scores_oov(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            unigram_logprob,
        )

        docs = _docs(spark, [(1, "known known strange"), (2, "gibberish only")])
        vocab = spark.createDataFrame([("known", 8), ("only", 2)], "tok string, n long")
        out = {r.id: r for r in unigram_logprob(docs, vocab=vocab).collect()}
        # every doc present, OOV tokens floored rather than dropped
        assert set(out) == {1, 2}
        assert out[1].n_tokens == 3 and out[2].n_tokens == 2
        # all-known doc outranks the half-gibberish one under the floor
        assert out[2].logprob < out[1].logprob

    def test_hard_negatives_n_query_counts_rows_not_id_threshold(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.curation import (
            hard_negatives,
        )

        rows = [
            (1000, [1.0, 0.0], 0),
            (1001, [0.9, 0.1], 1),
            (1002, [0.0, 1.0], 0),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = hard_negatives(emb, k=1, n_query=2).collect()
        assert {r.query_id for r in out} == {1000, 1001}


class TestWinnowFingerprints:
    """The SIGMOD'03 winnowing guarantees, pinned on planted spans."""

    def test_containment_pair_found_where_jaccard_misses(self, spark):
        """A 10-token span pasted inside a 60-token doc: Jaccard >= 0.5
        can't see it (union dominates), winnowing must (shared run of
        10 >= k + w - 1 = 6 tokens guarantees a fingerprint collision)."""
        from fred_economic_data_pipeline_local_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from fred_economic_data_pipeline_local_spark.operators.text import (
            span_overlap_pairs,
        )

        span = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        long_doc = (
            " ".join(f"filler{j}" for j in range(25))
            + f" {span} "
            + " ".join(f"tail{j}" for j in range(25))
        )
        docs = spark.createDataFrame(
            [(1, span), (2, long_doc), (3, "unrelated words only here now")],
            "doc_id long, text string",
        )
        jac = ngram_jaccard_pairs(
            docs, block_col=None, shingle_k=2, threshold=0.5
        )
        assert jac.count() == 0  # containment is invisible to set Jaccard
        pairs = {
            (r.id_a, r.id_b)
            for r in span_overlap_pairs(docs, min_shared=1).collect()
        }
        assert (1, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_disjoint_docs_share_no_fingerprints(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            span_overlap_pairs,
        )

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"a{j}" for j in range(30))),
                (2, " ".join(f"b{j}" for j in range(30))),
            ],
            "doc_id long, text string",
        )
        assert span_overlap_pairs(docs, min_shared=1).count() == 0

    def test_short_docs_yield_no_fingerprints(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            winnow_fingerprints,
        )

        docs = spark.createDataFrame(
            [(1, "just two"), (2, "one"), (3, "")],
            "doc_id long, text string",
        )
        # no complete k=3 gram (let alone a w=4 window) exists
        assert winnow_fingerprints(docs).count() == 0

    def test_fingerprints_are_subset_of_gram_hashes_and_dense_enough(
        self, spark
    ):
        """Winnowing selects ~2/(w+1) of gram positions; at minimum one
        fingerprint per complete window must exist, and every doc long
        enough for a window has >= 1 fingerprint."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            winnow_fingerprints,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{i}w{j}" for j in range(20))) for i in range(8)],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(docs)
        per_doc = {r["id"]: r["n"] for r in fps.groupBy("id").count().withColumnRenamed("count", "n").collect()}
        # 20 tokens -> 18 grams -> 15 complete windows; selected count is
        # between 1 and the window count
        assert set(per_doc) == set(range(8))
        assert all(1 <= n <= 15 for n in per_doc.values())


class TestTfidfTopTerms:
    def test_hand_computed_scores(self, spark):
        """3 docs: 'the' appears in all (idf 0, scores exactly 0),
        'cat' in one (idf ln 3), tf multiplies."""
        import math

        from fred_economic_data_pipeline_local_spark.operators.text import (
            tfidf_top_terms,
        )

        docs = _docs(
            spark,
            [(1, "the cat cat"), (2, "the dog"), (3, "the bird")],
        )
        rows = {
            (r["id"], r["term"]): r
            for r in tfidf_top_terms(docs, k=5).collect()
        }
        assert rows[(1, "the")]["tfidf"] == 0.0
        assert rows[(1, "cat")]["tf"] == 2
        assert rows[(1, "cat")]["tfidf"] == pytest.approx(
            round(2 * math.log(3), 6), abs=1e-9
        )

    def test_top_k_cut_and_tiebreak(self, spark):
        """6 distinct equal-score terms, k=3: the 3 alphabetically
        first survive (deterministic tie policy)."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            tfidf_top_terms,
        )

        docs = _docs(spark, [(1, "b f a e c d"), (2, "zzz")])
        kept = sorted(
            r["term"]
            for r in tfidf_top_terms(docs, k=3).where(F.col("id") == 1).collect()
        )
        assert kept == ["a", "b", "c"]


class TestTopkNgrams:
    def test_counts_and_order(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            topk_ngrams,
        )

        docs = _docs(
            spark,
            [(1, "a b a b"), (2, "a b c"), (3, "x")],
        )
        rows = topk_ngrams(docs, n=2, k=10).collect()
        freqs = {r["ngram"]: r["freq"] for r in rows}
        assert freqs == {"a b": 3, "b a": 1, "b c": 1}
        # ordering: freq desc then ngram asc
        assert [r["ngram"] for r in rows] == ["a b", "b a", "b c"]

    def test_short_docs_contribute_nothing(self, spark):
        """Docs with < n tokens must not produce descending-sequence
        garbage grams (Spark's sequence(1, 0) is [1, 0], not empty)."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            topk_ngrams,
        )

        docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a trigram here")])
        rows = topk_ngrams(docs, n=3, k=10).collect()
        assert {r["ngram"] for r in rows} == {"a trigram here"}


class TestCompressionRatio:
    def test_matches_direct_zlib(self, spark):
        """The distributed result must equal a driver-side zlib pass over
        the same rows byte-for-byte — proving the Arrow plumbing (batch
        boundaries, null handling, dtypes) changes nothing."""
        import zlib

        from fred_economic_data_pipeline_local_spark.operators.text import (
            compression_ratio,
        )

        docs = _docs(
            spark,
            [
                (1, "abc " * 200),          # repetitive -> tiny ratio
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, ""),                    # empty -> NULL ratio
                (4, None),                  # null text -> NULL everything
            ],
        )
        got = {r["id"]: r for r in compression_ratio(docs).collect()}
        for i, t in [(1, "abc " * 200), (2, "the quick brown fox jumps over the lazy dog")]:
            raw = t.encode()
            assert got[i]["n_bytes"] == len(raw)
            assert got[i]["n_deflate"] == len(zlib.compress(raw, 6))
            assert got[i]["ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert got[3]["n_bytes"] == 0 and got[3]["ratio"] is None
        assert got[4]["n_bytes"] is None and got[4]["ratio"] is None

    def test_orders_boilerplate_below_prose_below_noise(self, spark):
        """The gate's reason to exist: repetitive < prose < high-entropy."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            compression_ratio,
        )

        import hashlib

        noise = " ".join(
            hashlib.md5(str(i).encode()).hexdigest() for i in range(40)
        )
        prose = (
            "a reasonably normal english sentence with varied words appears "
            "here and continues for a while because short strings pay the "
            "deflate header overhead and would not separate cleanly "
        ) * 4
        docs = _docs(
            spark,
            [(1, "dup dup dup " * 100), (2, prose), (3, noise)],
        )
        r = {x["id"]: x["ratio"] for x in compression_ratio(docs).collect()}
        assert r[1] < r[2] < r[3]



class TestBpe:
    @staticmethod
    def _ref_bpe(texts, n_merges, min_freq):
        """Classic sequential BPE: the independent reference."""
        wf = {}
        for t in texts:
            for w in t.lower().strip().split():
                if w:
                    wf[w] = wf.get(w, 0) + 1
        syms = {w: [c for c in w] for w in wf}
        merges = []
        for _ in range(n_merges):
            pc = {}
            for w, ss in syms.items():
                for i in range(len(ss) - 1):
                    pc[(ss[i], ss[i + 1])] = pc.get((ss[i], ss[i + 1]), 0) + wf[w]
            if not pc:
                break
            (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if n < min_freq:
                break
            merges.append((a, b, n))
            for w, ss in syms.items():
                out, i = [], 0
                while i < len(ss):
                    if i < len(ss) - 1 and ss[i] == a and ss[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(ss[i])
                        i += 1
                syms[w] = out
        return merges, syms

    def test_merges_match_pure_python_on_fixture(self, spark):
        """Distributed pair-count + regexp merge == the classic
        sequential algorithm, merge for merge (same pairs, same
        frequencies, same order), on the real fixture corpus."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bpe_train,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r["text"] for r in docs.select("text").collect() if r["text"]]
        want, _ = self._ref_bpe(texts, n_merges=8, min_freq=2)
        got, _vocab = bpe_train(docs, n_merges=8, min_freq=2)
        assert got == want

    def test_tokenize_counts_match_reference_segmentation(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bpe_tokenize,
            bpe_train,
        )

        docs = _docs(
            spark,
            [(1, "low low low lower lower newest newest newest widest"),
             (2, "low lowest newest widest widest")],
        )
        texts = [
            "low low low lower lower newest newest newest widest",
            "low lowest newest widest widest",
        ]
        merges, _ = bpe_train(docs, n_merges=6, min_freq=2)
        _, syms = self._ref_bpe(texts, n_merges=6, min_freq=2)
        got = {r["id"]: r for r in bpe_tokenize(docs, merges).collect()}
        for i, t in enumerate(texts, start=1):
            words = t.split()
            want_tokens = sum(len(syms[w]) for w in words)
            assert got[i]["n_words"] == len(words)
            assert got[i]["n_bpe_tokens"] == want_tokens

    def test_merge_is_greedy_left_nonoverlapping(self, spark):
        """'a a a' under merge (a, a) must become 'aa a', not 'aa aa' --
        the non-overlapping left-to-right scan both implementations use."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bpe_tokenize,
        )

        docs = _docs(spark, [(1, "aaa aaa")])
        out = bpe_tokenize(docs, [("a", "a", 99)]).collect()[0]
        # each 'aaa' -> [aa, a] = 2 tokens
        assert out["n_bpe_tokens"] == 4


class TestBigramLogprob:
    def test_word_salad_scores_below_prose_with_same_unigrams(self, spark):
        """The screen's reason to exist: a scrambled doc shares the
        unigram distribution with its source (unigram_logprob ties) but
        not the transitions (bigram_logprob separates)."""
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bigram_logprob,
            unigram_logprob,
        )

        prose = "the cat sat on the mat"
        salad = "mat the on sat cat the"  # same multiset of tokens
        rows = [(i, prose) for i in range(8)] + [(99, salad)]
        docs = _docs(spark, rows)
        bi = {r["id"]: r["logprob"] for r in bigram_logprob(docs).collect()}
        uni = {r["id"]: r["logprob"] for r in unigram_logprob(docs).collect()}
        assert uni[99] == uni[0]          # unigram screen is blind
        assert bi[99] < bi[0]             # bigram screen is not

    def test_single_token_doc_scores_pure_unigram(self, spark):
        import math

        from fred_economic_data_pipeline_local_spark.operators.text import (
            bigram_logprob,
        )

        docs = _docs(spark, [(1, "a a b"), (2, "b")])
        # corpus tokens: a a b b -> N=4, c(b)=2; doc 2 = one token, no prev
        out = {r["id"]: r for r in bigram_logprob(docs).collect()}
        assert out[2]["n_tokens"] == 1
        assert out[2]["logprob"] == pytest.approx(round(math.log(2 / 4), 6), abs=1e-9)


class TestUnigramDrift:
    def test_planted_token_tops_ranking_and_invariants(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            unigram_drift,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        old = docs.select("text")
        new = docs.select(
            F.concat(F.col("text"), F.lit(" zqdrift")).alias("text")
        )
        got = unigram_drift(old, new, top_n=10).collect()
        # the token every new doc gained dominates the drift ranking,
        # over-represented in the NEW snapshot (positive contribution)
        assert got[0]["token"] == "zqdrift"
        assert got[0]["contribution"] > 0
        assert got[0]["p_new"] > got[0]["p_old"]
        # ranking is by |contribution| desc with token tiebreak
        mags = [abs(r["contribution"]) for r in got]
        assert mags == sorted(mags, reverse=True)

    def test_identical_snapshots_have_zero_drift(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            unigram_drift,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = unigram_drift(docs, docs, top_n=5).collect()
        assert all(r["contribution"] == 0.0 for r in got)
