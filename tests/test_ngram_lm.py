"""Count-based bigram LM: train / score / filter (functions/ngram_lm)."""

from __future__ import annotations

import math

import pytest

from genegraph_spark.functions import ngram_lm as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTrain:
    def test_counts_with_bos(self, spark):
        uni, bi = LM.train_bigram_lm(_docs(spark, [
            (1, "a b a"), (2, "a b"),
        ]))
        u = {r.w: r.c for r in uni.collect()}
        assert u == {"a": 3, "b": 2}
        b = {(r.a, r.b): r.c for r in bi.collect()}
        # BOS precedes each document's first token
        assert b == {
            (LM.BOS, "a"): 2, ("a", "b"): 2, ("b", "a"): 1,
        }


class TestScore:
    @pytest.fixture(scope="class")
    def lm(self, spark):
        return LM.train_bigram_lm(_docs(spark, [
            (1, "the cat sat"), (2, "the cat ran"),
        ]))

    def test_diagnostics(self, spark, lm):
        uni, bi = lm
        scored = {
            r.doc_id: r
            for r in LM.score_documents(
                _docs(spark, [
                    (10, "the cat sat"),     # all bigrams known
                    (11, "cat the"),         # known words, unseen bigrams
                    (12, "zz qq"),           # OOV
                ]),
                uni, bi,
            ).collect()
        }
        d = scored[10]
        assert (d.n_tokens, d.known_bigrams, d.oov) == (3, 3, 0)
        d = scored[11]
        # (<s>,cat) and (cat,the) unseen but words known → backoff
        assert (d.known_bigrams, d.backoff_hits, d.oov) == (0, 2, 0)
        d = scored[12]
        assert (d.known_bigrams, d.backoff_hits, d.oov) == (0, 0, 2)

    def test_logprob_values(self, spark, lm):
        uni, bi = lm
        r = LM.score_documents(
            _docs(spark, [(1, "the cat sat")]), uni, bi
        ).collect()[0]
        # p(<s>→the)=2/2, p(the→cat)=2/2, p(cat→sat)=1/2
        expect = (math.log(1) + math.log(1) + math.log(0.5)) / 3
        assert abs(r.avg_logprob - expect) < 1e-9

    def test_filter_thresholds(self, spark, lm):
        uni, bi = lm
        scored = LM.score_documents(
            _docs(spark, [(1, "the cat sat"), (2, "zz qq")]), uni, bi
        )
        kept = {r.doc_id: r.keep for r in LM.lm_filter(scored).collect()}
        assert kept == {1: True, 2: False}


class TestReservedBos:
    def test_literal_bos_token_is_dropped(self, spark):
        """A corpus token spelled '<s>' is RESERVED — it must not merge
        with the synthetic BOS context row (which would double-join
        every document's first bigram)."""
        uni, bi = LM.train_bigram_lm(_docs(spark, [(1, "<s> a b")]))
        assert "<s>" not in {r.w for r in uni.collect()}
        scored = LM.score_documents(
            _docs(spark, [(9, "<s> a b")]), uni, bi
        ).collect()[0]
        # the '<s>' text token vanished: 2 scored tokens, both known
        assert (scored.n_tokens, scored.known_bigrams) == (2, 2)
