"""BPE merge-table learning (functions/bpe.py)."""

from __future__ import annotations

import pytest

from genegraph_spark.functions import bpe as B


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


class TestBpeMerges:
    def test_learns_expected_merges(self, spark):
        # 'ab' dominates; then 'ab'+'</w>' from the bare "ab" words
        docs = _docs(spark, ["ab ab ab abc", "ab abc x"])
        got = [
            (r.rank, r.left, r.right, r.merged, r.pair_count)
            for r in B.bpe_merges(docs, 3).orderBy("rank").collect()
        ]
        assert got[0] == (0, "a", "b", "ab", 6)
        assert got[1] == (1, "ab", "</w>", "ab</w>", 4)
        assert got[2][3] in ("abc", "c</w>", "x</w>", "abc</w>")

    def test_consecutive_merge_classic_semantics(self, spark):
        """'a a a a' must merge to 'aa aa', not 'aa a a' — the
        boundary-consumption failure mode of single-space separators."""
        import pyspark.sql.functions as F

        docs = _docs(spark, ["aaaa aaaa aaaa"])
        seqs = B.symbolize(B.word_counts(docs))
        merged = seqs.select(
            B._apply_merge(F.col("seq"), "a", "a").alias("seq")
        ).collect()[0].seq
        assert merged == "aa  aa  </w>"
        # and the full loop sees the classic pair landscape afterwards:
        # (aa,</w>) and (aa,aa) tie at 3, pair-asc tie-break picks
        # (aa,</w>) ('<' sorts before 'a'); (aa,aa</w>) follows
        merges = B.bpe_merges(docs, 3).orderBy("rank").collect()
        assert (merges[0].left, merges[0].right) == ("a", "a")
        assert (merges[1].left, merges[1].right) == ("aa", "</w>")
        assert (merges[2].left, merges[2].right) == ("aa", "aa</w>")

    def test_tie_break_deterministic(self, spark):
        # 'xy' and 'pq' both appear twice; lexicographic pair asc wins
        docs = _docs(spark, ["xy xy pq pq"])
        first = B.bpe_merges(docs, 1).collect()[0]
        assert (first.left, first.right) == ("p", "q")

    def test_exhausted_vocab_stops_early(self, spark):
        docs = _docs(spark, ["a a a"])  # one symbol pair total: a </w>
        merges = B.bpe_merges(docs, 10).collect()
        # a</w> merges once, then the word is a single symbol — no pairs
        assert len(merges) == 1
        assert merges[0].merged == "a</w>"


class TestEncodeWords:
    def test_encode_applies_merge_chain(self, spark):
        words = spark.createDataFrame(
            [("abab", 3), ("ba", 1)], "word string, n bigint"
        )
        out = {
            r.word: list(r.tokens)
            for r in B.encode_words(
                words, [("a", "b"), ("ab", "ab")]
            ).collect()
        }
        assert out["abab"] == ["abab", "</w>"]
        assert out["ba"] == ["b", "a", "</w>"]

    def test_word_counts_lowercase_and_empty(self, spark):
        docs = _docs(spark, ["The  the a", "THE"])
        got = {r.word: r.n for r in B.word_counts(docs).collect()}
        assert got == {"the": 3, "a": 1}
