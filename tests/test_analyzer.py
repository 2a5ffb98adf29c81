"""Event re-processing analyzer (event_analyzer.clj corpus-wide)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from genegraph_spark.functions import iri as I
from genegraph_spark.plans import analyzer as AN

SCHEMA = (
    "graph string, subject string, predicate string, object string,"
    " object_is_iri boolean, object_datatype string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def frames(spark):
    old = _df(spark, [
        ("g1", "s1", I.RDF_TYPE, ":Order", True, None),
        ("g1", "s1", ":status", "O", False, I.XSD_STRING),
        ("g2", "s2", I.RDF_TYPE, ":Order", True, None),
        ("g2", "s2", ":status", "F", False, I.XSD_STRING),
        ("g3", "s3", I.RDF_TYPE, ":Order", True, None),
    ])
    new = _df(spark, [
        # g1 unchanged
        ("g1", "s1", I.RDF_TYPE, ":Order", True, None),
        ("g1", "s1", ":status", "O", False, I.XSD_STRING),
        # g2: status rewritten + type moved
        ("g2", "s2", I.RDF_TYPE, ":PriorityOrder", True, None),
        ("g2", "s2", ":status", "X", False, I.XSD_STRING),
        # g3 dropped entirely; g4 brand new
        ("g4", "s4", I.RDF_TYPE, ":Order", True, None),
    ])
    return old, new


class TestChangeSummary:
    def test_per_graph_counts(self, spark, frames):
        old, new = frames
        got = {r.graph: r for r in AN.change_summary(old, new).collect()}
        assert set(got) == {"g1", "g2", "g3", "g4"}
        g1 = got["g1"]
        assert (g1.created, g1.deleted, g1.changed) == (0, 0, False)
        assert (g1.previous, g1.current) == (2, 2)
        g2 = got["g2"]
        assert (g2.created, g2.deleted, g2.changed) == (2, 2, True)
        g3 = got["g3"]  # dropped model: all deleted
        assert (g3.previous, g3.current, g3.deleted, g3.changed) == (
            1, 0, 1, True)
        g4 = got["g4"]  # new model: all created
        assert (g4.previous, g4.current, g4.created, g4.changed) == (
            0, 1, 1, True)

    def test_bnode_rename_is_not_a_change(self, spark):
        """A re-transform that only regenerated blank-node ids must read
        as UNCHANGED with canonicalize=True (the is-isomorphic? verdict,
        event_analyzer.clj:41-47) — and as noise without it."""
        old = _df(spark, [
            ("g", "s", ":mention", "_:a1", True, None),
            ("g", "_:a1", ":pos", "3", False, I.XSD_INTEGER),
        ])
        new = _df(spark, [
            ("g", "s", ":mention", "_:zz9", True, None),
            ("g", "_:zz9", ":pos", "3", False, I.XSD_INTEGER),
        ])
        naive = AN.change_summary(old, new).collect()[0]
        assert naive.changed is True  # lexical diff sees bnode churn
        canon = AN.change_summary(old, new, canonicalize=True).collect()[0]
        assert canon.changed is False
        assert (canon.created, canon.deleted) == (0, 0)

    def test_duplicate_emission_is_not_a_change(self, spark):
        """Jena models are statement SETS: a transform that re-emits an
        existing triple twice must NOT read as a change."""
        old = _df(spark, [("g", "s", ":p", "v", False, I.XSD_STRING)])
        new = _df(spark, [
            ("g", "s", ":p", "v", False, I.XSD_STRING),
            ("g", "s", ":p", "v", False, I.XSD_STRING),
        ])
        got = AN.change_summary(old, new).collect()[0]
        assert got.changed is False
        assert (got.previous, got.current) == (1, 1)

    def test_model_changes_frames(self, spark, frames):
        old, new = frames
        created, deleted = AN.model_changes(old, new)
        c = {(r.graph, r.predicate, r.object) for r in created.collect()}
        assert ("g2", ":status", "X") in c
        assert ("g2", I.RDF_TYPE, ":PriorityOrder") in c
        d = {(r.graph, r.predicate, r.object) for r in deleted.collect()}
        assert ("g2", ":status", "F") in d
        assert ("g3", I.RDF_TYPE, ":Order") in d


class TestTypeCountDiff:
    def test_only_moved_counts(self, spark, frames):
        old, new = frames
        got = {
            (r.graph, r.rdf_type): (r.old_n, r.new_n, r.delta)
            for r in AN.type_count_diff(old, new).collect()
        }
        assert got[("g2", ":Order")] == (1, 0, -1)
        assert got[("g2", ":PriorityOrder")] == (0, 1, 1)
        assert got[("g3", ":Order")] == (1, 0, -1)
        assert got[("g4", ":Order")] == (0, 1, 1)
        assert ("g1", ":Order") not in got  # unchanged → no row


class TestProcessingStatistics:
    def test_outcome_frequencies(self, spark):
        ev = spark.createDataFrame(
            [("ok",), ("ok",), ("exception",)], "outcome_kind string"
        )
        got = {r.outcome: r.n for r in
               AN.processing_statistics(ev, "outcome_kind").collect()}
        assert got == {"ok": 2, "exception": 1}


class TestCanonicalizedSizes:
    def test_sizes_stay_raw_under_canonicalization(self, spark):
        """model-sizes reports Jena .size of the RAW models: two
        distinct bnodes that WL-collapse to one signature still count
        as two statements even when canonicalize=True."""
        old = _df(spark, [
            ("g", "s", ":m", "_:a", True, None),
            ("g", "s", ":m", "_:b", True, None),  # same WL signature
        ])
        new = _df(spark, [
            ("g", "s", ":m", "_:z", True, None),
            ("g", "s", ":m", "_:w", True, None),
        ])
        got = AN.change_summary(old, new, canonicalize=True).collect()[0]
        assert (got.previous, got.current) == (2, 2)
        assert got.changed is False  # isomorphic up to bnode renaming
