"""Round-5 tests.

Covers: the CORRECTNESS-history-derived query ordering (VERDICT r4
next-steps #1) plus the round-5 operator additions.
"""
from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestVerdictOrdering:
    """queries() ordering is derived from CORRECTNESS_r*.json, not a
    hand-maintained list (a typo there silently burned window slots)."""

    @staticmethod
    def _latest_rounds():
        latest = {}
        for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
            rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
            for name, v in json.load(open(path)).items():
                if isinstance(v, dict):
                    latest[name] = rnd
        return latest

    def test_never_verified_sort_first_then_stalest(self):
        import __spark_entry__ as E

        names = list(E.queries())
        latest = self._latest_rounds()
        # effective sort key per name: -1 = never driver-verified
        keys = [latest.get(n, -1) for n in names]
        # a green history exists for this repo — the invariant is that the
        # key sequence is non-decreasing (never-verified first, then
        # ascending latest-verdict round)
        assert keys == sorted(keys), (
            "queries() ordering is not verdict-staleness ordered: "
            + str([(n, k) for n, k in zip(names, keys)][:20])
        )

    def test_every_query_has_oracle_or_is_documented(self, spark):
        import __spark_entry__ as E

        qs = set(E.queries())
        oracles = set(E.oracle_sql())
        # every oracle refers to a real query
        assert oracles <= qs, oracles - qs

    def test_ordering_function_ignores_unknown_history_names(self):
        import __spark_entry__ as E

        # names in history but absent from base must not crash or appear
        ordered = E._verdict_ordering(["kg_triples", "zz_brand_new"])
        assert set(ordered) == {"kg_triples", "zz_brand_new"}
        # never-verified name sorts before the historically-verified one
        assert ordered[0] == "zz_brand_new"


# ---------------------------------------------------------------------------
# ADVICE r4 regressions (sparql front-end + store lock)
# ---------------------------------------------------------------------------

TRIPLE_SCHEMA = (
    "graph string, subject string, predicate string, object string, "
    "object_is_iri boolean, object_datatype string"
)


def _T(spark, rows):
    return spark.createDataFrame(
        [("g", s, p, o, iri, dt) for s, p, o, iri, dt in rows], TRIPLE_SCHEMA
    )


class TestAdviceR4Sparql:
    def test_order_by_numeric_var_sorts_numerically(self, spark):
        """'10' must not sort before '9' (ADVICE r4, medium)."""
        from genegraph_spark.operators import sparql as S

        rows = [
            ("urn:a", ":score", "9", False, "xsd:integer"),
            ("urn:b", ":score", "10", False, "xsd:integer"),
            ("urn:c", ":score", "-2", False, "xsd:integer"),
            ("urn:d", ":score", "-10", False, "xsd:integer"),
        ]
        g = _T(spark, rows)
        out = S.sparql(
            g, "SELECT ?s ?v WHERE { ?s :score ?v } ORDER BY ?v"
        ).collect()
        assert [r.v for r in out] == ["-10", "-2", "9", "10"]
        out = S.sparql(
            g, "SELECT ?s ?v WHERE { ?s :score ?v } ORDER BY DESC(?v) LIMIT 2"
        ).collect()
        assert [r.v for r in out] == ["10", "9"]

    def test_order_by_mixed_numeric_and_lexical(self, spark):
        from genegraph_spark.operators import sparql as S

        rows = [
            ("urn:a", ":v", "banana", False, None),
            ("urn:b", ":v", "10", False, "xsd:integer"),
            ("urn:c", ":v", "apple", False, None),
            ("urn:d", ":v", "9", False, "xsd:integer"),
        ]
        out = S.sparql(
            _T(spark, rows), "SELECT ?v WHERE { ?s :v ?v } ORDER BY ?v"
        ).collect()
        # castable numerics first (numeric order), then lexical fallback
        assert [r.v for r in out] == ["9", "10", "apple", "banana"]

    def test_values_first_with_undef_then_bgp(self, spark):
        """A VALUES block with UNDEF cells appearing BEFORE the first BGP
        must not turn UNDEF into a NULL join key (ADVICE r4)."""
        from genegraph_spark.operators import sparql as S

        rows = [
            ("urn:a", ":name", "alice", False, None),
            ("urn:b", ":name", "bob", False, None),
            ("urn:c", ":name", "carol", False, None),
        ]
        out = S.sparql(
            _T(spark, rows),
            """SELECT ?s ?name WHERE {
                 VALUES (?s ?name) { (<urn:a> UNDEF) (UNDEF "carol") }
                 ?s :name ?name .
               }""",
        ).collect()
        got = sorted((r.s, r.name) for r in out)
        assert got == [("urn:a", "alice"), ("urn:c", "carol")]

    def test_optional_filter_on_outer_var(self, spark):
        """FILTER inside OPTIONAL referencing an outer-bound var is part
        of the left-join condition (SPARQL LeftJoin), not an inner filter
        compiling the var to NULL (ADVICE r4)."""
        from genegraph_spark.operators import sparql as S

        rows = [
            ("urn:a", ":age", "42", False, "xsd:integer"),
            ("urn:b", ":age", "7", False, "xsd:integer"),
            ("urn:a", ":nick", "al", False, None),
            ("urn:b", ":nick", "bobby", False, None),
        ]
        out = S.sparql(
            _T(spark, rows),
            """SELECT ?s ?age ?nick WHERE {
                 ?s :age ?age .
                 OPTIONAL { ?s :nick ?nick . FILTER(?age > 10) }
               }""",
        ).collect()
        got = {r.s: r.nick for r in out}
        # a (age 42): join filter passes → nick bound
        # b (age 7): match exists but fails the condition → survives UNBOUND
        assert got == {"urn:a": "al", "urn:b": None}
        assert len(out) == 2

    def test_construct_skips_literal_subjects(self, spark):
        """CONSTRUCT rows whose subject var is literal-bound are
        ill-formed RDF and must be skipped (Jena behavior, ADVICE r4)."""
        from genegraph_spark.operators import sparql as S

        rows = [
            ("urn:a", ":p", "urn:x", True, None),
            ("urn:b", ":p", "a literal", False, None),
        ]
        out = S.sparql(
            _T(spark, rows),
            "CONSTRUCT { ?o :seen ?s } WHERE { ?s :p ?o }",
        ).collect()
        # only the IRI-valued ?o makes a triple; the literal one is dropped
        assert len(out) == 1
        assert out[0].subject == "urn:x"


class TestAdviceR4Lock:
    @staticmethod
    def _store(spark, tmp_path):
        import genegraph_spark.sinks.named_graph as NG

        return NG.NamedGraphStore(spark, str(tmp_path / "store"))

    @staticmethod
    def _plant_lock(store, commit, pid):
        os.makedirs(store.path, exist_ok=True)
        with open(os.path.join(store.path, f"commit-{commit:08d}.lock"), "w") as f:
            f.write(str(pid))

    def test_eperm_holder_is_treated_alive(self, spark, tmp_path, monkeypatch):
        """os.kill EPERM means the pid exists under another user — a LIVE
        writer; reclaiming its lock reopens corruption (ADVICE r4)."""
        store = self._store(spark, tmp_path)
        self._plant_lock(store, 1, 99999)

        real_kill = os.kill

        def fake_kill(pid, sig):
            if pid == 99999 and sig == 0:
                raise PermissionError("EPERM")
            return real_kill(pid, sig)

        monkeypatch.setattr(os, "kill", fake_kill)
        with pytest.raises(RuntimeError, match="concurrent writer"):
            with store._commit_lock(1):
                pass

    def test_dead_holder_lock_is_reclaimed(self, spark, tmp_path, monkeypatch):
        store = self._store(spark, tmp_path)
        self._plant_lock(store, 1, 99999)

        real_kill = os.kill

        def fake_kill(pid, sig):
            if pid == 99999 and sig == 0:
                raise ProcessLookupError("ESRCH")
            return real_kill(pid, sig)

        monkeypatch.setattr(os, "kill", fake_kill)
        # dead holder: acquisition succeeds by reclaim
        with store._commit_lock(1):
            pass
