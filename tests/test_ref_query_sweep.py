"""Reference-wide embedded-query sweep.

The reference embeds SPARQL in three places: ``.sparql`` files (covered
by test_sparql/test_gdm_chain), Clojure string literals passed to
``create-query``, and algebra data forms (``[:project ... (cons :bgp
...)]`` — the combinator tier ``operators/algebra.py`` covers).  This
module mechanically extracts every STRING-form ``create-query`` body
from the reference source at test time and asserts the text front-end
parses all of them, plus executes the two shapes that forced front-end
features: ``isBlank`` term tests (suggesters.clj / condition.clj /
common/curation.clj) and the ``CONSTRUCT WHERE {...}`` shorthand
(util/test_data.clj).
"""
from __future__ import annotations

import os
import re

import pytest

REF_SRC = "/root/reference/src"

TRIPLE_SCHEMA = (
    "graph string, subject string, predicate string, object string, "
    "object_is_iri boolean, object_datatype string"
)


def _read_string(src: str, i: int) -> tuple[str, int]:
    buf = []
    k = i + 1
    while k < len(src):
        if src[k] == "\\":
            buf.append(src[k + 1])
            k += 2
            continue
        if src[k] == '"':
            break
        buf.append(src[k])
        k += 1
    return "".join(buf), k + 1


def extract_string_queries(path: str) -> list[str]:
    """String-literal create-query bodies in one .clj file; plain
    strings and ``(str "a" "b" ...)`` concatenations of pure literals
    (a non-literal inside (str ...) marks the query dynamic → skipped)."""
    src = open(path).read()
    out = []
    for m in re.finditer(r"\(\s*(?:q/)?create-query\s*", src):
        i = m.end()
        while i < len(src) and src[i] in " \t\r\n":
            i += 1
        if src.startswith("(str", i):
            j, depth, parts, pure = i + 4, 1, [], True
            while j < len(src) and depth > 0:
                c = src[j]
                if c == '"':
                    s, j = _read_string(src, j)
                    parts.append(s)
                elif c == "(":
                    depth += 1
                    j += 1
                elif c == ")":
                    depth -= 1
                    j += 1
                elif c in " \t\r\n":
                    j += 1
                else:
                    tok = re.match(r"[^\s()\"]+", src[j:])
                    pure = False
                    j += tok.end() if tok else 1
            if pure and parts:
                out.append("".join(parts))
        elif i < len(src) and src[i] == '"':
            s, _ = _read_string(src, i)
            out.append(s)
    return out


def all_string_queries() -> list[tuple[str, str]]:
    found = []
    for root, _, files in os.walk(REF_SRC):
        for f in sorted(files):
            if f.endswith(".clj"):
                p = os.path.join(root, f)
                for q in extract_string_queries(p):
                    found.append((os.path.relpath(p, REF_SRC), q))
    return found


class TestEmbeddedQuerySweep:
    @pytest.fixture(autouse=True)
    def _need_ref(self):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference tree not present")

    def test_every_string_query_parses(self):
        from genegraph_spark.operators import sparql as S

        queries = all_string_queries()
        # the reference embeds 42 string-form queries today; tolerate
        # growth, catch extractor rot
        assert len(queries) >= 40, f"extractor found only {len(queries)}"
        failures = []
        for f, q in queries:
            try:
                S.PreparedQuery(q)
            except Exception as e:  # noqa: BLE001 — collecting a report
                failures.append((f, str(e)[:120]))
        assert not failures, failures


def T(spark, rows):
    return spark.createDataFrame(
        [("g", s, p, o, i, dt) for s, p, o, i, dt in rows], TRIPLE_SCHEMA
    )


def iri(s, p, o):
    return (s, p, o, True, None)


def lit(s, p, o, dt=None):
    return (s, p, o, False, dt)


SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
MONDO = "http://purl.obolibrary.org/obo/MONDO_0000001"


class TestIsBlankQueries:
    """suggesters.clj:33-35 (and the condition.clj / common/curation.clj
    family): non-bnode disease enumeration via ``FILTER (!isBlank(?s))``
    — executed VERBATIM. Blank nodes travel as "_:"-prefixed IRI-tagged
    terms in this engine."""

    Q = (
        "select ?s WHERE { ?s <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        "<http://purl.obolibrary.org/obo/MONDO_0000001> .FILTER (!isBlank(?s)) }"
    )

    def test_verbatim_blank_exclusion(self, spark):
        from genegraph_spark.operators import sparql as S

        m = T(
            spark,
            [
                iri("urn:d1", SUB, MONDO),
                iri("_:b1", SUB, MONDO),
                iri("urn:d2", SUB, "urn:d1"),
            ],
        )
        out = sorted(r.s for r in S.sparql(m, self.Q).collect())
        # zero-step root + both transitive IRIs; the bnode subclass dropped
        assert out == [MONDO, "urn:d1", "urn:d2"]

    def test_term_kind_family(self, spark):
        from genegraph_spark.operators import sparql as S

        m = T(
            spark,
            [
                iri("urn:s1", ":p", "urn:o1"),
                iri("urn:s2", ":p", "_:b9"),
                lit("urn:s3", ":p", "12.5", "xsd:decimal"),
                lit("urn:s4", ":p", "hello"),
            ],
        )
        run = lambda flt: sorted(  # noqa: E731
            r.s
            for r in S.sparql(m, f"select ?s where {{ ?s :p ?o . FILTER({flt}) }}").collect()
        )
        assert run("isIRI(?o)") == ["urn:s1"]
        assert run("isBlank(?o)") == ["urn:s2"]
        assert run("isLiteral(?o)") == ["urn:s3", "urn:s4"]
        assert run("isNumeric(?o)") == ["urn:s3"]


class TestConstructWhereShorthand:
    """util/test_data.clj:60-67 — ``construct where {?disease ?p ?o}``
    (SPARQL 1.1 §10.2.2: template = pattern) executed VERBATIM with the
    pre-bound subject the reference's extract loop passes."""

    def test_verbatim(self, spark):
        from genegraph_spark.operators import sparql as S

        m = T(
            spark,
            [
                iri("urn:d1", SUB, MONDO),
                lit("urn:d1", ":rdfs/label", "disease one"),
                iri("urn:d2", SUB, "urn:d1"),
            ],
        )
        out = sorted(
            (r.subject, r.predicate, r.object)
            for r in S.sparql(
                m, "construct where {?disease ?p ?o}", disease=("iri", "urn:d1")
            ).collect()
        )
        assert out == [
            ("urn:d1", ":rdfs/label", "disease one"),
            ("urn:d1", SUB, MONDO),
        ]


class TestConditionHierarchyQueries:
    """condition.clj's five remaining string queries executed VERBATIM:
    propositions-query (type path to :sepio/Proposition) and the four
    MONDO-gated hierarchy walks behind the (direct) sub/superclass
    resolvers — note the reference's resolver/query name swap
    (`subclasses` calls superclass-of-query): these tests pin the QUERY
    semantics, not the resolver naming."""

    PROPOSITIONS_Q = """select ?prop where 
{ ?prop :sepio/has-object ?disease .
  ?prop ( a / :rdfs/sub-class-of * ) :sepio/Proposition }"""

    SUBCLASS_OF_Q = (
        "select ?s WHERE { ?class "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        " ?s . "
        " ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        "<http://purl.obolibrary.org/obo/MONDO_0000001> ."
        "FILTER (!isBlank(?s)) }"
    )

    SUPERCLASS_OF_Q = (
        "select ?s WHERE { ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        " ?class . "
        " ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        "<http://purl.obolibrary.org/obo/MONDO_0000001> ."
        "FILTER (!isBlank(?s)) }"
    )

    DIRECT_SUBCLASS_OF_Q = (
        "select ?s WHERE { ?class "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf> "
        " ?s . "
        " ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        "<http://purl.obolibrary.org/obo/MONDO_0000001> ."
        "FILTER (!isBlank(?s)) }"
    )

    DIRECT_SUPERCLASS_OF_Q = (
        "select ?s WHERE { ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf> "
        " ?class . "
        " ?s "
        " <http://www.w3.org/2000/01/rdf-schema#subClassOf>* "
        "<http://purl.obolibrary.org/obo/MONDO_0000001> ."
        "FILTER (!isBlank(?s)) }"
    )

    @pytest.fixture(scope="class")
    def mondo_graph(self, spark):
        return T(
            spark,
            [
                iri("urn:A", SUB, MONDO),
                iri("urn:B", SUB, "urn:A"),
                iri("_:bx", SUB, "urn:A"),
                iri("urn:C", SUB, "urn:B"),
                # outside the MONDO tree — the second subClassOf* gate drops it
                iri("urn:Z", SUB, "urn:other"),
                # propositions
                iri("urn:prop1", ":sepio/has-object", "urn:A"),
                iri("urn:prop1", "rdf:type", ":sepio/GeneValidityProposition"),
                iri(
                    ":sepio/GeneValidityProposition",
                    ":rdfs/sub-class-of",
                    ":sepio/Proposition",
                ),
                iri("urn:prop2", ":sepio/has-object", "urn:A"),
                iri("urn:prop2", "rdf:type", ":sepio/SomethingElse"),
            ],
        )

    def _run(self, m, q, **params):
        from genegraph_spark.operators import sparql as S

        return sorted(r[0] for r in S.sparql(m, q, **params).collect())

    def test_propositions(self, spark, mondo_graph):
        assert self._run(
            mondo_graph, self.PROPOSITIONS_Q, disease=("iri", "urn:A")
        ) == ["urn:prop1"]

    def test_ancestors_within_mondo(self, spark, mondo_graph):
        # subclass-of-query(class=B): everything B subClassOf* reaches
        assert self._run(
            mondo_graph, self.SUBCLASS_OF_Q, **{"class": ("iri", "urn:B")}
        ) == [MONDO, "urn:A", "urn:B"]

    def test_descendants_within_mondo(self, spark, mondo_graph):
        # superclass-of-query(class=A): everything that reaches A;
        # the blank subclass is filtered, Z can't pass the MONDO gate
        assert self._run(
            mondo_graph, self.SUPERCLASS_OF_Q, **{"class": ("iri", "urn:A")}
        ) == ["urn:A", "urn:B", "urn:C"]

    def test_direct_hops(self, spark, mondo_graph):
        assert self._run(
            mondo_graph, self.DIRECT_SUBCLASS_OF_Q, **{"class": ("iri", "urn:B")}
        ) == ["urn:A"]
        assert self._run(
            mondo_graph,
            self.DIRECT_SUPERCLASS_OF_Q,
            **{"class": ("iri", "urn:A")},
        ) == ["urn:B"]
