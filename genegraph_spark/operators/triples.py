"""Triple materialization: explode per-document entity/assertion rows into
``(graph, subject, predicate, object, object_is_iri, object_datatype)``.

Reference analog: the CONSTRUCT stage — genegraph's transforms emit
triples via ``construct-statement`` / ``statements-to-model``
(``src/genegraph/database/load.clj:38-70``) into a per-event model whose
name is the root entity IRI (``annotate.clj:38-52``). Object IRIs vs
literals are distinguished by ``^{:object :Resource}`` metadata
(``load.clj:55``); here by the ``object_is_iri`` column, with
``object_datatype`` carrying the xsd type of literals (typed literals,
``load.clj:56-58``).

Spark-first: each triple family is a ``select`` of the matched bindings
with literal predicate columns, unioned; no UDFs, no shuffle beyond the
upstream aggregations.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import iri as I

TRIPLE_COLS = ["graph", "subject", "predicate", "object", "object_is_iri", "object_datatype"]


def triple(
    graph: Column, subject: Column, predicate: str, obj: Column, is_iri: bool, datatype: str | None = None
):
    """One triple family as a select-list."""
    return [
        graph.alias("graph"),
        subject.alias("subject"),
        F.lit(predicate).alias("predicate"),
        obj.cast("string").alias("object"),
        F.lit(is_iri).alias("object_is_iri"),
        F.lit(datatype).cast("string").alias("object_datatype"),
    ]


def union_all(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def page_triples(pages: DataFrame) -> DataFrame:
    """Per-page skeleton triples; graph = page IRI (= url)."""
    g = F.col("url")
    return union_all(
        [
            pages.select(*triple(g, g, I.RDF_TYPE, F.lit(I.C_WEBPAGE), True)),
            pages.select(*triple(g, g, I.P_LANG, F.col("lang"), False, I.XSD_STRING)),
        ]
    )


def mention_triples(linked_canonical: DataFrame) -> DataFrame:
    """Triples for linked mentions aggregated per (url, entity).

    Input: (url, iri, canonical_iri, entity_type, n_mentions, first_pos).
    Emits per graph=url:
      (url,  kgp:mentions,   canonical_iri)                [IRI]
      (url,  kgp:hasMention, _:b)                          [deterministic bnode]
      (_:b,  rdf:type,       kgp:Mention)
      (_:b,  kgp:canonicalEntity, canonical_iri)           [IRI]
      (_:b,  kgp:position,   first_pos)                    [xsd:integer]
    """
    g = F.col("url")
    b = I.bnode(g, F.col("canonical_iri"))
    return union_all(
        [
            linked_canonical.select(*triple(g, g, I.P_MENTIONS, F.col("canonical_iri"), True)).distinct(),
            linked_canonical.select(*triple(g, g, I.P_HAS_MENTION, b, True)),
            linked_canonical.select(*triple(g, b, I.RDF_TYPE, F.lit(I.C_MENTION), True)),
            linked_canonical.select(*triple(g, b, I.P_CANONICAL, F.col("canonical_iri"), True)),
            linked_canonical.select(*triple(g, b, I.P_POSITION, F.col("first_pos"), False, I.XSD_INTEGER)),
        ]
    )


def dictionary_triples(dictionary: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Base-data graph for the curated dictionary (the reference loads its
    HGNC/ontology base files into their own named graphs,
    ``sink/base.clj:55-59``). graph = kg dictionary graph."""
    g = F.lit(I.DICTIONARY_GRAPH)
    s = F.col("iri")
    type_iri = F.element_at(
        F.create_map(
            *[x for t, tiri in I.TYPE_IRIS.items() for x in (F.lit(t), F.lit(tiri))]
        ),
        F.col("entity_type"),
    )
    d = dictionary
    parts = [
        d.select(*triple(g, s, I.RDF_TYPE, type_iri, True)),
        d.select(*triple(g, s, I.PREF_LABEL, F.col("preferred_label"), False, I.XSD_STRING)),
        d.select("iri", F.explode("alt_labels").alias("l")).select(
            *triple(g, s, I.ALT_LABEL, F.col("l"), False, I.XSD_STRING)
        ),
        d.select("iri", F.explode("hidden_labels").alias("l")).select(
            *triple(g, s, I.HIDDEN_LABEL, F.col("l"), False, I.XSD_STRING)
        ),
        d.select("iri", F.explode("same_as").alias("x")).select(
            *triple(g, s, I.SAME_AS, F.col("x"), True)
        ),
        canonical_map.select(*triple(g, s, I.P_CANONICAL, F.col("canonical_iri"), True)),
    ]
    return union_all(parts)
