"""Graph serialization: one JSON document per named graph, and the
inverse parse — the transformer's produce step.

Reference analogs: models serialize to JSON-LD/Turtle
(``src/genegraph/database/query.clj:87-100``) and the transformer
publishes the JSON-LD of each processed event's model to an output
topic (``src/genegraph/sink/event.clj:78-98``).

Spark-first: ``collect_list(struct(...))`` per graph (one hash
aggregation, map-side partials), triples sorted inside the doc so the
serialization is byte-deterministic under any partitioning, then one
``to_json``. The inverse is ``from_json`` + ``explode`` — a lossless
round-trip (tests assert triple-set equality).

Scale notes: doc size is bounded by a graph's triple count (a page's
assertions — tens of rows), so collected lists stay small; the shuffle
key is the graph, the same partitioning the store sink uses, so
serialize-then-produce reuses one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

TRIPLE_STRUCT = StructType(
    [
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object", StringType()),
        StructField("object_is_iri", BooleanType()),
        StructField("object_datatype", StringType()),
    ]
)
DOC_SCHEMA = StructType(
    [
        StructField("graph", StringType()),
        StructField("triples", ArrayType(TRIPLE_STRUCT)),
    ]
)


def graph_documents(triples: DataFrame) -> DataFrame:
    """(graph, doc): one deterministic JSON document per named graph.

    ``object_datatype`` is coalesced to '' inside the doc — Spark's
    ``to_json`` omits null fields, which would make the inverse schema
    ragged; '' round-trips back to null in :func:`parse_documents`."""
    t = F.struct(
        F.col("subject"),
        F.col("predicate"),
        F.col("object"),
        F.col("object_is_iri"),
        F.coalesce(F.col("object_datatype"), F.lit("")).alias("object_datatype"),
    )
    per_graph = triples.groupBy("graph").agg(
        F.sort_array(F.collect_list(t)).alias("triples")
    )
    return per_graph.select(
        "graph",
        F.to_json(F.struct(F.col("graph"), F.col("triples"))).alias("doc"),
    )


def parse_documents(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Inverse of :func:`graph_documents`: JSON docs → triple rows."""
    parsed = docs.select(F.from_json(F.col(doc_col), DOC_SCHEMA).alias("d"))
    return parsed.select(
        F.col("d.graph").alias("graph"), F.explode("d.triples").alias("t")
    ).select(
        "graph",
        "t.subject",
        "t.predicate",
        "t.object",
        "t.object_is_iri",
        F.when(F.col("t.object_datatype") == "", None)
        .otherwise(F.col("t.object_datatype"))
        .alias("object_datatype"),
    )
