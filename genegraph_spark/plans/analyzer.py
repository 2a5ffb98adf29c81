"""Event re-processing analyzer — the effect of code changes on models.

Reference: ``src/genegraph/event_analyzer.clj`` — re-run the current
transformation over recorded events and report, per event, what changed
against the stored model: ``model-diff`` (created/deleted triples),
``model-changed?`` (isomorphism up to blank-node renaming),
``model-sizes`` (previous/current triple counts), and
``resource-type-diff`` (rdf:type frequency deltas). The reference maps
these helpers over events one at a time on the driver (pmap at best).

Spark-first: both "previous" and "current" model sets live in ONE
triples frame each, keyed by graph (= the event's model id), so every
per-event helper becomes a corpus-wide co-keyed set operation:

- created/deleted — two ``exceptAll`` passes (one exchange each, hashed
  on the full row, graph included, so per-graph semantics are free);
- changed? — created+deleted counts per graph AFTER WL blank-node
  canonicalization (``operators.model.canonical_bnode_triples``), which
  makes count-zero equivalent to Jena's ``is-isomorphic?`` verdict for
  the shapes the reference processes;
- sizes + type diffs — plain groupBy aggregations.

At 100 TB the cost is the exceptAll exchanges; nothing is per-event on
the driver and no graph's model must fit anywhere in particular.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import iri as I
from ..operators.model import canonical_bnode_triples

_COLS = [
    "graph", "subject", "predicate", "object", "object_is_iri",
    "object_datatype",
]


def model_changes(
    old: DataFrame, new: DataFrame, canonicalize: bool = False,
    rounds: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """(created, deleted) triple frames — ``model-diff``
    (event_analyzer.clj:24-30) for every graph at once.

    ``canonicalize=True`` WL-relabels blank nodes first so a
    re-transform that only regenerated bnode ids diffs as EMPTY, the
    way Jena's difference over isomorphic models reads to the
    reference's users. Leave False for bnode-free models (cheaper).

    SET semantics like Jena (both sides dedupe before differencing): a
    transform that merely re-emits an existing triple twice is NOT a
    model change."""
    a = old.select(*_COLS).dropDuplicates(_COLS)
    b = new.select(*_COLS).dropDuplicates(_COLS)
    if canonicalize:
        a = canonical_bnode_triples(a, rounds).dropDuplicates(_COLS)
        b = canonical_bnode_triples(b, rounds).dropDuplicates(_COLS)
    return b.exceptAll(a), a.exceptAll(b)


def change_summary(
    old: DataFrame, new: DataFrame, canonicalize: bool = False,
    rounds: int = 3,
) -> DataFrame:
    """Per-graph change report: created / deleted / previous / current
    counts + the ``model-changed?`` flag (event_analyzer.clj:41-55).

    Graphs present in only one side still report (full outer over the
    per-graph aggregates): a brand-new model is all-created, a dropped
    one all-deleted."""
    created, deleted = model_changes(old, new, canonicalize, rounds)

    def per_graph(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("graph").agg(F.count("*").alias(name))

    # sizes are SET sizes (Jena .size counts distinct statements)
    out = (
        per_graph(old.select(*_COLS).dropDuplicates(_COLS), "previous")
        .join(
            per_graph(new.select(*_COLS).dropDuplicates(_COLS), "current"),
            "graph", "full_outer",
        )
        .join(per_graph(created, "created"), "graph", "left_outer")
        .join(per_graph(deleted, "deleted"), "graph", "left_outer")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        "graph",
        z("previous").alias("previous"),
        z("current").alias("current"),
        z("created").alias("created"),
        z("deleted").alias("deleted"),
        ((z("created") + z("deleted")) > 0).alias("changed"),
    )


def type_count_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-graph rdf:type frequency deltas — ``resource-type-diff``
    (event_analyzer.clj:14-22), rows only where the count moved."""

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(*_COLS).dropDuplicates(_COLS)  # model set semantics
            .where(F.col("predicate") == I.RDF_TYPE)
            .groupBy("graph", F.col("object").alias("rdf_type"))
            .agg(F.count("*").alias(name))
        )

    out = counts(old, "old_n").join(
        counts(new, "new_n"), ["graph", "rdf_type"], "full_outer"
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return out.select(
        "graph", "rdf_type",
        z("old_n").alias("old_n"),
        z("new_n").alias("new_n"),
        (z("new_n") - z("old_n")).alias("delta"),
    ).where(F.col("delta") != 0)


def processing_statistics(events: DataFrame, outcome_col: str) -> DataFrame:
    """Outcome frequencies over a recorded topic — ``statistics``
    (event_analyzer.clj:57-64): one map-side-combined groupBy."""
    return (
        events.groupBy(F.col(outcome_col).alias("outcome"))
        .agg(F.count("*").alias("n"))
    )
