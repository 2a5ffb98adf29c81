"""Group-by-collect pivots: materialize a resource's out-edges as a
predicate → object-list document, and the single-member-group emission.

Reference analogs:
- ``src/genegraph/transform/clinvar/common.clj:438-453`` — ``partition-by
  first`` over a resource's statements builds a multi-valued
  predicate→objects map (how every resource's out-edges become a
  document for serialization).
- ``src/genegraph/transform/omim.clj:12-34`` — group triples by
  phenotype, collect the gene list, emit extra triples only when the
  group has exactly one member.

Spark-first: ``collect_list`` after a hash aggregation — map-side
partial aggregation applies, one shuffle keyed by the group. Object
lists are sorted so results are deterministic under any partitioning
(the reference's lists inherit statement iteration order; a distributed
engine must pin it).

Scale notes: group cardinality is bounded by a resource's out-degree —
hot resources (BRCA1-class) have thousands of edges, not millions, so
collected lists stay small; the shuffle key (subject) is corpus-shaped,
not entity-shaped, so Zipf-skewed entities do not create hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_pivot(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "values",
) -> DataFrame:
    """(key..., values: sorted array, n_values) — the predicate→object
    list pivot (common.clj:438-453)."""
    # count(value_col), not count(*): collect_list silently drops NULLs,
    # and the count must equal size(values)
    return df.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(value_col)).alias(out_col),
        F.count(value_col).alias(f"n_{out_col}"),
    )


def out_edge_documents(triples: DataFrame) -> DataFrame:
    """Per (subject, predicate): the sorted object list — one row per
    out-edge family of each resource (the reference's multi-valued map,
    one map entry per row)."""
    return collect_pivot(triples, ["subject", "predicate"], "object", out_col="objects")


def single_member_groups(
    df: DataFrame, key_col: str, member_col: str
) -> DataFrame:
    """Groups with EXACTLY one distinct member, emitting that member
    (omim.clj:12-34: a phenotype maps to extra triples only when a single
    gene asserts it). Returns (key, only_member).

    Bounded state: countDistinct + min, NOT collect_set — a Zipf-hot key
    with millions of distinct members would otherwise materialize its
    whole member set in one aggregation buffer just to test |set| == 1
    (min of a single-member group IS that member)."""
    g = df.groupBy(key_col).agg(
        F.countDistinct(member_col).alias("_n"),
        F.min(member_col).alias("only_member"),
    )
    return g.where(F.col("_n") == 1).select(key_col, "only_member")
