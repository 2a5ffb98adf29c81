"""Gazetteer mention detection + contextual entity-link scoring.

Reference analog: genegraph resolves symbolic names against its curated
identifier dictionary on every transform — per-event lookups like the
``?gene :owl/same-as ?hgnc_gene`` join
(``src/genegraph/transform/gene_validity_refactor.clj:347-348``) and the
per-row symbol queries (``src/genegraph/transform/hi_index.clj:13``).
Re-expressed Spark-first: the dictionary is tiny relative to the corpus,
so mention detection is a **broadcast hash join** between the exploded
token stream and the exploded alias table — zero shuffle of the big side
at detection time, no Python in the hot path.

Disambiguation (two entities sharing a surface form) is scored
JVM-side: label-kind weight (preferred > alt > hidden, the skos ranking
of transform/gene.clj:51-67) plus document-context support (how many
*distinct other* surface forms of the same entity occur in the document),
then a deterministic argmax per (doc, position).

Scale notes (100 TB): the token explode multiplies rows ~200×; it never
shuffles — detection is explode → broadcast-join → local aggregation, and
the only shuffles are the per-(doc,entity) aggregations, keyed by doc so
Zipf-skewed hot *entities* (BRCA1-class) do not create hot *keys*; the
final mention table is keyed by doc as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KIND_WEIGHT = {"preferred": 3, "alt": 2, "hidden": 1}


def tokenize(pages: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """(id, pos, token) stream — whitespace tokenization, JVM-side."""
    return (
        pages.select(id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"))
        .where(F.col("token") != "")
    )


def detect_mentions(tokens: DataFrame, alias: DataFrame) -> DataFrame:
    """Candidate mentions: broadcast-join tokens against the alias table.

    Returns (id, pos, token, iri, entity_type, label_kind) — one row per
    candidate entity per token occurrence (ambiguous tokens fan out).
    """
    return tokens.join(
        F.broadcast(alias.withColumnRenamed("label", "token")), "token", "inner"
    )


def link_entities(
    candidates: DataFrame, alias: DataFrame | None = None, id_col: str = "url"
) -> DataFrame:
    """Resolve ambiguous candidates to one entity per (doc, position).

    score = 10 * kind_weight + context_support, where context_support =
    number of distinct surface forms of the entity seen in the document.
    Ties break on iri (deterministic). Returns
    (id, pos, token, iri, entity_type, label_kind).

    Scale path: ambiguity is a property of the (tiny) gazetteer, so when
    ``alias`` is given, only occurrences of *ambiguous* surface forms pay
    the per-(doc,pos) window shuffle and the per-(doc,entity) support
    aggregation — unambiguous tokens (the overwhelming majority of a
    Zipf-skewed corpus, including the BRCA1-class hot head) pass through
    map-only. Results are identical to the full-window path.
    """
    out_cols = [id_col, "pos", "token", "iri", "entity_type", "label_kind"]
    if alias is not None:
        amb_labels = (
            alias.groupBy("label")
            .agg(F.countDistinct("iri").alias("_n"))
            .where("_n > 1")
            .select(F.col("label").alias("token"))
        )
        amb_entities = (
            alias.join(amb_labels, alias["label"] == amb_labels["token"])
            .select("iri")
            .distinct()
        )
        cand_amb = candidates.join(F.broadcast(amb_labels), "token", "left_semi")
        cand_unamb = candidates.join(F.broadcast(amb_labels), "token", "left_anti")
        support_input = candidates.join(F.broadcast(amb_entities), "iri", "left_semi")
        picked = _score_and_pick(cand_amb, support_input, id_col)
        return cand_unamb.select(*out_cols).unionByName(picked.select(*out_cols))
    return _score_and_pick(candidates, candidates, id_col).select(*out_cols)


def _score_and_pick(cands: DataFrame, support_input: DataFrame, id_col: str) -> DataFrame:
    kind_w = (
        F.when(F.col("label_kind") == "preferred", 3)
        .when(F.col("label_kind") == "alt", 2)
        .otherwise(1)
    )
    support = support_input.groupBy(id_col, "iri").agg(
        F.countDistinct("token").alias("context_support")
    )
    scored = cands.join(support, [id_col, "iri"]).withColumn(
        "score", kind_w * 10 + F.col("context_support")
    )
    w = Window.partitionBy(id_col, "pos").orderBy(F.desc("score"), F.asc("iri"))
    return scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def mention_counts(linked: DataFrame, id_col: str = "url", entity_col: str = "iri") -> DataFrame:
    """(id, entity, n_mentions, first_pos) per linked entity.

    Call *after* canonicalization (entity_col='canonical_iri') so entities
    merged into one component aggregate into one mention record.
    """
    return linked.groupBy(id_col, entity_col).agg(
        F.count("*").alias("n_mentions"), F.min("pos").alias("first_pos")
    )
