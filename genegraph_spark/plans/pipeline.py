"""End-to-end KG-construction pipeline.

The reference processes each event through a Pedestal interceptor chain
(``src/genegraph/sink/event.clj:100-137``): record lineage → add metadata
→ parse/transform to RDF → derive graph IRI → validate → extract subjects
→ infer action → write named graph → snapshot. Re-expressed as a linear
DataFrame plan (SURVEY §3.1):

    pages ──extract──▶ +text ──quarantine split──▶ valid
      valid ──compact versions──▶ live pages (latest non-tombstone per url)
      live ──tokenize ▷ broadcast-join dictionary──▶ candidate mentions
      candidates ──contextual scoring──▶ linked mentions
      dictionary ──same-as CC──▶ canonical map (broadcast)
      linked ⋈ canonical ──explode──▶ triples
      triples ──MERGE by graph──▶ named-graph store (+ lineage)

Every stage is JVM-side except the single pandas-UDF extraction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..functions.text import extract_text, is_tombstone
from ..operators import canonicalize, mentions, triples as T, versioned


@dataclass
class PipelineResult:
    pages: DataFrame
    quarantine: DataFrame
    live_pages: DataFrame
    linked: DataFrame
    canonical_map: DataFrame
    triples: DataFrame
    deleted_graphs: DataFrame
    extras: dict = field(default_factory=dict)


def construct_kg(
    spark: SparkSession,
    sf_dir: str,
    pages: DataFrame | None = None,
    dictionary: DataFrame | None = None,
    use_golden_text: bool = False,
) -> PipelineResult:
    """Build the KG from the pages table (synthesized from sf_dir unless
    given). ``use_golden_text`` skips the pandas-UDF extraction (the
    fixture carries golden text) — used by oracle-facing queries so the
    DuckDB SQL side stays expressible; the extraction itself is verified
    byte-identical by its own query + tests.
    """
    if pages is None:
        pages = fixtures.pages_df(spark, sf_dir)
    if dictionary is None:
        dictionary = fixtures.dictionary_df(spark)

    # 1. extract + quarantine (annotate.clj:128-132 → quarantine not fail)
    if use_golden_text:
        extracted = pages.withColumn("etext", F.col("text"))
    else:
        extracted = pages.withColumn("etext", extract_text(F.col("html")))
    extracted = extracted.withColumn("is_del", is_tombstone(F.col("html")))
    quarantine = extracted.where(F.col("etext").isNull() & ~F.col("is_del"))
    valid = extracted.where(F.col("etext").isNotNull() | F.col("is_del"))

    # 2. compact version history: newest version per url wins; tombstone
    #    heads are deletions (ga4gh.clj:170-190 semantics)
    heads = versioned.latest_version(valid, key="url", version="version")
    # live is scanned by tokenize AND by two triple families — cache it
    # (at cluster scale: a persisted intermediate table / DISK_ONLY)
    live = heads.where(~F.col("is_del")).select(
        "url", "warc_ts", F.col("etext").alias("text"), "lang", "version", "doc_id"
    ).cache()
    deleted_graphs = heads.where(F.col("is_del")).select("url").withColumnRenamed("url", "graph")

    # 3. mention detection + linking (broadcast gazetteer)
    alias = fixtures.alias_df(spark)
    toks = mentions.tokenize(live)
    cands = mentions.detect_mentions(toks, alias)
    linked = mentions.link_entities(cands, alias=alias)

    # 4. canonicalization (same-as CC fixpoint), then aggregate per
    #    (page, canonical entity) so merged entities collapse to one record
    # canon is consumed by the mention join AND dictionary triples; the
    # small-graph fast path returns a materialized local result, and the
    # distributed path checkpoints internally — no extra barrier needed.
    canon = canonicalize.canonical_entity_map(dictionary, fixtures.sameas_df(spark))
    # linked_canon fans out into 5 mention-triple families: cache so the
    # tokenize→broadcast-join→window chain runs once, not 5×.
    linked_canon = mentions.mention_counts(
        linked.join(F.broadcast(canon), "iri"), entity_col="canonical_iri"
    ).cache()

    # 5. triple materialization
    all_triples = T.union_all(
        [
            T.page_triples(live),
            T.mention_triples(linked_canon),
            T.dictionary_triples(dictionary, canon),
        ]
    )
    return PipelineResult(
        pages=pages,
        quarantine=quarantine,
        live_pages=live,
        linked=linked,
        canonical_map=canon,
        triples=all_triples,
        deleted_graphs=deleted_graphs,
    )


def run_to_store(spark: SparkSession, sf_dir: str, store_path: str, **kw):
    """Full batch run: construct + MERGE into the named-graph store."""
    from ..sinks.named_graph import NamedGraphStore

    res = construct_kg(spark, sf_dir, **kw)
    store = NamedGraphStore(spark, store_path)
    commit = store.merge(res.triples, delete_graphs=res.deleted_graphs)
    return res, store, commit
