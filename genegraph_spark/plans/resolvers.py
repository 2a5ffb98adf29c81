"""Named resolver registry — the reference's GraphQL public surface
re-expressed as a flat name → function map over the triples view.

Reference analogs: ``resolver-map``
(``src/genegraph/source/graphql/core.clj:42-150``) registers keyword →
``(fn [context args value])`` resolvers; per-resolver modifiers
limit/offset/sort/text come from
``source/graphql/common/curation.clj:151-170``; the totals resolvers
(``tot-*``, ``core.clj:86-90``; ``server_status.clj``) are the
``statistics`` view here.

Spark-first shape: a resolver is ``fn(triples, **args) -> DataFrame``.
Every resolver composes predicate-filtered scans + broadcast joins the
same way the curation views do; the registry only names them so an API
tier (GraphQL/REST) can dispatch by string — resolution itself stays a
deferred DataFrame plan, so a serving layer can batch, cache, or push
further filters before collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import iri as I
from ..operators import algebra as A
from . import curation as CUR


def entity_card(triples: DataFrame, iri: str) -> DataFrame:
    """Point lookup (resource.clj single-entity resolvers): one row with
    type, preferred label, alias count, supporting-page count."""
    t = triples.where(F.col("subject") == iri)
    return t.groupBy(F.col("subject").alias("entity")).agg(
        F.max(F.when(F.col("predicate") == I.RDF_TYPE, F.col("object"))).alias("type"),
        F.max(F.when(F.col("predicate") == I.PREF_LABEL, F.col("object"))).alias(
            "preferred_label"
        ),
        F.count(
            F.when(F.col("predicate").isin(I.ALT_LABEL, I.HIDDEN_LABEL), True)
        ).alias("n_aliases"),
    ).join(
        triples.where(
            (F.col("predicate") == I.P_MENTIONS) & (F.col("object") == iri)
        )
        .agg(F.countDistinct("subject").alias("n_pages"))
        .select(F.lit(iri).alias("entity"), "n_pages"),
        "entity",
        "left_outer",
    ).withColumn("n_pages", F.coalesce("n_pages", F.lit(0).cast("long")))


def entity_list(
    triples: DataFrame,
    entity_type: str | None = None,
    text: str | None = None,
    limit: int = 10,
    offset: int = 0,
) -> DataFrame:
    """List resolver with the standard modifiers (curation.clj:151-170):
    optional type filter, optional label text filter, deterministic
    sort + limit/offset pagination via A.slice."""
    pats = [("?entity", I.PREF_LABEL, "?label")]
    if entity_type:
        pats.append(("?entity", I.RDF_TYPE, I.TYPE_IRIS[entity_type]))
    rows = A.bgp(triples, pats).dropDuplicates(["entity", "label"])
    if text:
        rows = rows.where(F.lower(F.col("label")).contains(text.lower()))
    return A.slice(
        rows, limit=limit, offset=offset, order=[("?label", "asc"), ("?entity", "asc")]
    )


def statistics(triples: DataFrame) -> DataFrame:
    """Single-row KG totals (tot-* / server-status resolvers): one scan,
    conditional aggregates — no per-total point queries."""
    is_type = F.col("predicate") == I.RDF_TYPE

    def typed(tp):
        return F.countDistinct(
            F.when(is_type & (F.col("object") == tp), F.col("subject"))
        )

    return triples.agg(
        F.count("*").alias("n_triples"),
        typed(I.C_WEBPAGE).alias("n_pages"),
        typed(I.TYPE_IRIS["gene"]).alias("n_genes"),
        typed(I.TYPE_IRIS["disease"]).alias("n_diseases"),
        typed(I.TYPE_IRIS["variant"]).alias("n_variants"),
        F.count(F.when(F.col("predicate") == I.P_MENTIONS, True)).alias("n_mentions"),
    )


def evidence_model(events: DataFrame) -> DataFrame:
    """Synthetic SEPIO evidence forest in the triples schema — chains of
    four evidence lines per root assertion (root → child → grandchild →
    great-grandchild by consecutive event ids), each line carrying a
    strength score and description, each root a qualified contribution
    with agent + activity date. This is the model shape the evidence-card
    resolvers traverse (``evidence_line.clj`` / ``contribution.clj`` /
    ``evidence.clj`` field resolvers over ``:sepio/has-evidence``
    trees)."""
    el = F.concat(F.lit("urn:el:"), F.col("event_id").cast("string"))
    parent = F.concat(F.lit("urn:el:"), (F.col("event_id") - 1).cast("string"))
    contrib = F.concat(F.lit("urn:contrib:"), F.col("event_id").cast("string"))
    agent = F.concat(F.lit("urn:aff:"), (F.col("user_id") % 10).cast("string"))
    is_root = F.col("event_id") % 4 == 0

    def t(s, p, o, is_iri):
        return events.select(
            F.lit("g").alias("graph"),
            s.alias("subject"),
            F.lit(p).alias("predicate"),
            o.cast("string").alias("object"),
            F.lit(is_iri).alias("object_is_iri"),
            F.lit(None).cast("string").alias("object_datatype"),
        )

    parts = [
        t(el, I.RDF_TYPE, F.lit(":sepio/Assertion"), True).where(is_root),
        t(parent, ":sepio/has-evidence", el, True).where(~is_root),
        t(el, ":sepio/evidence-line-strength-score", F.round("value", 4), False),
        t(el, ":dc/description", F.col("event_type"), False),
        t(el, ":sepio/qualified-contribution", contrib, True).where(is_root),
        t(contrib, ":sepio/has-agent", agent, True).where(is_root),
        # fixed 6-digit micros: a bare timestamp→string cast trims
        # trailing zeros differently across engines
        t(
            contrib,
            ":sepio/activity-date",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            False,
        ).where(is_root),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def evidence_cards(model: DataFrame, max_depth: int = 4) -> DataFrame:
    """Flatten every root assertion's evidence tree into card rows —
    the evidence-card surface a UI renders from the per-field resolvers
    (``evidence_line.clj`` score/items, ``evidence.clj``
    source/description, ``contribution.clj`` agent/realizes/date,
    ``assertion.clj``). The reference answers each field with a separate
    per-node traversal; here the WHOLE card for every assertion
    materializes in one plan.

    Returns (root, line, depth, score, description, agent,
    activity_date): one row per (root, descendant line) with the root's
    approval contribution denormalized on.

    Scale shape: evidence trees are shallow (≤``max_depth``), so the
    traversal is ``max_depth`` self-joins of the dimension-scale edge
    frame — NO unbounded fixpoint, no driver-side recursion; per-line
    fields and the root contribution attach with ordinary equi-joins
    Catalyst can reorder/broadcast."""
    edges = (
        model.where(F.col("predicate") == ":sepio/has-evidence")
        .select(F.col("subject").alias("parent"), F.col("object").alias("child"))
        .distinct()
    )
    roots = (
        model.where(
            (F.col("predicate") == I.RDF_TYPE)
            & (F.col("object") == ":sepio/Assertion")
        )
        .select(F.col("subject").alias("root"))
        .distinct()
    )
    level = roots.join(edges, roots.root == edges.parent).select(
        "root", F.col("child").alias("line"), F.lit(1).alias("depth")
    )
    acc = level
    for d in range(2, max_depth + 1):
        level = level.join(edges, level.line == edges.parent).select(
            "root", F.col("child").alias("line"), F.lit(d).alias("depth")
        )
        acc = acc.unionByName(level)

    def field(pred, name):
        return model.where(F.col("predicate") == pred).select(
            F.col("subject").alias("line"), F.col("object").alias(name)
        )

    cards = (
        acc.join(field(":sepio/evidence-line-strength-score", "score"), "line", "left_outer")
        .join(field(":dc/description", "description"), "line", "left_outer")
    )
    contrib = (
        model.where(F.col("predicate") == ":sepio/qualified-contribution")
        .select(F.col("subject").alias("root"), F.col("object").alias("contrib"))
        .join(
            model.where(F.col("predicate") == ":sepio/has-agent").select(
                F.col("subject").alias("contrib"), F.col("object").alias("agent")
            ),
            "contrib",
            "left_outer",
        )
        .join(
            model.where(F.col("predicate") == ":sepio/activity-date").select(
                F.col("subject").alias("contrib"),
                F.col("object").alias("activity_date"),
            ),
            "contrib",
            "left_outer",
        )
        .drop("contrib")
    )
    return cards.join(contrib, "root", "left_outer").select(
        "root",
        "line",
        "depth",
        F.col("score").cast("double").alias("score"),
        "description",
        "agent",
        "activity_date",
    )


RESOLVERS = {
    "entity": entity_card,
    "entities": entity_list,
    # assertion-backed resolvers (take the curation_assertions frame,
    # not triples — affiliation.clj / genetic_condition.clj analogs)
    "affiliations": CUR.affiliations,
    "genetic_conditions": CUR.genetic_conditions,
    "gene_disease_pairs": CUR.gene_disease_pairs,
    "entity_page_counts": CUR.entity_page_counts,
    "activities": CUR.curation_activities,
    "suggest": CUR.suggest_infix,
    "suggest_prefix": CUR.suggest_labels,
    "disease_subtree": CUR.disease_subtree_counts,
    "describe": A.describe,
    "statistics": statistics,
    "evidence_cards": evidence_cards,
}


def resolve(name: str, triples: DataFrame, **args) -> DataFrame:
    """Dispatch by resolver name (the lacinia field-resolver call analog,
    core.clj:42). Unknown names fail fast with the known surface."""
    if name not in RESOLVERS:
        raise KeyError(f"unknown resolver {name!r}; known: {sorted(RESOLVERS)}")
    return RESOLVERS[name](triples, **args)


def region_model(part: DataFrame) -> DataFrame:
    """Synthetic sequence-feature model in the triples schema — region
    features with a chromosomal band and per-row coordinate nodes
    carrying assembly/chromosome/strand/interval, the shape the
    region-feature and coordinate field resolvers traverse
    (``region_feature.clj`` label/band/coordinates;
    ``coordinate.clj`` build/assembly/chromosome/strand/start/end over
    ``:geno/has-location`` → ``:so/assembly`` / ``:geno/has-interval``).
    Deterministic derivation from the ``part`` table."""
    feat = F.concat(F.lit("urn:region:"), (F.col("p_partkey") % 40).cast("string"))
    coord = F.concat(F.lit("urn:coord:"), F.col("p_partkey").cast("string"))
    asm = F.concat(F.lit("urn:assembly:"), F.col("p_partkey").cast("string"))
    build = F.when(F.col("p_partkey") % 2 == 0, "GRCh38").otherwise("GRCh37")
    chrom = F.concat(F.lit("chr"), (F.col("p_partkey") % 22 + 1).cast("string"))
    strand = F.when(F.col("p_partkey") % 3 == 0, "-").otherwise("+")
    start = (F.col("p_partkey") * 1000).cast("long")
    end = (F.col("p_partkey") * 1000 + (F.col("p_size") % 50 + 1) * 100).cast(
        "long"
    )
    band = F.concat(
        F.when(F.col("p_partkey") % 2 == 0, F.lit("q")).otherwise(F.lit("p")),
        (F.col("p_partkey") % 40 % 36 + 11).cast("string"),
    )

    def t(s, p, o, is_iri):
        return part.select(
            F.lit("g").alias("graph"),
            s.alias("subject"),
            F.lit(p).alias("predicate"),
            o.cast("string").alias("object"),
            F.lit(is_iri).alias("object_is_iri"),
            F.lit(None).cast("string").alias("object_datatype"),
        )

    parts = [
        t(feat, I.RDF_TYPE, F.lit(":so/SequenceFeature"), True),
        t(feat, ":rdfs/label", F.concat(F.lit("region "), feat), False),
        t(feat, ":so/chromosome-band", band, False),
        t(feat, ":geno/has-location", coord, True),
        t(coord, ":so/assembly", asm, True),
        t(asm, ":data/genome-build-identifier", build, False),
        t(asm, ":so/chromosome", chrom, False),
        t(coord, ":geno/on-strand", strand, False),
        t(coord, ":geno/has-interval", F.concat(coord, F.lit("_iv")), True),
        t(F.concat(coord, F.lit("_iv")), ":geno/start-position", start, False),
        t(F.concat(coord, F.lit("_iv")), ":geno/end-position", end, False),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def region_feature_cards(model: DataFrame) -> DataFrame:
    """One row per (region feature, coordinate): label + chromosomal
    band + the coordinate's build/chromosome/strand/start/end — the
    region-feature and coordinate per-field resolvers
    (``region_feature.clj``, ``coordinate.clj``) collapsed into one
    star-join plan over predicate-filtered scans. All frames share the
    feature/coordinate keys; Catalyst reorders/broadcasts freely; no
    per-node ld1-> point traversals."""

    def field(pred, key, name):
        return model.where(F.col("predicate") == pred).select(
            F.col("subject").alias(key), F.col("object").alias(name)
        )

    feats = (
        model.where(
            (F.col("predicate") == I.RDF_TYPE)
            & (F.col("object") == ":so/SequenceFeature")
        )
        .select(F.col("subject").alias("feature"))
        .distinct()
    )
    loc = model.where(F.col("predicate") == ":geno/has-location").select(
        F.col("subject").alias("feature"), F.col("object").alias("coordinate")
    )
    iv = model.where(F.col("predicate") == ":geno/has-interval").select(
        F.col("subject").alias("coordinate"), F.col("object").alias("_iv")
    )
    asm = model.where(F.col("predicate") == ":so/assembly").select(
        F.col("subject").alias("coordinate"), F.col("object").alias("_asm")
    )
    return (
        feats.join(field(":rdfs/label", "feature", "label"), "feature", "left_outer")
        .join(
            field(":so/chromosome-band", "feature", "band"), "feature", "left_outer"
        )
        .join(loc, "feature")
        .join(field(":geno/on-strand", "coordinate", "strand"), "coordinate", "left_outer")
        .join(asm, "coordinate", "left_outer")
        .join(
            field(":data/genome-build-identifier", "_asm", "build"),
            "_asm",
            "left_outer",
        )
        .join(field(":so/chromosome", "_asm", "chromosome"), "_asm", "left_outer")
        .join(iv, "coordinate", "left_outer")
        .join(
            field(":geno/start-position", "_iv", "start_pos"), "_iv", "left_outer"
        )
        .join(field(":geno/end-position", "_iv", "end_pos"), "_iv", "left_outer")
        .select(
            "feature",
            "coordinate",
            "label",
            "band",
            "build",
            "chromosome",
            "strand",
            F.col("start_pos").cast("long").alias("start_pos"),
            F.col("end_pos").cast("long").alias("end_pos"),
        )
    )
