"""The full gene-validity GDM transform chain.

Reference: ``transform/gene_validity_refactor.clj:414-463``
(``transform-gdm``) — a union of 22 CONSTRUCT passes over the source
model merged with the ``gdm_sepio_relationships.ttl`` dictionary, a
segregation-unlink rewrite, evidence-connection + legacy-id augments,
the proband-score-cap aggregation (``add-proband-scores``,
``gene_validity_refactor.clj:350-369``), and a final variant-score
unlink rewrite.

Spark-first shape: every CONSTRUCT step is one declarative plan over
the same (small, per-event) model frame; the union of their outputs is
a single lazy DAG. At 100 TB scale the unit of work is one GDM EVENT
(a few hundred triples), so the whole chain runs as a per-graph
transformation over a corpus of events — the model frames here carry a
``graph`` column throughout, and nothing in the chain collects more
than a bounded scalar (approval date / assertion id: ≤1 row each, the
same bounded lookups the reference does driver-side via ``q/select``
+ ``first``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sparql import RDF_TYPE, RDF_TYPE_FULL, load_query_dir, sparql

# Public bases, verbatim from the reference
# (transform/gene_validity_refactor.clj:11-13, 414-427).
GCI_BASE = "http://dataexchange.clinicalgenome.org/gci/"
LEGACY_REPORT_BASE = GCI_BASE + "legacy-report_"
AFF_BASE = "http://dataexchange.clinicalgenome.org/agent/"
AR_BASE = "http://reg.genome.network/allele/"
CV_BASE = "https://www.ncbi.nlm.nih.gov/clinvar/variation/"
PM_BASE = "https://pubmed.ncbi.nlm.nih.gov/"

# The construct-pass ordering of transform-gdm's q/union block
# (gene_validity_refactor.clj:428-451). Names are load_query_dir stems.
CONSTRUCT_ORDER = [
    "construct-proposition",
    "construct-evidence-level-assertion",
    "construct-experimental-evidence-assertions",
    "construct-genetic-evidence-assertion",
    "construct-ad-variant-assertions",
    "construct-ar-variant-assertions",
    "construct-cc-and-seg-assertions",
    "construct-proband-score",
    "construct-model-systems-evidence",
    "construct-functional-evidence",
    "construct-functional-alteration-evidence",
    "construct-rescue-evidence",
    "construct-case-control-evidence",
    "construct-proband-segregation-evidence",
    "construct-family-segregation-evidence",
    "construct-alleles",
    "construct-articles",
    "construct-earliest-articles",
    "construct-secondary-contributions",
    "construct-variant-score",
    "construct-ar-variant-score",
    "construct-unscoreable-evidence",
]

_SCORE_PRED = ":sepio/evidence-line-strength-score"
_HAS_EVIDENCE = ":sepio/has-evidence"
_CAP_LINE_TYPE = ":sepio/ProbandScoreCapEvidenceLine"


def _type_rows(model: DataFrame):
    return F.col("predicate").isin([RDF_TYPE, RDF_TYPE_FULL])


def find_affiliation(gdm: DataFrame) -> str | None:
    """The curation's affiliation IRI — the most recent provisional
    classification's affiliation, else the GDM's own
    (``has-affiliation-query``, gene_validity_refactor.clj:397-412)."""
    rows = sparql(
        gdm,
        """prefix gci: <http://dataexchange.clinicalgenome.org/gci/>
           select ?affiliationIRI where {
             ?proposition a gci:gdm .
             OPTIONAL { ?proposition gci:affiliation ?gdmAffiliationIRI . }
             OPTIONAL {
               ?classification a gci:provisionalClassification .
               ?classification gci:affiliation ?classificationAffiliationIRI .
               ?classification gci:last_modified ?date .
             }
             BIND(COALESCE(?classificationAffiliationIRI, ?gdmAffiliationIRI)
                  AS ?affiliationIRI) }
           ORDER BY DESC(?date) LIMIT 1""",
    ).collect()  # bounded: LIMIT 1
    return rows[0].affiliationIRI if rows else None


def find_hgnc_gene(gdm: DataFrame) -> str | None:
    """``gdm-is-about-gene-query`` (gene_validity_refactor.clj:340-346)."""
    rows = (
        sparql(
            gdm,
            """prefix gci: <http://dataexchange.clinicalgenome.org/gci/>
               select ?hgnc where {
                 ?gdm a gci:gdm .
                 ?gdm gci:gene ?gene .
                 ?gene gci:hgncId ?hgnc }""",
        )
        .limit(1)
        .collect()
    )
    return rows[0].hgnc if rows else None


def legacy_website_id(model: DataFrame, names: dict | None = None) -> str | None:
    """Assertion id + approval date composite
    (``legacy-website-id``, gene_validity_refactor.clj:371-395)."""
    import re as _re

    acts = sparql(
        model,
        "select ?activity where { ?activity :bfo/realizes :sepio/ApproverRole }",
        names=names,
    ).limit(1).collect()  # bounded: one approval activity per curation
    date = None
    if acts:
        dates = sparql(
            model,
            "select ?d where { ?activity :sepio/activity-date ?d }",
            names=names,
            activity=("iri", acts[0].activity),
        ).limit(1).collect()
        if dates:
            date = dates[0].d.replace(":", "")
    asserts = sparql(
        model,
        "select ?assertion where { ?assertion a :sepio/GeneValidityEvidenceLevelAssertion }",
        names=names,
    ).limit(1).collect()
    if not asserts:
        return None
    m = _re.match(r"^(.*/)([a-z0-9-]*)$", asserts[0].assertion)
    if not m:
        return None
    return f"{m.group(1)}assertion_{m.group(2)}-{date}"


def add_proband_scores(
    model: DataFrame, cap: float = 3.0, names: dict | None = None
) -> DataFrame:
    """SOPv8 AR proband-score cap: for every
    ``:sepio/ProbandScoreCapEvidenceLine``, emit one
    ``evidence-line-strength-score`` triple = ``min(cap, sum(score of
    has-evidence targets))`` (``add-proband-scores``,
    gene_validity_refactor.clj:350-369).

    One aggregation: cap-line type rows → has-evidence edges →
    evidence scores, grouped by line. Integral results format without
    a trailing ``.0`` (Jena prints ``3`` for the capped integer sum)."""
    names = names or {}
    cap_type = names.get(_CAP_LINE_TYPE, _CAP_LINE_TYPE)
    has_ev = names.get(_HAS_EVIDENCE, _HAS_EVIDENCE)
    score_pred = names.get(_SCORE_PRED, _SCORE_PRED)
    lines = model.where(
        _type_rows(model) & (F.col("object") == cap_type)
    ).select(F.col("graph"), F.col("subject").alias("line"))
    edges = model.where(F.col("predicate") == has_ev).select(
        F.col("subject").alias("line"), F.col("object").alias("ev")
    )
    scores = model.where(F.col("predicate") == score_pred).select(
        F.col("subject").alias("ev"),
        F.col("object").try_cast("double").alias("score"),
    )
    agg = (
        lines.join(edges, "line")
        .join(scores, "ev")
        .groupBy("graph", "line")
        .agg(F.least(F.lit(cap), F.sum("score")).alias("capped"))
    )
    fmt = F.when(
        F.col("capped") == F.floor("capped"),
        F.col("capped").cast("long").cast("string"),
    ).otherwise(F.col("capped").cast("string"))
    new_triples = agg.select(
        "graph",
        F.col("line").alias("subject"),
        F.lit(score_pred).alias("predicate"),
        fmt.alias("object"),
        F.lit(False).alias("object_is_iri"),
        F.lit(None).cast("string").alias("object_datatype"),
    )
    return model.unionByName(new_triples)


def transform_gdm(
    gdm: DataFrame,
    query_dir: str,
    dictionary: DataFrame,
    entrez_gene: str | None = None,
    affiliation: str | None = None,
    names: dict | None = None,
) -> DataFrame:
    """Run the reference's full ``transform-gdm`` sequence
    (gene_validity_refactor.clj:414-463) over one GDM model frame.

    ``query_dir`` — directory of the reference ``.sparql`` files (loaded
    once via :func:`load_query_dir`). ``dictionary`` — the parsed
    ``gdm_sepio_relationships.ttl`` triples (``serialize.read_turtle``).
    ``entrez_gene`` — pre-resolved Entrez IRI for the GDM's HGNC gene
    (the reference resolves it against its HGNC dataset,
    clj:347-348+417; callers without that dataset resolve it upstream).
    ``names`` — optional local-names table
    (``functions.names.load_names_edn``) expanding ``:ns/name`` keywords
    to full IRIs, required for the unlink passes to match the
    dictionary-typed evidence lines exactly like the reference.
    """
    qs = load_query_dir(query_dir, names=names)
    spark = gdm.sparkSession
    # The 40-OPTIONAL construct plans spend most of their wall time in
    # Catalyst analysis; constraint propagation contributes up to half
    # of it on these shapes (measured 18.8s→8.5s on
    # construct_functional_evidence) and is also where the fused-plan
    # crash lived. Scoped set/restore — materialization is eager inside
    # this function, so the toggle never leaks into caller plans.
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_prev = spark.conf.get(cp_key, "true")
    spark.conf.set(cp_key, "false")
    try:
        return _transform_gdm(
            gdm, qs, dictionary, entrez_gene, affiliation, names
        )
    finally:
        spark.conf.set(cp_key, cp_prev)


def _transform_gdm(gdm, qs, dictionary, entrez_gene, affiliation, names):
    if affiliation is None:
        affiliation = find_affiliation(gdm)
    params = {
        "gcibase": GCI_BASE,
        "legacy_report_base": LEGACY_REPORT_BASE,
        "arbase": AR_BASE,
        "cvbase": CV_BASE,
        "pmbase": PM_BASE,
        "affbase": AFF_BASE,
    }
    if affiliation is not None:
        params["affiliation"] = ("iri", affiliation)
    if entrez_gene is not None:
        params["entrez_gene"] = ("iri", entrez_gene)

    source = gdm.unionByName(dictionary).localCheckpoint(eager=True)
    # the q/union block: 22 constructs, all over the SOURCE model. Each
    # construct is checkpointed as its OWN job — fusing all 22 into one
    # Catalyst plan (some have 40+ triple-pattern joins) explodes plan
    # compilation/codegen, exactly like the reference executes each
    # q/union arm as a separate Jena query. At corpus scale the unit of
    # parallelism is the EVENT (graph column), not the construct — the
    # per-construct jobs are each fully distributed over events.
    unlinked = (
        reduce(
            DataFrame.unionByName,
            [
                qs[name].run(source, **params).localCheckpoint(eager=True)
                for name in CONSTRUCT_ORDER
            ],
        )
        .dropDuplicates()
        # cut before the unlink rewrite: feeding the lazy union+dedup
        # (an Aggregate over 22 branches) into the next query's MINUS
        # trips the same Catalyst constraint-propagation failure
        .localCheckpoint(eager=True)
    )
    # rewrite: drop unscored family segregations; checkpoint so the
    # union lineage does not re-execute under the later passes
    unlinked = (
        qs["unlink-segregations-when-no-proband-and-lod-scores"]
        .run(unlinked)
        .localCheckpoint(eager=True)
    )
    # augments over the ACCUMULATED model. Each pass is checkpointed:
    # chaining the full-model rewrites lazily re-feeds the whole prior
    # plan into Catalyst's constraint propagation, which both explodes
    # compile cost and (observed on Spark 4.1) can crash PruneFilters
    # with an AttributeMap miss on the fused union+aggregate plan.
    connections = qs["construct-evidence-connections"].run(
        unlinked.unionByName(dictionary)
    ).localCheckpoint(eager=True)
    legacy = legacy_website_id(unlinked, names=names)
    parts = [unlinked, connections]
    if legacy is not None:
        parts.append(
            qs["add-legacy-website-id"]
            .run(unlinked, legacy_id=legacy)
            .localCheckpoint(eager=True)
        )
    linked = reduce(DataFrame.unionByName, parts)
    scored = add_proband_scores(linked, names=names).localCheckpoint(eager=True)
    final = qs["unlink-variant-scores-when-proband-scores-exist"].run(scored)
    return final.dropDuplicates()
