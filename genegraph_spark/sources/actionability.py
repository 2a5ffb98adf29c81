"""The actionability curation-document transform.

Re-expresses ``transform/actionability.clj``: an actionability JSON
curation document becomes a SEPIO actionability report model — report +
approver contribution, per-condition genetic-condition nodes (MONDO
resolution via direct IRI or the skos exact-match equivalence),
per-search-date evidence contributions, the assertion set with its
three-way fallback (explicit assertions / early-rule-out "Insufficient
Evidence" / "Assertion Pending"), the preferred-condition marker, and
the deep-flattened total-score extraction.

Reference crosswalk (``transform/actionability.clj``):

- clojure.spec curation gate (:11-33)                → ``parse_actionability``
- label → SEPIO IRI vocab incl. AWG agents (:35-47)  → ``VOCAB``
- genetic-condition + MONDO resolution (:49-70)      → condition block
- search-date contributions (:72-78)                 → search block
- preferred-condition set membership (:80-86)        → assertion block
- assertion + vocab predicate (:88-102)              → assertion block
- total-scores 4-level flatten + digit parse (:104-115) → totals block
- assertion-set fallback chain (:117-130)            → ``_assertion_set``
- report + contribution skeleton (:132-158)          → report block

Spark-first / 100 TB: ONE ``from_json``; the three per-document
collections (conditions, assertions, search dates) explode separately
and union; the only joins are two BROADCAST dimension joins (gene
dictionary, condition equivalence+labels — the reference answers these
with per-row graph lookups against loaded ontologies). Set semantics
(`into #{}`, Jena model-as-set) are honored with ``array_distinct``
BEFORE the explode — no shuffle-distinct. Blank nodes are
deterministic (``iri.bnode``), unlike the reference's random
``l/blank-node`` — required for idempotent MERGE and cross-engine
oracles.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genegraph_spark.functions import iri as I
from genegraph_spark.sources.dosage_jira import _arr, _t

# assertion classification + AWG agent vocabulary (actionability.clj:35-47)
VOCAB: dict[str, str] = {
    "Definitive Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003535",
    "Strong Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003536",
    "Moderate Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003537",
    "Limited Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003538",
    "Insufficient Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003539",
    "Insufficient Evidence": "http://purl.obolibrary.org/obo/SEPIO_0003539",
    "N/A - Insufficient evidence: expert review":
        "http://purl.obolibrary.org/obo/SEPIO_0003542",
    "N/A - Insufficient evidence: early rule-out":
        "http://purl.obolibrary.org/obo/SEPIO_0003539",
    "No Actionability": "http://purl.obolibrary.org/obo/SEPIO_0003540",
    "Assertion Pending": "http://purl.obolibrary.org/obo/SEPIO_0003541",
    "Pediatric AWG":
        "http://dataexchange.clinicalgenome.org/terms/PediatricActionabilityWorkingGroup",
    "Adult AWG":
        "http://dataexchange.clinicalgenome.org/terms/AdultActionabilityWorkingGroup",
}

STATUS_FLAGS = ["Released", "Released - Under Revision", "Retracted"]
_COND_IRI_RE = (
    r"^http://purl\.obolibrary\.org/obo/(OMIM|MONDO)_\d+$"
)

ACTIONABILITY_SCHEMA = """
    iri string, statusFlag string, title string, curationVersion string,
    scoreDetails string, dateISO8601 string, earlyRuleOutStatus string,
    searchDates array<string>,
    affiliations array<struct<id: string, name: string>>,
    conditions array<struct<iri: string, curie: string, gene: string>>,
    preferred_conditions array<struct<iri: string, gene: string>>,
    assertions array<struct<iri: string, curie: string, gene: string,
                            assertion: string>>,
    scores array<struct<ScoringGroups: array<struct<
        Interventions: array<struct<ScoringGroups: array<struct<
            Total: array<string>>>>>>>>>
"""


def parse_actionability(df: DataFrame, col: str = "value") -> DataFrame:
    """Parse the curation JSON and apply the clojure.spec gate
    (actionability.clj:11-33 + :133-134): statusFlag in the released
    value set, every condition an OMIM/MONDO PURL with an HGNC gene,
    at least the required affiliation names. Invalid documents yield an
    EMPTY model in the reference (``ac_valid = false`` here)."""
    parsed = df.withColumn("doc", F.from_json(F.col(col), ACTIONABILITY_SCHEMA))
    d = F.col("doc")
    conds_ok = d["conditions"].isNotNull() & F.forall(
        d["conditions"],
        lambda c: c["iri"].rlike(_COND_IRI_RE) & c["gene"].rlike(r"^HGNC:\d+$"),
    )
    affs_ok = d["affiliations"].isNotNull() & F.forall(
        d["affiliations"], lambda a: a["name"].isNotNull()
    )
    valid = d["statusFlag"].isin(STATUS_FLAGS) & conds_ok & affs_ok
    return parsed.withColumn("ac_valid", F.coalesce(valid, F.lit(False)))


def _vocab(col: Column) -> Column:
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in VOCAB.items() for x in kv]), col
    )


def _assertion_set(d: Column) -> Column:
    """The assertion-set fallback chain (actionability.clj:117-130):
    explicit ``assertions``, else every condition with "Insufficient
    Evidence" when the early rule-out Failed, else every condition with
    "Assertion Pending" — as a DISTINCT array (``into #{}``)."""
    from_conditions = lambda label: F.transform(
        d["conditions"],
        lambda c: F.struct(
            c["iri"].alias("iri"), c["curie"].alias("curie"),
            c["gene"].alias("gene"), F.lit(label).alias("assertion"),
        ),
    )
    return F.array_distinct(
        F.coalesce(
            d["assertions"],
            F.when(
                d["earlyRuleOutStatus"] == "Failed",
                from_conditions("Insufficient Evidence"),
            ),
            from_conditions("Assertion Pending"),
        )
    )


def actionability_triples(
    parsed: DataFrame,
    gene_map: DataFrame,
    condition_map: DataFrame,
) -> DataFrame:
    """Valid parsed documents → the actionability report model as
    triples (house schema; graph = the curation IRI).

    ``gene_map(gene_curie, gene_iri, symbol)`` is the HGNC dictionary
    the reference queries per-row (``gene-resource``, the
    ``owl:same-as`` inverse, :53-54); ``condition_map(curie, mondo_iri,
    label)`` is the skos exact-match equivalence + rdfs labels
    (:57-62). Both are curated-dimension scale → broadcast joins."""
    d = F.col("doc")
    cur = F.col("doc.iri")
    contrib_b = I.bnode(cur, F.lit("contrib"))
    agent = _vocab(d["affiliations"][0]["id"])

    base = parsed.where(F.col("ac_valid"))

    # ── report skeleton + search contributions + total scores ───────
    # (actionability.clj:132-151, :72-78, :104-115) — one explode, no join
    totals = F.array_distinct(
        F.flatten(F.flatten(F.flatten(F.flatten(
            F.transform(
                F.coalesce(d["scores"], F.array()),
                lambda s: F.transform(
                    F.coalesce(s["ScoringGroups"], F.array()),
                    lambda sg: F.transform(
                        F.coalesce(sg["Interventions"], F.array()),
                        lambda iv: F.transform(
                            F.coalesce(iv["ScoringGroups"], F.array()),
                            lambda g: F.transform(
                                F.coalesce(g["Total"], F.array()),
                                lambda t: F.coalesce(
                                    F.nullif(
                                        F.regexp_extract(t, r"\d+", 0),
                                        F.lit(""),
                                    ),
                                    F.lit("0"),
                                ).cast("int").cast("string"),
                            ),
                        ),
                    ),
                ),
            )
        ))))
    )
    report_core = base.select(
        cur.alias("graph"),
        F.explode(
            F.concat(
                F.array(
                    _t(cur, I.RDF_TYPE, ":sepio/ActionabilityReport", True),
                    _t(cur, ":sepio/qualified-contribution", contrib_b, True),
                    _t(cur, ":dc/source", d["scoreDetails"], False,
                       I.XSD_STRING),
                    _t(cur, ":dc/has-version", d["curationVersion"], False,
                       I.XSD_STRING),
                    _t(cur, ":rdfs/label", d["title"], False, I.XSD_STRING),
                    _t(contrib_b, ":sepio/activity-date", d["dateISO8601"],
                       False, I.XSD_STRING),
                    _t(contrib_b, ":bfo/realizes", ":sepio/ApproverRole",
                       True),
                    _t(contrib_b, ":sepio/has-agent", agent, True),
                ),
                F.flatten(
                    F.transform(
                        F.coalesce(d["searchDates"], F.array()),
                        lambda sd, i: F.array(
                            _t(cur, ":sepio/qualified-contribution",
                               I.bnode(cur, F.lit("search"), sd,
                                       i.cast("string")), True),
                            _t(I.bnode(cur, F.lit("search"), sd,
                                       i.cast("string")),
                               ":sepio/activity-date", sd, False,
                               I.XSD_STRING),
                            _t(I.bnode(cur, F.lit("search"), sd,
                                       i.cast("string")),
                               ":bfo/realizes", ":sepio/EvidenceRole", True),
                            _t(I.bnode(cur, F.lit("search"), sd,
                                       i.cast("string")),
                               ":sepio/has-agent", agent, True),
                        ),
                    )
                ),
                F.transform(
                    totals,
                    lambda t: _t(cur, ":cg/has-total-actionability-score", t,
                                 False, I.XSD_INTEGER),
                ),
            )
        ).alias("t"),
    ).select("graph", "t.*")

    # ── genetic conditions (:49-70): explode → broadcast lookups ────
    # the label is the rdfs:label OF THE RESOLVED condition resource
    # (genetic-condition-label, :50-51) — not of the document's curie
    # row — so the label lookup joins on the resolved MONDO iri, a
    # second broadcast against the deduplicated (mondo, label) dimension
    mondo_labels = condition_map.select(
        F.col("mondo_iri").alias("res_mondo_iri"),
        F.col("label").alias("res_mondo_label"),
    ).dropDuplicates(["res_mondo_iri"])
    gc = (
        base.select(cur.alias("graph"), F.explode(d["conditions"]).alias("c"))
        .join(
            F.broadcast(condition_map.select("curie", "mondo_iri")),
            F.col("c.curie") == F.col("curie"), "left",
        )
        .drop("curie")
        .join(
            F.broadcast(gene_map),
            F.col("c.gene") == F.col("gene_curie"), "left",
        )
        .drop("gene_curie")
    )
    mondo = F.when(
        F.col("c.iri").contains("MONDO"), F.col("c.iri")
    ).otherwise(F.col("mondo_iri"))
    gc = gc.withColumn("res_mondo", mondo).join(
        F.broadcast(mondo_labels),
        F.col("res_mondo") == F.col("res_mondo_iri"), "left",
    )
    mondo = F.col("res_mondo")
    gc_b = I.bnode(F.col("graph"), F.lit("gc"), F.col("c.iri"), F.col("c.gene"))
    gc_label = F.concat(
        F.coalesce(F.col("res_mondo_label"), F.lit("")), F.lit(", "),
        F.coalesce(F.col("symbol"), F.lit("")),
    )
    gc_triples = gc.select(
        "graph",
        F.explode(
            _arr(
                mondo.isNotNull(),
                _t(F.col("graph"), ":sepio/is-about-condition", gc_b, True),
                _t(gc_b, I.RDF_TYPE, ":sepio/GeneticCondition", True),
                _t(gc_b, I.RDF_TYPE, ":cg/ActionabilityGeneticCondition", True),
                _t(gc_b, ":rdfs/sub-class-of", mondo, True),
                _t(gc_b, ":sepio/is-about-gene", F.col("gene_iri"), True),
                _t(gc_b, ":rdfs/label", gc_label, False, I.XSD_STRING),
            )
        ).alias("t"),
    ).select("graph", "t.*")

    # ── assertions (:88-102, :117-130): explode set → gene lookup ───
    am = (
        base.select(
            cur.alias("graph"),
            F.col("doc.preferred_conditions").alias("pref"),
            F.explode(_assertion_set(d)).alias("a"),
        )
        .join(
            F.broadcast(gene_map),
            F.col("a.gene") == F.col("gene_curie"), "left",
        )
        .drop("gene_curie")
    )
    a_b = I.bnode(
        F.col("graph"), F.lit("assert"), F.col("a.iri"), F.col("a.gene"),
        F.col("a.assertion"),
    )
    preferred = F.exists(
        F.coalesce(F.col("pref"), F.array().cast(
            "array<struct<iri:string,gene:string>>"
        )),
        lambda p: (p["iri"] == F.col("a.iri")) & (p["gene"] == F.col("a.gene")),
    )
    a_triples = am.select(
        "graph",
        F.explode(
            F.concat(
                F.array(
                    _t(F.col("graph"), ":bfo/has-part", a_b, True),
                    _t(a_b, I.RDF_TYPE, ":sepio/ActionabilityAssertion", True),
                    _t(a_b, ":sepio/has-subject", F.col("gene_iri"), True),
                    _t(a_b, ":sepio/has-predicate",
                       _vocab(F.col("a.assertion")), True),
                    _t(a_b, ":sepio/has-object", F.col("a.iri"), True),
                ),
                _arr(
                    preferred,
                    _t(a_b, I.RDF_TYPE,
                       ":cg/ActionabilityAssertionForPreferredCondition", True),
                ),
            )
        ).alias("t"),
    ).select("graph", "t.*")

    out = report_core.unionByName(gc_triples).unionByName(a_triples)
    # nil-safe like the reference's model building: a statement with an
    # unresolved resource never reaches the model
    return out.where(
        F.col("subject").isNotNull() & F.col("object").isNotNull()
    )
