"""The legacy GCI gene-validity report transform.

Re-expresses ``transform/gci_legacy.clj``: a legacy GCI report JSON
becomes a gene-validity report model — report + embedded JSON content
node, the evidence-level assertion (label → SEPIO concept map, SOP
version attribution with the selected-vs-actual split), the validity
proposition (HGNC gene via the ``owl:same-as`` inverse lookup, MOI HP
term extracted from the free-text mode-of-inheritance), approver and
secondary-contributor contributions.

Reference crosswalk (``transform/gci_legacy.clj``):

- spec gate (report must carry :iri, :10-11, :131-138)   → ``gci_valid``
- FinalClassificationDate (:16-17)                       → ``report_date``
- validity proposition + MOI HP regex (:19-33)           → proposition block
- evidence-level label → concept map (:35-47)            → ``EVIDENCE_LEVELS``
- SOP version map (:49-55)                               → ``SOP_VERSIONS``
- approver contribution (:57-61)                         → contribution block
- secondary contributors filter (:63-81)                 → contributors block
- assertion + is-specified-by/has-format (:83-96)        → assertion block
- JSON content node (:98-100)                            → content block
- report skeleton + colon-stripped id (:102-115)         → report block

Spark-first / 100 TB: ONE ``from_json``, one BROADCAST gene-dictionary
join (the reference's per-row ``owl:same-as`` inverse point lookup),
contributors explode, one array explode to triples. The content node
keeps the ORIGINAL payload bytes (the reference re-encodes the parsed
map — byte-unstable across JSON writers; keeping the source bytes is
deterministic and content-identical). Deterministic bnodes throughout.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genegraph_spark.functions import iri as I
from genegraph_spark.sources.dosage_jira import _arr, _lit_map, _t

GCI_ROOT = "http://dataexchange.clinicalgenome.org/gci/"
AFFILIATION_ROOT = "http://dataexchange.clinicalgenome.org/agent/"

# FinalClassification label → SEPIO evidence concept (gci_legacy.clj:35-47)
EVIDENCE_LEVELS: dict[str, str] = {
    "Definitive": ":sepio/DefinitiveEvidence",
    "Limited": ":sepio/LimitedEvidence",
    "Moderate": ":sepio/ModerateEvidence",
    "No Reported Evidence": ":sepio/NoEvidence",
    "No Known Disease Relationship": ":sepio/NoEvidence",
    "Strong*": ":sepio/StrongEvidence",
    "Contradictory (disputed)": ":sepio/DisputingEvidence",
    "Strong": ":sepio/StrongEvidence",
    "Contradictory (refuted)": ":sepio/RefutingEvidence",
    "Refuted": ":sepio/RefutingEvidence",
    "Disputed": ":sepio/DisputingEvidence",
    "No Classification": ":sepio/NoEvidence",
}

SOP_VERSIONS: dict[str, str] = {
    str(v): f":sepio/ClinGenGeneValidityEvaluationCriteriaSOP{v}"
    for v in range(4, 10)
}

GCI_LEGACY_SCHEMA = """
    iri string, title string, sopVersion string, selectedSOPVersion string,
    affiliation struct<id: string>,
    genes array<struct<curie: string>>,
    conditions array<struct<iri: string>>,
    scoreJson struct<
        ModeOfInheritance: string,
        summary: struct<
            FinalClassification: string,
            FinalClassificationDate: string,
            contributors: array<struct<id: string, role: string>>>>
"""




def parse_gci_legacy(df: DataFrame, col: str = "value") -> DataFrame:
    """Parse legacy report JSON; ``gci_valid`` mirrors the spec gate
    (a report without :iri is marked invalid, gci_legacy.clj:131-138)."""
    parsed = df.withColumn("raw", F.col(col)).withColumn(
        "doc", F.from_json(F.col(col), GCI_LEGACY_SCHEMA)
    )
    return parsed.withColumn(
        "gci_valid", F.col("doc.iri").isNotNull()
    )


def gci_legacy_triples(parsed: DataFrame, gene_map: DataFrame) -> DataFrame:
    """Valid parsed reports → the gene-validity report model as triples
    (graph = the report's root version IRI).

    ``gene_map(gene_curie, gene_iri)`` is the HGNC ``owl:same-as``
    inverse dictionary (gci_legacy.clj:20-22) — broadcast."""
    d = F.col("doc")
    summ = d["scoreJson"]["summary"]
    rdate = summ["FinalClassificationDate"]
    rid = F.concat(
        d["iri"], F.lit("-"), F.regexp_replace(rdate, ":", "")
    )
    report = F.concat(F.lit(GCI_ROOT + "report_"), rid)
    assertion = F.concat(F.lit(GCI_ROOT + "assertion_"), rid)
    prop = F.concat(F.lit(GCI_ROOT + "proposition_"), d["iri"])
    content_b = I.bnode(report, F.lit("content"))
    contrib_b = I.bnode(assertion, F.lit("contrib"))
    agent = F.concat(F.lit(AFFILIATION_ROOT), d["affiliation"]["id"])
    level = F.element_at(_lit_map(EVIDENCE_LEVELS), summ["FinalClassification"])
    sop = _lit_map(SOP_VERSIONS)
    specified = F.element_at(
        sop, F.coalesce(d["selectedSOPVersion"], d["sopVersion"])
    )
    fmt = F.element_at(sop, d["sopVersion"])
    moi = F.concat(
        F.lit("http://purl.obolibrary.org/obo/HP_"),
        F.regexp_extract(d["scoreJson"]["ModeOfInheritance"], r"\(HP:(\d+)\)", 1),
    )
    condition = d["conditions"][0]["iri"]

    base = parsed.where(F.col("gci_valid")).join(
        F.broadcast(gene_map),
        F.col("doc")["genes"][0]["curie"] == F.col("gene_curie"),
        "left",
    )
    core_arr = F.concat(
        F.array(
            # report skeleton (:102-115)
            _t(report, I.RDF_TYPE, ":sepio/GeneValidityReport", True),
            _t(report, ":rdfs/label", d["title"], False, I.XSD_STRING),
            _t(report, ":bfo/has-part", content_b, True),
            _t(report, ":bfo/has-part", assertion, True),
            # JSON content node (:98-100) — original payload bytes
            _t(content_b, I.RDF_TYPE, ":cnt/ContentAsText", True),
            _t(content_b, ":cnt/chars", F.col("raw"), False, I.XSD_STRING),
            # evidence-level assertion (:83-96)
            _t(assertion, I.RDF_TYPE,
               ":sepio/GeneValidityEvidenceLevelAssertion", True),
            _t(assertion, ":sepio/has-subject", prop, True),
            _t(assertion, ":sepio/has-predicate", ":sepio/HasEvidenceLevel",
               True),
            _t(assertion, ":sepio/has-object", level, True),
            _t(assertion, ":sepio/qualified-contribution", contrib_b, True),
            _t(assertion, ":sepio/is-specified-by", specified, True),
            _t(assertion, ":dc/has-format", fmt, True),
            # validity proposition (:19-33)
            _t(prop, I.RDF_TYPE, ":sepio/GeneValidityProposition", True),
            _t(prop, ":sepio/has-subject", F.col("gene_iri"), True),
            _t(prop, ":sepio/has-predicate", ":ro/IsCausalGermlineMutationIn",
               True),
            _t(prop, ":sepio/has-object", condition, True),
            _t(prop, ":sepio/has-qualifier", moi, True),
            # approver contribution (:57-61)
            _t(contrib_b, ":bfo/realizes", ":sepio/ApproverRole", True),
            _t(contrib_b, ":sepio/has-agent", agent, True),
            _t(contrib_b, ":sepio/activity-date", rdate, False, I.XSD_STRING),
        ),
        # secondary contributors (:63-81): one bnode per matching entry
        F.flatten(
            F.transform(
                F.filter(
                    F.coalesce(summ["contributors"], F.array()),
                    lambda c: c["role"] == "secondary contributor",
                ),
                lambda c: F.array(
                    _t(assertion, ":sepio/qualified-contribution",
                       I.bnode(assertion, F.lit("sec"), c["id"]), True),
                    _t(I.bnode(assertion, F.lit("sec"), c["id"]),
                       ":bfo/realizes", ":sepio/SecondaryContributorRole",
                       True),
                    _t(I.bnode(assertion, F.lit("sec"), c["id"]),
                       ":sepio/has-agent",
                       F.concat(F.lit(AFFILIATION_ROOT), c["id"]), True),
                ),
            )
        ),
    )
    out = base.select(
        F.concat(F.lit(GCI_ROOT), d["iri"]).alias("graph"),
        F.explode(core_arr).alias("t"),
    ).select("graph", "t.*")
    # nil-safe model building: unresolved gene / unmapped labels drop
    return out.where(F.col("object").isNotNull())


# ── GCI Express (transform/gci_express.clj) ──────────────────────────

GCI_EXPRESS_ROOT = "http://dataexchange.clinicalgenome.org/gci-express/"

# no No-Known-Disease-Relationship / No-Classification rows in the
# express value set (gci_express.clj:43-53)
EXPRESS_LEVELS = {
    k: v for k, v in EVIDENCE_LEVELS.items()
    if k not in ("No Known Disease Relationship", "No Classification")
}

GCI_EXPRESS_SCHEMA = """
    title string, dateISO8601 string,
    affiliation struct<id: string>,
    scoreJsonSerialized string, scoreJsonSerializedSop5 string,
    genes map<string, struct<curie: string>>,
    conditions struct<MONDO: struct<iri: string>>,
    scores map<string, struct<label: string>>
"""


def gci_express_triples(
    reports: DataFrame, gene_map: DataFrame
) -> DataFrame:
    """GCI Express reports → the gene-validity report model
    (``transform/gci_express.clj``). ``reports`` columns:
    ``report_id`` (the map key of gci_express.clj:77-79) and ``value``
    (the report JSON).

    Express specifics vs the legacy loader: the embedded content is the
    SERIALIZED score JSON — SOP4 when ``scoreJsonSerialized`` is
    non-empty, else the SOP5 field (:10-13, :56-59) — and the
    mode-of-inheritance comes from DOUBLE-ENCODED JSON inside it
    (:23-26, two ``from_json`` passes, the clinvar core.clj pattern);
    the evidence level reads the first score's label (:67-68); the
    report carries a ``dc:source :cg/GeneCurationExpress`` mark (:84)."""
    d = F.from_json(F.col("value"), GCI_EXPRESS_SCHEMA)
    content = F.when(
        F.length(F.coalesce(d["scoreJsonSerialized"], F.lit(""))) > 0,
        d["scoreJsonSerialized"],
    ).otherwise(d["scoreJsonSerializedSop5"])
    sop4 = F.length(F.coalesce(d["scoreJsonSerialized"], F.lit(""))) > 0
    sop_concept = F.when(
        sop4, F.lit(":sepio/ClinGenGeneValidityEvaluationCriteriaSOP4")
    ).otherwise(F.lit(":sepio/ClinGenGeneValidityEvaluationCriteriaSOP5"))
    inner = F.from_json(
        content,
        "data struct<ModeOfInheritance: string>, "
        "scoreJson struct<ModeOfInheritance: string>",
    )
    moi_str = F.coalesce(
        inner["data"]["ModeOfInheritance"],
        inner["scoreJson"]["ModeOfInheritance"],
    )
    moi = F.concat(
        F.lit("http://purl.obolibrary.org/obo/HP_"),
        F.regexp_extract(moi_str, r"\(HP:(\d+)\)", 1),
    )
    rid = F.col("report_id")
    report = F.concat(F.lit(GCI_EXPRESS_ROOT + "report_"), rid)
    assertion = F.concat(F.lit(GCI_EXPRESS_ROOT + "assertion_"), rid)
    prop = F.concat(F.lit(GCI_EXPRESS_ROOT + "proposition_"), rid)
    content_b = I.bnode(report, F.lit("content"))
    contrib_b = I.bnode(assertion, F.lit("contrib"))
    agent = F.concat(F.lit(AFFILIATION_ROOT), d["affiliation"]["id"])
    level = F.element_at(
        _lit_map(EXPRESS_LEVELS),
        F.element_at(F.map_values(d["scores"]), 1)["label"],
    )
    gene_curie = F.element_at(F.map_values(d["genes"]), 1)["curie"]
    base = reports.withColumn("_curie", gene_curie).join(
        F.broadcast(gene_map),
        F.col("_curie") == F.col("gene_curie"), "left",
    )
    arr = F.array(
        _t(report, I.RDF_TYPE, ":sepio/GeneValidityReport", True),
        _t(report, ":rdfs/label", d["title"], False, I.XSD_STRING),
        _t(report, ":bfo/has-part", content_b, True),
        _t(report, ":bfo/has-part", assertion, True),
        _t(report, ":dc/source", ":cg/GeneCurationExpress", True),
        _t(content_b, I.RDF_TYPE, ":cnt/ContentAsText", True),
        _t(content_b, ":cnt/chars", content, False, I.XSD_STRING),
        _t(assertion, I.RDF_TYPE,
           ":sepio/GeneValidityEvidenceLevelAssertion", True),
        _t(assertion, ":sepio/has-subject", prop, True),
        _t(assertion, ":sepio/has-predicate", ":sepio/HasEvidenceLevel",
           True),
        _t(assertion, ":sepio/has-object", level, True),
        _t(assertion, ":sepio/qualified-contribution", contrib_b, True),
        _t(assertion, ":sepio/is-specified-by", sop_concept, True),
        _t(assertion, ":dc/has-format", sop_concept, True),
        _t(prop, I.RDF_TYPE, ":sepio/GeneValidityProposition", True),
        _t(prop, ":sepio/has-subject", F.col("gene_iri"), True),
        _t(prop, ":sepio/has-predicate", ":ro/IsCausalGermlineMutationIn",
           True),
        _t(prop, ":sepio/has-object", d["conditions"]["MONDO"]["iri"], True),
        _t(prop, ":sepio/has-qualifier", moi, True),
        _t(contrib_b, ":bfo/realizes", ":sepio/ApproverRole", True),
        _t(contrib_b, ":sepio/has-agent", agent, True),
        _t(contrib_b, ":sepio/activity-date", d["dateISO8601"], False,
           I.XSD_STRING),
    )
    out = base.select(
        F.concat(F.lit(GCI_EXPRESS_ROOT), rid).alias("graph"),
        F.explode(arr).alias("t"),
    ).select("graph", "t.*")
    return out.where(F.col("object").isNotNull())
