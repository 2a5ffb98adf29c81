"""ClinVar JSON-LD tier (transform/clinvar/jsonld/*.clj) + the
source/graphql/clinvar/ resolver queries run VERBATIM over it."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from genegraph_spark import fixtures as FX
from genegraph_spark.operators.sparql import sparql
from genegraph_spark.sources import clinvar_jsonld as CJ


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def model(spark, events):
    df = CJ.clinvar_jsonld_model(
        spark,
        FX.clinvar_gene_messages(events),
        FX.clinvar_variation_messages(events),
        FX.clinvar_archive_messages(events),
        FX.clinvar_scv_messages(events),
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _triples_of(model, subject):
    return {
        (r.predicate, r.object, r.object_is_iri)
        for r in model.where(F.col("subject") == subject).collect()
    }


class TestGeneTriples:
    def test_versioned_gene_record(self, spark):
        """Hand-derived golden for one gene message
        (jsonld/gene.clj:16-37)."""
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-01-02", "content": {"id": "7",'
                ' "symbol": "SYM7", "full_name": "gene 7 r2",'
                ' "hgnc_id": "HGNC:9007"}}',
            )],
            "value string",
        )
        out = CJ.gene_jsonld_triples(msg)
        ver = CJ.CLINVAR_GENE + "7.2024-01-02"
        got = _triples_of(out, ver)
        assert (CJ.IS_VERSION_OF, CJ.CLINVAR_GENE + "7", True) in got
        assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                CJ.SO_GENE, True) in got
        assert (CJ.SKOS_PREF, "gene 7 r2", False) in got
        assert (CJ.CGTERMS + "hgnc_id", "HGNC:9007", False) in got
        assert (CJ.CGTERMS + "id", "7", False) in got
        # archiver contribution hangs off the versioned record
        contribs = out.where(
            (F.col("subject") == ver)
            & (F.col("predicate") == CJ.QUALIFIED_CONTRIBUTION)
        ).collect()
        assert len(contribs) == 1 and contribs[0].object.startswith("_:")
        cb = _triples_of(out, contribs[0].object)
        assert (CJ.HAS_ROLE, "ArchiverRole", False) in cb
        assert (CJ.HAS_AGENT, CJ.SUBMITTER + "clinvar", True) in cb
        assert (CJ.ACTIVITY_DATE, "2024-01-02", False) in cb


class TestVariationTriples:
    def test_name_lands_twice_and_gene_associations(self, spark):
        """:name reaches the model as BOTH skos:prefLabel and cg:name
        (only :id is dissoc'd, jsonld/variation.clj:37-44); each
        gene_associations object becomes a node carrying cg:gene_id."""
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-02-01", "content": {"id": "4",'
                ' "name": "variant 4 r1", "subclass_type": "Haplotype",'
                ' "variation_type": "Duplication",'
                ' "protein_change": "p.V4L",'
                ' "gene_associations": [{"gene_id": "4"},'
                ' {"gene_id": "11"}]}}',
            )],
            "value string",
        )
        out = CJ.variation_jsonld_triples(msg)
        ver = CJ.CLINVAR_VARIATION + "4.2024-02-01"
        got = _triples_of(out, ver)
        assert (CJ.SKOS_PREF, "variant 4 r1", False) in got
        assert (CJ.CGTERMS + "name", "variant 4 r1", False) in got
        assert (CJ.CGTERMS + "protein_change", "p.V4L", False) in got
        ga_nodes = [
            o for (p, o, _) in got if p == CJ.CGTERMS + "gene_associations"
        ]
        assert len(ga_nodes) == 2
        gids = set()
        for node in ga_nodes:
            node_triples = _triples_of(out, node)
            gids |= {o for (p, o, _) in node_triples
                     if p == CJ.CGTERMS + "gene_id"}
        assert gids == {"4", "11"}

    def test_protein_change_absent_when_null(self, spark):
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-02-01", "content": {"id": "5",'
                ' "name": "v", "subclass_type": "SimpleAllele",'
                ' "variation_type": "Deletion",'
                ' "gene_associations": [{"gene_id": "5"}]}}',
            )],
            "value string",
        )
        out = CJ.variation_jsonld_triples(msg)
        assert out.where(
            F.col("predicate") == CJ.CGTERMS + "protein_change"
        ).count() == 0


class TestArchiveTriples:
    def test_vcv_statement_shape(self, spark):
        """VCV golden (jsonld/variation_archive.clj:28-70): subject is
        the UNVERSIONED variation IRI; has-predicate carries the
        interp description as a literal; has-object is the MONDO IRI
        as a plain string literal."""
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-03-03", "content":'
                ' {"id": "VCV09", "version": "2", "variation_id": "27",'
                ' "interp_description": "Pathogenic",'
                ' "review_status": "practice guideline",'
                ' "date_created": "2024-03-01",'
                ' "date_last_updated": "2024-03-03",'
                ' "num_submitters": "3", "num_submissions": "4",'
                ' "species": "Homo sapiens", "record_status": "current",'
                ' "interp_type": "Clinical significance"}}',
            )],
            "value string",
        )
        out = CJ.archive_jsonld_triples(msg)
        ver = CJ.VA_PREFIX + "VCV09.2024-03-03"
        got = _triples_of(out, ver)
        assert (CJ.HAS_SUBJECT, CJ.CLINVAR_VARIATION + "27", True) in got
        assert (CJ.HAS_PREDICATE, "Pathogenic", False) in got
        assert (
            CJ.HAS_OBJECT,
            "http://purl.obolibrary.org/obo/MONDO_0000001",
            False,
        ) in got
        assert (CJ.IS_VERSION_OF, CJ.VA_PREFIX + "VCV09", True) in got
        assert (CJ.HAS_VERSION, "2", False) in got
        assert (CJ.DATE_MODIFIED, "2024-03-03", False) in got


class TestScvTriples:
    @pytest.fixture(scope="class")
    def one_scv(self, spark):
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-03-02", "content": {"id": "SCV8",'
                ' "version": "1", "variation_id": "8",'
                ' "variation_archive_id": "VCV08", "trait_set_id": "8",'
                ' "submitter_id": "8", "title": "scv title 8",'
                ' "interpretation_description": "Pathogenic",'
                ' "review_status": "reviewed by expert panel",'
                ' "allele_origins": ["germline"],'
                ' "collection_methods": ["clinical testing"],'
                ' "clinical_assertion_trait_set_id": "CATS8",'
                ' "interpretation_date_last_evaluated": "2024-02-20",'
                ' "date_created": "2024-03-01",'
                ' "date_last_updated": "2024-03-02",'
                ' "record_status": "current",'
                ' "assertion_type": "variation to disease"}}',
            )],
            "value string",
        )
        parsed = CJ.parse_scv_messages(msg).withColumn(
            "classification_context", F.lit("GERMLINE_DISEASE")
        )
        return CJ.scv_jsonld_triples(parsed)

    def test_evidence_line_is_unversioned(self, one_scv):
        """The evidence-line IRI carries NO release date while the
        assertion it holds is versioned
        (jsonld/clinical_assertion.clj:130-131)."""
        el = CJ.CGTERMS + "evidence_line/SCV8"
        got = _triples_of(one_scv, el)
        assert (
            CJ.HAS_EVIDENCE_ITEM,
            CJ.CLINVAR_SUBMISSION + "SCV8.2024-03-02",
            True,
        ) in got
        assert (CJ.HAS_EVIDENCE_DIRECTION, "supports", False) in got
        # expert panel → strength 3 (scv map, common.clj:164-173)
        assert (CJ.EVIDENCE_STRENGTH, "3", False) in got

    def test_reverse_link_from_unversioned_vcv(self, one_scv):
        """@reverse sepio:has-evidence-line hangs the line off the
        UNVERSIONED VCV iri — the hop the aggregate-members queries
        walk (clinical_assertion.clj:196-204)."""
        got = _triples_of(one_scv, CJ.VA_PREFIX + "VCV08")
        assert (
            CJ.HAS_EVIDENCE_LINE,
            CJ.CGTERMS + "evidence_line/SCV8",
            True,
        ) in got

    def test_assertion_literals(self, one_scv):
        ver = CJ.CLINVAR_SUBMISSION + "SCV8.2024-03-02"
        got = _triples_of(one_scv, ver)
        # trait-set object + submitted condition are plain literals
        assert (CJ.HAS_OBJECT, CJ.TRAIT_SET + "8", False) in got
        assert (
            CJ.CGTERMS + "submitted_condition",
            CJ.CA_TRAIT_SET + "CATS8",
            False,
        ) in got
        assert (CJ.CGTERMS + "allele_origin", "germline", False) in got
        assert (
            CJ.CGTERMS + "classification_context",
            "GERMLINE_DISEASE",
            False,
        ) in got

    def test_unlisted_review_status_strength_zero(self, spark):
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-03-02", "content": {"id": "SCV9",'
                ' "version": "1", "variation_id": "9",'
                ' "variation_archive_id": "VCV09", "trait_set_id": "9",'
                ' "submitter_id": "9", "title": "t",'
                ' "interpretation_description": "Benign",'
                ' "review_status": "flagged submission",'
                ' "allele_origins": ["germline"],'
                ' "collection_methods": ["clinical testing"],'
                ' "clinical_assertion_trait_set_id": "CATS9",'
                ' "interpretation_date_last_evaluated": "2024-02-20",'
                ' "date_created": "2024-03-01",'
                ' "date_last_updated": "2024-03-02",'
                ' "record_status": "current",'
                ' "assertion_type": "variation to disease"}}',
            )],
            "value string",
        )
        parsed = CJ.parse_scv_messages(msg).withColumn(
            "classification_context", F.lit("OTHER")
        )
        out = CJ.scv_jsonld_triples(parsed)
        got = _triples_of(out, CJ.CGTERMS + "evidence_line/SCV9")
        assert (CJ.EVIDENCE_STRENGTH, "0", False) in got


class TestClassificationContext:
    """compute-clingen-classification-context rule order
    (jsonld/clinical_assertion.clj:83-125) over hand-built frames."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        genes = spark.createDataFrame(
            [
                # gene 1: cancer-list id as-of 02-01, non-cancer after
                ("1", "2024-01-01", "HGNC:1100"),
                ("1", "2024-02-05", "HGNC:9999"),
                ("2", "2024-01-01", "HGNC:8888"),
            ],
            "gene_id string, gene_release_date string, hgnc_id string",
        )
        variations = spark.createDataFrame(
            [
                ("10", "2024-02-01", "1"),
                ("10", "2024-02-04", "1"),  # later variant picks later gene
                ("11", "2024-02-01", "2"),
            ],
            "variation_id string, variant_release_date string,"
            " gene_id string",
        )
        return genes, variations

    def _run(self, spark, frames, scv_rows):
        genes, variations = frames
        scvs = spark.createDataFrame(
            scv_rows,
            "id string, release_date string, variation_id string,"
            " allele_origins array<string>,"
            " interpretation_description string, review_status string",
        )
        out = CJ.classification_context(
            scvs, variations, genes,
            CJ.cancer_gene_ids(spark), CJ.clinsig_group_map(spark),
        )
        return {r.id: r.classification_context for r in out.collect()}

    def test_somatic_cancer_needs_asof_cancer_gene(self, spark, frames):
        rows = [
            # as-of 02-02 → variant version 02-01 → gene version 01-01
            # (HGNC:1100, cancer) → SOMATIC_CANCER
            ("S1", "2024-02-02", "10", ["somatic"], "Pathogenic",
             "no assertion provided"),
            # as-of 02-09 → variant 02-04 → gene 02-05? NO: gene must be
            # <= the VARIANT date (02-04) → still HGNC:1100 → cancer
            ("S2", "2024-02-09", "10", ["somatic"], "Pathogenic",
             "no assertion provided"),
            # non-cancer gene → falls through to GERMLINE (path group)
            ("S3", "2024-02-02", "11", ["somatic"], "Pathogenic",
             "no assertion provided"),
            # mixed origins → not exclusively somatic
            ("S4", "2024-02-02", "10", ["somatic", "germline"],
             "Pathogenic", "no assertion provided"),
            # risk factor excluded from the somatic rule but its
            # clinsig-map group is 'path' → GERMLINE_DISEASE
            ("S5", "2024-02-02", "10", ["somatic"], "risk factor",
             "no assertion provided"),
        ]
        got = self._run(spark, frames, rows)
        assert got["S1"] == "SOMATIC_CANCER"
        assert got["S2"] == "SOMATIC_CANCER"
        assert got["S3"] == "GERMLINE_DISEASE"
        assert got["S4"] == "GERMLINE_DISEASE"
        assert got["S5"] == "GERMLINE_DISEASE"

    def test_pharma_and_other(self, spark, frames):
        rows = [
            # somatic + cancer gene + drug response → SOMATIC_CANCER
            # (rule order: the somatic rule fires first)
            ("P1", "2024-02-02", "10", ["somatic"], "drug response",
             "no assertion provided"),
            ("P2", "2024-02-02", "11", ["germline"], "drug response",
             "no assertion provided"),
            # association (group 'assoc'), weak review → OTHER
            ("P3", "2024-02-02", "11", ["germline"], "association",
             "criteria provided, single submitter"),
            # association but expert panel review → GERMLINE_DISEASE
            ("P4", "2024-02-02", "11", ["germline"], "association",
             "reviewed by expert panel"),
            # unknown term → clinsig-map miss → no group → OTHER
            ("P5", "2024-02-02", "11", ["germline"], "WEIRD_TERM",
             "no assertion provided"),
        ]
        got = self._run(spark, frames, rows)
        assert got["P1"] == "SOMATIC_CANCER"
        assert got["P2"] == "PHARMACOGENOMIC"
        assert got["P3"] == "OTHER"
        assert got["P4"] == "GERMLINE_DISEASE"
        assert got["P5"] == "OTHER"


class TestResolverQueriesVerbatim:
    """The source/graphql/clinvar/ embedded SPARQL executes unmodified
    over the jsonld-tier model."""

    def test_aggregate_latest_matches_relational(self, spark, model, events):
        q = """
PREFIX dc: <http://purl.org/dc/terms/>
PREFIX sepio: <http://purl.obolibrary.org/obo/SEPIO_>
PREFIX cg: <http://dataexchange.clinicalgenome.org/terms/>
SELECT ?iri ?id ?subject ?release_date ?max_release_date
WHERE {
  {
    SELECT ?id (max(?release_date) AS ?max_release_date)
    WHERE {
      ?subiri a cg:AggregateVariantClinicalSignificanceAssertion ;
              dc:isVersionOf ?id ;
              cg:release_date ?release_date .
    }
    GROUP BY ?id
  }
  ?iri dc:isVersionOf ?id ;
       sepio:0000388 ?subject ; #:sepio/has-subject
       cg:release_date ?release_date .
  FILTER(?release_date = ?max_release_date)
}"""
        got = sparql(model, q)
        # relational replica: one row per VCV id at its max date
        arch = (
            events.where(F.col("event_id") % 3 == 0)
            .select(
                (F.col("user_id") % 40).alias("aid"),
                ((F.col("event_id") / 3).cast("long") % 3).alias("v"),
            )
            .distinct()
            .groupBy("aid")
            .agg(F.max(F.col("v") * 2 + 1).alias("d"))
        )
        expected = arch.count()
        assert got.count() == expected
        # every returned release date equals its max
        assert got.where(
            F.col("release_date") != F.col("max_release_date")
        ).count() == 0

    def test_members_timeseries_asof(self, spark, model):
        """Per VCV version: only SCV versions <= the VCV date survive,
        and only the latest such version per assertion id
        (aggregate-members-timeseries, aggregate_assertion.clj:204-239
        — the correlated-NOT-EXISTS as-of)."""
        q = """
PREFIX dc: <http://purl.org/dc/terms/>
PREFIX cg: <http://dataexchange.clinicalgenome.org/terms/>
PREFIX sepio: <http://purl.obolibrary.org/obo/SEPIO_>
SELECT ?evidence_item_iri ?evidence_item_assertion_id
       ?evidence_item_assertion_release_date ?vcv_iri ?r_vcv_id
       ?vcv_release_date
WHERE {
  ?vcv_iri a cg:AggregateVariantClinicalSignificanceAssertion .
  ?vcv_iri dc:isVersionOf ?r_vcv_id .
  ?vcv_iri cg:release_date ?vcv_release_date .
  ?r_vcv_id sepio:0000006 ?evidence_line_iri .
  ?evidence_line_iri sepio:0000084 ?evidence_item_iri .
  ?evidence_item_iri dc:isVersionOf ?evidence_item_assertion_id .
  ?evidence_item_iri cg:release_date ?evidence_item_assertion_release_date .
  FILTER(?evidence_item_assertion_release_date <= ?vcv_release_date)
  FILTER NOT EXISTS {
    ?other_evidence_item_iri_version dc:isVersionOf ?evidence_item_assertion_id .
    ?other_evidence_item_iri_version cg:release_date ?other_evidence_item_release_date .
    FILTER(?other_evidence_item_release_date <= ?vcv_release_date)
    FILTER(?other_evidence_item_release_date > ?evidence_item_assertion_release_date)
  }
}"""
        got = sparql(model, q).collect()
        assert got
        for r in got:
            assert r.evidence_item_assertion_release_date <= r.vcv_release_date
        # at most one evidence item version per (vcv version, assertion)
        keys = [(r.vcv_iri, r.evidence_item_assertion_id) for r in got]
        assert len(keys) == len(set(keys))

    def test_variant_genes_latest_only(self, spark, model):
        """variant-genes (variant.clj:63-99): every returned gene row
        is that gene's LATEST version."""
        q = """
PREFIX dc: <http://purl.org/dc/terms/>
PREFIX cg: <http://dataexchange.clinicalgenome.org/terms/>
PREFIX sepio: <http://purl.obolibrary.org/obo/SEPIO_>
PREFIX so: <http://purl.obolibrary.org/obo/SO_>
SELECT ?gene_iri ?gene_id ?gene_release_date ?s
WHERE {
  ?s a cg:Variant .
  ?s cg:gene_associations ?gene_association_iri .
  ?s cg:release_date ?variant_release_date .
  ?gene_association_iri cg:gene_id ?gene_id .
  {
    SELECT ?gene_id (MAX(?gene_release_date) AS ?max_gene_release_date) WHERE {
      ?g a so:0000704 .
      ?g a cg:ClinVarObject .
      ?g cg:release_date ?gene_release_date .
      ?g cg:id ?gene_id .
    }
    GROUP BY ?gene_id
  }
  {
    SELECT ?gene_iri ?gene_id ?gene_release_date WHERE {
      ?gene_iri a so:0000704 .
      ?gene_iri a cg:ClinVarObject .
      ?gene_iri cg:release_date ?gene_release_date .
      ?gene_iri cg:id ?gene_id .
    }
  }
  FILTER(?gene_release_date = ?max_gene_release_date)
}"""
        got = sparql(model, q)
        n = got.count()
        assert n > 0
        # per gene id a single (latest) release date appears
        per_gene = got.groupBy("gene_id").agg(
            F.countDistinct("gene_release_date").alias("n")
        )
        assert per_gene.where(F.col("n") > 1).count() == 0


class TestSubmissionTriples:
    def test_assertion_set_record(self, spark):
        """jsonld/submission.clj:14-28 — versioned AssertionSet with the
        whole message merged under @vocab (id/release_date included)."""
        msg = spark.createDataFrame(
            [(
                '{"release_date": "2024-04-01", "content": {"id": "SUB3",'
                ' "submission_date": "2024-03-23", "submitter_id": "3"}}',
            )],
            "value string",
        )
        out = CJ.submission_jsonld_triples(msg)
        ver = CJ.SUBMISSION + "SUB3.2024-04-01"
        got = _triples_of(out, ver)
        assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                CJ.CGTERMS + "AssertionSet", True) in got
        assert (CJ.CGTERMS + "id", "SUB3", False) in got
        assert (CJ.CGTERMS + "release_date", "2024-04-01", False) in got
        assert (CJ.CGTERMS + "submission_date", "2024-03-23", False) in got
        assert (CJ.CGTERMS + "submitter_id", "3", False) in got
