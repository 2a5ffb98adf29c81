"""ClinVar variation canonical-expression selection.

Re-expresses ``transform/clinvar/variation.clj:36-106``
(``prioritized-variation-expressions-all`` +
``get-spdi/hgvs-sequence-accession``): from a clinvar-raw variation
message whose nested ``content`` JSON carries ``CanonicalSPDI``,
``HGVSlist.HGVS`` (per-assembly nucleotide expressions) and
``Location.SequenceLocation`` entries, emit every available canonical
expression in priority order — SPDI, then GRCh38 HGVS, then GRCh37
HGVS, then the ``clinvar:<id>`` Text-VRS fallback — each joined to its
sequence location by accession.

Spark-first shape: ONE ``from_json`` on a fixed nested schema, then
pure array/struct column expressions (``F.filter`` / ``element_at`` /
``explode``) — no Python in the row path, whole-stage codegen end to
end, deterministic for the DuckDB oracle. The reference walks the same
nested map per event in Clojure (``letfn get-hgvs/get-spdi/
get-sequence-location``); here the per-candidate closure becomes a
literal 4-element candidate array filtered to the non-null entries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StructField,
    StructType,
    StringType,
)

# the nested .content.content map (already a parsed-JSON string column
# here; the double-decode itself is sources/payload.parse_nested_content)
NESTED_CONTENT_SCHEMA = StructType(
    [
        StructField(
            "CanonicalSPDI", StructType([StructField("$", StringType())])
        ),
        StructField(
            "HGVSlist",
            StructType(
                [
                    StructField(
                        "HGVS",
                        ArrayType(
                            StructType(
                                [
                                    StructField(
                                        "NucleotideExpression",
                                        StructType(
                                            [
                                                StructField(
                                                    "@Assembly", StringType()
                                                ),
                                                StructField(
                                                    "Expression",
                                                    StructType(
                                                        [
                                                            StructField(
                                                                "$",
                                                                StringType(),
                                                            )
                                                        ]
                                                    ),
                                                ),
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        StructField(
            "Location",
            StructType(
                [
                    StructField(
                        "SequenceLocation",
                        ArrayType(
                            StructType(
                                [
                                    StructField("@Accession", StringType()),
                                    StructField("@start", StringType()),
                                    StructField("@stop", StringType()),
                                    StructField(
                                        "@variantLength", StringType()
                                    ),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

# variation.clj:36-41 — the accession is the `<prefix>_<id>.<version>`
# head of a SPDI or HGVS expression (same regex for both)
_ACCESSION_RE = r"^([a-zA-Z]+_[a-zA-Z0-9]+\.[a-zA-Z0-9]+):"


def _hgvs_for_assembly(hgvs_list: Column, assembly: str) -> Column:
    """First expression for the assembly (the reference warns on >1 and
    takes the first — variation.clj:58-67)."""
    matched = F.filter(
        hgvs_list,
        lambda h: h["NucleotideExpression"]["@Assembly"] == assembly,
    )
    # try_element_at: an absent assembly is an empty array, not an error
    return F.try_element_at(matched, F.lit(1))[
        "NucleotideExpression"
    ]["Expression"]["$"]


def prioritized_expressions(
    df: DataFrame, id_col: str = "variation_id", content_col: str = "content"
) -> DataFrame:
    """All available canonical expressions per variation, priority-ranked
    (rank 1 = SPDI ... 4 = Text fallback), each with its accession and
    sequence location. One row per (variation, present candidate)."""
    c = F.from_json(F.col(content_col), NESTED_CONTENT_SCHEMA)
    d = df.withColumn("_c", c)
    spdi = F.col("_c")["CanonicalSPDI"]["$"]
    hgvs = F.col("_c")["HGVSlist"]["HGVS"]
    cand = F.array(
        F.struct(
            F.lit(1).alias("rank"),
            spdi.alias("expr"),
            F.lit("spdi").alias("expr_type"),
            F.lit("SPDI").alias("label"),
        ),
        F.struct(
            F.lit(2).alias("rank"),
            _hgvs_for_assembly(hgvs, "GRCh38").alias("expr"),
            F.lit("hgvs").alias("expr_type"),
            F.lit("GRCh38").alias("label"),
        ),
        F.struct(
            F.lit(3).alias("rank"),
            _hgvs_for_assembly(hgvs, "GRCh37").alias("expr"),
            F.lit("hgvs").alias("expr_type"),
            F.lit("GRCh37").alias("label"),
        ),
        F.struct(
            F.lit(4).alias("rank"),
            F.concat(F.lit("clinvar:"), F.col(id_col).cast("string")).alias(
                "expr"
            ),
            F.lit("text").alias("expr_type"),
            F.lit("Text").alias("label"),
        ),
    )
    d = d.withColumn(
        "_cand", F.explode(F.filter(cand, lambda x: x["expr"].isNotNull()))
    )
    accession = F.when(
        F.col("_cand.expr_type") != "text",
        F.nullif(
            F.regexp_extract(F.col("_cand.expr"), _ACCESSION_RE, 1), F.lit("")
        ),
    )
    d = d.withColumn("_acc", accession)
    loc = F.try_element_at(
        F.filter(
            F.col("_c")["Location"]["SequenceLocation"],
            lambda s: s["@Accession"] == F.col("_acc"),
        ),
        F.lit(1),
    )
    return d.select(
        F.col(id_col),
        F.col("_cand.rank").alias("rank"),
        F.col("_cand.expr").alias("expr"),
        F.col("_cand.expr_type").alias("expr_type"),
        F.col("_cand.label").alias("label"),
        F.col("_acc").alias("accession"),
        loc["@start"].alias("loc_start"),
        loc["@stop"].alias("loc_stop"),
        loc["@variantLength"].cast("long").alias("variant_length"),
    )
