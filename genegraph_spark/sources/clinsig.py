"""ClinVar clinical-significance normalization.

The reference loads two CSV resources and normalizes raw SCV
clinical-significance strings through them
(``transform/clinvar/common.clj:84-140``): lowercase the raw term, map
it through ``clinvar_clinsig_normalized.csv`` (scv_term → normalized
code + display label), resolve the code's class row in
``clinvar_clinsig_classes.csv`` (significance tier, proposition type,
sort orders), and fall back to "other" for unknown terms
(``normalize-clinvar-clinsig``, common.clj:138-140).

Spark-first shape: both CSVs are dictionary-scale (≤60 rows) —
read once, broadcast-joined against the corpus column. The fallback is
a left join + coalesce against the "oth"/"other" class row, so unknown
terms never drop rows (the reference returns "other" for them). No
UDFs anywhere; a 100 TB assertion table pays one broadcast hash join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REF_RESOURCES = "/root/reference/resources"


def clinsig_tables(
    spark, resources_dir: str = REF_RESOURCES
) -> tuple[DataFrame, DataFrame]:
    """(normalized, classes) dictionary frames from the reference CSVs
    (``load-csv-resource``, common.clj:74-89). Raises FileNotFoundError
    when the resource dir is absent (callers skip/degrade)."""
    npath = os.path.join(resources_dir, "clinvar_clinsig_normalized.csv")
    cpath = os.path.join(resources_dir, "clinvar_clinsig_classes.csv")
    for p in (npath, cpath):
        if not os.path.exists(p):
            raise FileNotFoundError(p)
    normalized = spark.read.csv(npath, header=True, quote='"', escape='"')
    classes = spark.read.csv(cpath, header=True, quote='"', escape='"')
    return normalized, classes


def normalize_clinsig(
    df: DataFrame,
    clinsig_col: str,
    normalized: DataFrame,
    classes: DataFrame,
) -> DataFrame:
    """Append ``clinsig_code`` / ``clinsig_label`` / ``significance`` /
    ``prop_type`` columns for the raw term in ``clinsig_col``.

    Semantics mirror ``normalize-clinsig-codes-map`` +
    ``clinsig-class-map`` + the "other" fallback (common.clj:96-140):
    the raw term lowercases before lookup; unknown terms take the
    ``oth`` class row."""
    lookup = (
        normalized.select(
            F.col("scv_term").alias("_term"),
            F.col("normalized").alias("_code"),
            F.col("label").alias("_label"),
        )
        .join(
            classes.select(
                F.col("code").alias("_code"),
                F.col("significance").cast("int").alias("_significance"),
                F.col("clinvar_prop_type").alias("_prop_type"),
            ),
            "_code",
            "left_outer",
        )
    )
    fallback = classes.where(F.col("code") == "oth").select(
        F.lit("oth").alias("_fb_code"),
        F.col("label").alias("_fb_label"),
        F.col("significance").cast("int").alias("_fb_significance"),
        F.col("clinvar_prop_type").alias("_fb_prop_type"),
    )
    out = (
        df.withColumn("_term", F.lower(F.col(clinsig_col)))
        .join(F.broadcast(lookup), "_term", "left_outer")
        .crossJoin(F.broadcast(fallback))
    )
    return out.select(
        *df.columns,
        F.coalesce("_code", "_fb_code").alias("clinsig_code"),
        F.coalesce("_label", "_fb_label").alias("clinsig_label"),
        F.coalesce("_significance", "_fb_significance").alias("significance"),
        F.coalesce("_prop_type", "_fb_prop_type").alias("prop_type"),
    )
