"""Versioned-entity idioms: latest-as-of, version chains, tombstone
compaction.

These re-express the single most important query idiom in the reference
(SURVEY §2.3): ``ORDER BY DESC(?release_date) LIMIT 1`` per unversioned
key (``src/genegraph/transform/clinvar/common.clj:209-258``), the RocksDB
prefix-scan + take-last (``clinical_assertion.clj:612-627``), the
version-head compaction with tombstone filtering
(``transform/clinvar/ga4gh.clj:170-190``), and the predecessor chain that
emits ``dc:replaces`` / ``dc:isReplacedBy``
(``common.clj:235-272`` ``mark-prior-replaced``).

Spark-first: every one is a window over ``partitionBy(key)`` — a single
shuffle on the key, map-side safe, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_version(df: DataFrame, key: str, version: str) -> DataFrame:
    """Top-1-per-key: the newest version of each entity."""
    w = Window.partitionBy(key).orderBy(F.desc(version))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def latest_as_of(df: DataFrame, key: str, version: str, cutoff: Column | str) -> DataFrame:
    """Max version ≤ cutoff per key (the as-of join half).

    The reference compares ISO-date strings lexicographically
    (``common.clj:216-218``); we accept any orderable column.
    """
    cutoff_col = F.lit(cutoff) if isinstance(cutoff, str) else cutoff
    return latest_version(df.where(F.col(version) <= cutoff_col), key, version)


def compact_heads(df: DataFrame, key: str, version: str, deleted: str = "tombstone") -> DataFrame:
    """Version-history compaction: keep the newest version per key, then
    drop keys whose head is a tombstone (ga4gh.clj:170-190 semantics)."""
    return latest_version(df, key, version).where(~F.col(deleted))


def version_chain(df: DataFrame, key: str, version: str, id_col: str) -> DataFrame:
    """Predecessor links: (id, replaces, is_replaced_by) per version row
    via lag/lead — the ``mark-prior-replaced`` self as-of join without a
    second scan."""
    w = Window.partitionBy(key).orderBy(version)
    return df.select(
        key,
        version,
        F.col(id_col).alias("id"),
        F.lag(id_col).over(w).alias("replaces"),
        F.lead(id_col).over(w).alias("is_replaced_by"),
    )
