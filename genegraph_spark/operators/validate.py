"""Declarative per-root-type validation (SHACL analog) with a
quarantine-with-reason split.

Reference analog: events are validated against SHACL shapes selected by
root type (``src/genegraph/annotate.clj:72-132``,
``src/genegraph/database/validation.clj:8-19``, shapes in
``resources/shapes.edn``); an event failing its shape terminates the
interceptor chain. Here a shape is a list of named column constraints;
failing rows route to a quarantine table carrying the list of violated
constraint names (batch pipelines quarantine rather than abort — the
round-1 quarantine split only caught undecodable pages; this is the
general declarative checker).

Spark-first: each constraint is one boolean column expression; the
violation list is a filtered array of constraint names — a single
narrow projection, zero shuffles, fully codegen'd. No UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named shape constraint: ``check`` must be TRUE for valid rows."""

    name: str
    check: Column


def required(col: str) -> Constraint:
    """sh:minCount 1 analog: non-null and (for strings) non-empty."""
    c = F.col(col)
    return Constraint(f"{col}:required", c.isNotNull() & (c.cast("string") != ""))


def matches(col: str, pattern: str) -> Constraint:
    """sh:pattern analog."""
    return Constraint(f"{col}:pattern", F.col(col).rlike(pattern))


def in_set(col: str, allowed: list) -> Constraint:
    """sh:in analog."""
    return Constraint(f"{col}:in", F.col(col).isin(allowed))


def in_range(col: str, lo=None, hi=None) -> Constraint:
    """sh:minInclusive / sh:maxInclusive analog."""
    c = F.col(col)
    check = F.lit(True)
    if lo is not None:
        check = check & (c >= lo)
    if hi is not None:
        check = check & (c <= hi)
    return Constraint(f"{col}:range", check)


def when_then(name: str, cond: Column, then: Column) -> Constraint:
    """Conditional constraint (implication): rows matching ``cond`` must
    satisfy ``then``."""
    return Constraint(name, ~cond | then)


def with_violations(df: DataFrame, shape: list[Constraint], out_col: str = "violations") -> DataFrame:
    """Append a sorted array of violated constraint names (empty = valid).

    Nulls in a check count as violations (SQL three-valued logic pinned:
    NULL-valued checks are NOT satisfied)."""
    entries = [
        F.when(~c.check.eqNullSafe(F.lit(True)), F.lit(c.name)) for c in shape
    ]
    arr = F.sort_array(
        F.filter(F.array(*entries), lambda x: x.isNotNull())
    )
    return df.withColumn(out_col, arr)


def quarantine_split(
    df: DataFrame, shape: list[Constraint]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): quarantined rows carry ``violations``
    (annotate.clj:128-132 — but quarantine, not chain-abort)."""
    v = with_violations(df, shape)
    valid = v.where(F.size("violations") == 0).drop("violations")
    quarantined = v.where(F.size("violations") > 0)
    return valid, quarantined


def violation_report(df: DataFrame, shape: list[Constraint]) -> DataFrame:
    """(reason, n): corpus-wide violation counts — the data-quality
    dashboard query."""
    v = with_violations(df, shape)
    return (
        v.select(F.explode("violations").alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
    )
