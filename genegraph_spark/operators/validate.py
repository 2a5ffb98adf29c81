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


def violation_array(shape: list[Constraint]) -> Column:
    """Sorted array of violated constraint names (empty = valid) as one
    column expression. Nulls in a check count as violations (SQL
    three-valued logic pinned: NULL-valued checks are NOT satisfied)."""
    entries = [
        F.when(~c.check.eqNullSafe(F.lit(True)), F.lit(c.name)) for c in shape
    ]
    return F.sort_array(F.filter(F.array(*entries), lambda x: x.isNotNull()))


def with_violations(df: DataFrame, shape: list[Constraint], out_col: str = "violations") -> DataFrame:
    """Append the :func:`violation_array` of ``shape``."""
    return df.withColumn(out_col, violation_array(shape))


# -- per-root-type shape registry + dispatch ----------------------------------

# formats.edn analog (annotate.clj:19,30-36 add-metadata): source format →
# root type + graph-name rule. The pipeline's page events carry one format;
# the tombstone action is inferred per row (annotate/action.clj analog).
FORMATS: dict[str, dict[str, str]] = {
    "webpage": {"root_type": "WebPage", "graph_name": "url"},
    "webpage-tombstone": {"root_type": "TombstonePage", "graph_name": "url"},
}


@dataclass(frozen=True)
class ShapeRegistry:
    """Root-type → shape table (shapes.edn analog, annotate.clj:72-132
    add-validation-shape/add-validation): a row is validated against the
    shape registered for ITS root type; rows of unregistered types get a
    ``root_type:unregistered`` violation (the reference terminates events
    whose type has no transform/shape registration).

    ``dispatch`` compiles the whole table into ONE chained CASE
    projection — per-row shape selection costs no join, no shuffle, and
    stays inside whole-stage codegen."""

    shapes: dict[str, list[Constraint]]

    def dispatch(
        self, df: DataFrame, root_type_col: str = "root_type", out_col: str = "violations"
    ) -> DataFrame:
        expr = None
        for rt, shape in sorted(self.shapes.items()):
            cond = F.col(root_type_col) == rt
            arr = violation_array(shape)
            expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
        fallback = F.array(F.lit("root_type:unregistered"))
        expr = fallback if expr is None else expr.otherwise(fallback)
        return df.withColumn(out_col, expr)


def page_shape_registry() -> ShapeRegistry:
    """The pipeline's default registry over post-extraction slim rows:
    WebPages must be decodable with a language tag; tombstones skip the
    content constraints (their payload is the unpublish marker)."""
    common = [matches("url", "^https://"), in_range("version", 1, 3)]
    web = [Constraint("html:decodable", F.col("ok")), required("lang"), *common]
    return ShapeRegistry({"WebPage": web, "TombstonePage": list(common)})


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
