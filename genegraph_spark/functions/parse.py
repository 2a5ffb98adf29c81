"""Complex struct-returning parsers: genomic-coordinate-style template
parse/unparse as a vectorized pandas UDF.

Reference analogs: the CNV template parser/unparser round-trip
(``src/genegraph/annotate/cnv.clj:15-96`` — spec'd regex template →
typed map, with unparse as the inverse) and the HGVS expression parser
(``src/genegraph/transform/clinvar/hgvs.clj:21-74``). These are the
reference's "parser returning a structured record" family; in Spark the
idiomatic shape is an Arrow-batched pandas UDF returning a struct
column (simple extractions stay JVM-side via regexp_extract — the UDF
exists for parsers with branching/validation that SQL regex can't
express cleanly).

Template (cnv.clj:20 analog):  ``{assembly} chr{chr}:{start}-{end} {svtype}``
e.g. ``GRCh38 chr7:117480025-117668665 DEL``.
Malformed inputs yield a null struct (callers quarantine, matching the
unparsable-CNV fixture corpus ``test-events-cnv-unparsable.edn``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CNV_STRUCT = StructType(
    [
        StructField("assembly", StringType()),
        StructField("chrom", StringType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("svtype", StringType()),
    ]
)

_CNV_RE = re.compile(
    r"^(?P<assembly>GRCh3[78]|NCBI36) chr(?P<chrom>[0-9]{1,2}|[XYM]):"
    r"(?P<start>[0-9]+)-(?P<end>[0-9]+) (?P<svtype>DEL|DUP|INS|INV)$"
)


def parse_cnv_py(s: str | None):
    """Pure-Python single-value parser (unit-testable; the UDF vectorizes
    it). Returns dict or None; rejects end < start (validation beyond
    what one regex pass expresses)."""
    if s is None:
        return None
    m = _CNV_RE.match(s)
    if not m:
        return None
    start, end = int(m["start"]), int(m["end"])
    if end < start:
        return None
    return {
        "assembly": m["assembly"],
        "chrom": m["chrom"],
        "start": start,
        "end": end,
        "svtype": m["svtype"],
    }


def unparse_cnv_py(d) -> str | None:
    """Inverse template (cnv.clj unparse): parse(unparse(x)) == x."""
    if d is None or d.get("assembly") is None:
        return None
    return f"{d['assembly']} chr{d['chrom']}:{d['start']}-{d['end']} {d['svtype']}"


@pandas_udf(CNV_STRUCT)
def parse_cnv(s: pd.Series) -> pd.DataFrame:
    parsed = s.map(parse_cnv_py)
    cols = ["assembly", "chrom", "start", "end", "svtype"]
    return pd.DataFrame(
        {c: parsed.map(lambda d, c=c: None if d is None else d[c]) for c in cols}
    )


def unparse_cnv(struct_col: Column) -> Column:
    """JVM-side inverse (a concat — no Python needed on the way out)."""
    return F.when(
        struct_col.isNotNull() & struct_col["assembly"].isNotNull(),
        F.concat(
            struct_col["assembly"],
            F.lit(" chr"),
            struct_col["chrom"],
            F.lit(":"),
            struct_col["start"].cast("string"),
            F.lit("-"),
            struct_col["end"].cast("string"),
            F.lit(" "),
            struct_col["svtype"],
        ),
    )
