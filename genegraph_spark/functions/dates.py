"""Date/time fixup: repair malformed timezone offsets, then parse.

Reference analog: ``src/genegraph/transform/dosage_jira.clj:93-109`` —
JIRA emits ISO-ish timestamps with a colon-less zone offset
(``2024-01-15T10:30:00.000+0000``) that ``OffsetDateTime/parse``
rejects; the reference splices the colon in before parsing. Same repair
here as one JVM-side regexp + ``to_timestamp`` (no UDF). Dates that the
store *compares* stay ISO strings compared lexicographically
(``transform/clinvar/common.clj:216-218``) — parsing is for event-side
arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_MILLIS_OFFSET = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def fix_offset_colon(ts_col: Column) -> Column:
    """``...+0000`` → ``...+00:00`` (only when the colon is missing)."""
    return F.regexp_replace(ts_col, r"([+-][0-9]{2})([0-9]{2})$", r"$1:$2")


def parse_offset_ts(ts_col: Column) -> Column:
    """Repair + parse to timestamp (session timezone applies)."""
    return F.to_timestamp(fix_offset_colon(ts_col), ISO_MILLIS_OFFSET)
