"""Distributed global ranking: a two-stage range-partitioned row number
and the closed-form ranking-window family (ntile / percent_rank)
derived from it.

Net-new relative to the reference (single-node Jena, no shuffle —
SURVEY §4). A global ORDER BY rank in Spark is a single-partition
Window by construction (``Window.orderBy`` with no partitionBy funnels
every row through one task) — fine for dimension tables, fatal at
corpus scale. VERDICT r5 flagged exactly one such plan
(``textstats.vocabulary``); this module is that fix extracted into a
reusable operator so every global-rank consumer shares one
implementation:

  Stage 1  ``repartitionByRange`` on the TOTAL sort order spreads the
           rows over range partitions; each partition sorts
           independently and the local ordinal is read off
           ``monotonically_increasing_id`` (contiguity-checked).
  Stage 2  one stats row per partition → cumulative predecessor
           offsets on the driver (bounded by shuffle partitions, never
           by row count — the pagerank/BPE 1-row-per-partition cost
           model); global rank = offset + local ordinal, attached by a
           broadcast hash join.

The order MUST be total (include a unique tiebreak column): range
boundaries are sampled, so equal sort keys may straddle a boundary and
per-partition numbering would then depend on the layout. With a total
order the global rank is deterministic regardless of where the sampled
boundaries fall. Because the order is total, row_number ≡ rank ≡
dense_rank, which is what licenses the closed forms below.

ntile / percent_rank are row-local functions of (rank, total): SQL
defines ntile's bucket sizes as ``n % k`` buckets of ``ceil(n/k)``
followed by the rest at ``floor(n/k)``, and percent_rank as
``(rank-1)/(n-1)`` — so once the global rank exists, the whole
ranking-window family runs without any single-partition exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_order_alignment(
    stats: list[tuple], order_keys: list[tuple[str, bool]]
) -> None:
    """Spot-check that per-partition id-extreme rows are sort-extreme:
    within each partition the min-id row's key must not exceed the
    max-id row's, and partition p's max-id key must not exceed partition
    p+1's min-id key. ``order_keys`` is [(column_name, descending)].
    Nulls follow Spark defaults (asc → nulls first, desc → nulls last).
    Catches an engine that assigns monotonically_increasing_id before
    the in-partition sort (contiguity alone cannot — see docstring)."""

    def cmp_key(a, b) -> int:
        """-1/0/1 of a vs b in SORT order."""
        for name, desc in order_keys:
            va, vb = a[name], b[name]
            na, nb = int(va is not None), int(vb is not None)
            if na != nb:  # exactly one side null
                null_first = not desc
                lt = (na == 0) if null_first else (nb == 0)
                return -1 if lt else 1
            if na == 0:  # both null
                continue
            if va == vb:
                continue
            lt = (va < vb) if not desc else (va > vb)
            return -1 if lt else 1
        return 0

    prev_hi = None
    for pid, _n, _lo, _hi, rlo, rhi in stats:
        if cmp_key(rlo, rhi) > 0:
            raise RuntimeError(
                "global_row_number order-alignment check failed in "
                f"partition {pid}: the min-id row sorts after the "
                "max-id row — monotonically_increasing_id was not "
                "assigned in sorted row order on this engine"
            )
        if prev_hi is not None and cmp_key(prev_hi, rlo) > 0:
            raise RuntimeError(
                "global_row_number order-alignment check failed at the "
                f"boundary into partition {pid}: range partitions "
                "interleave under the requested order"
            )
        prev_hi = rhi


def global_row_number(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    order_keys: list[tuple[str, bool]] | None = None,
) -> tuple[DataFrame, int]:
    """Add a 1-based global row number under ``order`` (which must be a
    TOTAL order — see module docstring) without a single-partition
    window. Returns ``(df_with_rank, total_rows)``; the rank column is
    a long.

    Cost model: ONE range shuffle + one local sort + one bounded driver
    collect (one row per partition) — the ranked table is never
    shuffled or sorted a second time. The local ordinal comes from
    ``monotonically_increasing_id`` evaluated AFTER
    ``sortWithinPartitions`` (both it and ``spark_partition_id`` are
    non-deterministic expressions, which is exactly what stops Catalyst
    reordering them below the sort); a per-pid window would instead
    force a second full-table hash exchange + sort that the range
    shuffle already paid for. The id's within-partition contiguity —
    the one implementation property the ordinal arithmetic leans on —
    is CHECKED from the same bounded collect and raises if a future
    engine changes it. The OTHER property — ids assigned in SORTED row
    order — is not runtime-checkable without re-sorting and rests on a
    Catalyst invariant (projections containing non-deterministic
    expressions are never reordered below a Sort) on this pinned
    engine; it is pinned empirically by the 16-partition bijection test
    against a single-partition window reference, and any silent
    permutation would hash-mismatch the cross-engine rank oracles the
    driver re-runs every rotation. Note the operator is EAGER: the
    checkpoint + stats collect run at call time, not first action. The
    ``localCheckpoint(eager=True)`` pins partition contents and the
    evaluated ids so the stats pass and the rank pass see identical
    values, without leaving a session-lifetime cache entry behind.
    """
    taken = {"_gr_pid", "_gr_mid", "_gr_off"} & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with "
            "global_row_number's working columns; rename them first"
        )
    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists on the input; "
            "withColumn would silently overwrite it — rename one side"
        )
    parts = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_gr_pid", F.spark_partition_id())
        .withColumn("_gr_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    # Order-alignment spot check (same bounded collect): alongside each
    # partition's id stats, capture the FULL ROW carried by the min and
    # max id (min_by/max_by on the row struct). order_keys — the plain
    # (column_name, descending) rendering of ``order`` that callers may
    # supply — then lets the driver verify that id-extreme rows hold
    # key-extreme values and that partitions don't interleave: ids
    # contiguous-but-assigned-before-the-sort would otherwise mis-rank
    # silently (the contiguity check alone cannot see it).
    stats = sorted(
        (r["_gr_pid"], r["_n"], r["_lo"], r["_hi"], r["_rlo"], r["_rhi"])
        for r in parts.groupBy("_gr_pid")
        .agg(
            F.count("*").alias("_n"),
            F.min("_gr_mid").alias("_lo"),
            F.max("_gr_mid").alias("_hi"),
            F.min_by(F.struct(*df.columns), "_gr_mid").alias("_rlo"),
            F.max_by(F.struct(*df.columns), "_gr_mid").alias("_rhi"),
        )
        .collect()
    )
    if not stats:
        return df.withColumn(rank_col, F.lit(1).cast("long")), 0
    if order_keys:
        _check_order_alignment(stats, order_keys)
    offsets, cum = [], 0
    for pid, n, lo, hi, _rlo, _rhi in stats:
        if hi - lo + 1 != n:
            raise RuntimeError(
                "monotonically_increasing_id is not contiguous within "
                f"partition {pid} ({n} rows span ids {lo}..{hi}); the "
                "ordinal arithmetic in global_row_number is unsafe on "
                "this engine"
            )
        # rank of a row = (mid - lo) + 1 + rows_in_earlier_partitions
        offsets.append((pid, cum - lo + 1))
        cum += n
    # offsets attach via a BROADCAST HASH JOIN, not a literal-map
    # element_at: a literal map is a linear scan per row in the number
    # of partitions (O(rows × partitions) — at a 10k-shuffle-partition
    # deployment that dwarfs the ranking itself), while the broadcast
    # hash probe is O(1) per row. Every _gr_pid has an offsets row by
    # construction (they come from the same grouped pass), so the
    # inner join drops nothing.
    off_df = parts.sparkSession.createDataFrame(
        offsets, "_gr_pid int, _gr_off long"
    )
    out = (
        parts.join(F.broadcast(off_df), "_gr_pid")
        .withColumn(rank_col, (F.col("_gr_mid") + F.col("_gr_off")).cast("long"))
        .drop("_gr_pid", "_gr_mid", "_gr_off")
    )
    return out, cum


def ntile_from_rank(rank: Column, total: int, buckets: int) -> Column:
    """SQL ``ntile(buckets)`` as a row-local expression over a global
    1-based row number: the first ``total % buckets`` buckets hold
    ``total // buckets + 1`` rows, the rest hold ``total // buckets``.
    Matches Spark's / DuckDB's ntile exactly when the ranking order is
    total (no ties). Returns an int column, SQL ntile's type."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    q, r = divmod(total, buckets)
    big = q + 1

    def idiv(num: Column, d: int) -> Column:
        # exact integer division: double `/` + floor misassigns boundary
        # rows once the numerator passes 2^53 (long→double rounding),
        # and this module explicitly targets >2^31-row inputs. Subtract
        # the remainder first so the double division is of an exact
        # multiple, then divide the MULTIPLE COUNT, which is numerator/d
        # — computed as pmod-free long arithmetic via two exact ops.
        num = num.cast("long")
        return ((num - F.pmod(num, F.lit(d))).cast("decimal(20,0)") / F.lit(d)).cast(
            "long"
        )

    first = r * big  # rows living in the (q+1)-sized buckets
    in_big = idiv(rank - 1, big) + 1
    # max(q, 1): when q == 0 every row is in a big bucket, so the
    # otherwise-branch is never taken — the guard only keeps the
    # expression well-formed (no /0) for Spark's analyzer.
    in_small = F.lit(r) + idiv(rank - 1 - first, max(q, 1)) + 1
    return F.when(rank <= first, in_big).otherwise(in_small).cast("int")


def percent_rank_from_rank(rank: Column, total: int) -> Column:
    """SQL ``percent_rank()`` as a row-local expression over a global
    1-based row number: ``(rank - 1) / (total - 1)``, 0.0 for a
    single-row (or empty) frame. Valid when the ranking order is total
    (rank ≡ row_number)."""
    if total <= 1:
        return F.lit(0.0)
    return ((rank - F.lit(1)) / F.lit(float(total - 1))).cast("double")
