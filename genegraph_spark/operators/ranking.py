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


def global_row_number(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
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
    taken = {"_gr_pid", "_gr_mid"} & set(df.columns)
    if taken:
        raise ValueError(
            f"input columns {sorted(taken)} collide with "
            "global_row_number's working columns; rename them first"
        )
    parts = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_gr_pid", F.spark_partition_id())
        .withColumn("_gr_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    stats = sorted(
        (r["_gr_pid"], r["_n"], r["_lo"], r["_hi"])
        for r in parts.groupBy("_gr_pid")
        .agg(
            F.count("*").alias("_n"),
            F.min("_gr_mid").alias("_lo"),
            F.max("_gr_mid").alias("_hi"),
        )
        .collect()
    )
    if not stats:
        return df.withColumn(rank_col, F.lit(1).cast("long")), 0
    offsets, cum = [], 0
    for pid, n, lo, hi in stats:
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
    first = r * big  # rows living in the (q+1)-sized buckets
    in_big = F.floor((rank - 1) / F.lit(big)) + 1
    # max(q, 1): when q == 0 every row is in a big bucket, so the
    # otherwise-branch is never taken — the guard only keeps the
    # expression well-formed (no /0) for Spark's analyzer.
    in_small = F.lit(r) + F.floor((rank - 1 - first) / F.lit(max(q, 1))) + 1
    return F.when(rank <= first, in_big).otherwise(in_small).cast("int")


def percent_rank_from_rank(rank: Column, total: int) -> Column:
    """SQL ``percent_rank()`` as a row-local expression over a global
    1-based row number: ``(rank - 1) / (total - 1)``, 0.0 for a
    single-row (or empty) frame. Valid when the ranking order is total
    (rank ≡ row_number)."""
    if total <= 1:
        return F.lit(0.0)
    return ((rank - F.lit(1)) / F.lit(float(total - 1))).cast("double")
