"""Global contiguous row numbering without a global window.

The naive ``row_number() OVER (ORDER BY ...)`` plans a SINGLE-partition
window — the classic scale-killer this repo's Top-N rewrite already
eliminates for bounded n. For UNBOUNDED global ids (sample indexing,
shard-stable example numbering, join surrogate keys) the scale-safe shape
is:

1. range-repartition + sort by the (TOTAL) order key — the one exchange
   any global ordering costs;
2. per-partition local rank (a window PARTITIONED by partition id — every
   task ranks only its own slice);
3. per-partition row counts collected to the driver (bounded by the
   partition count, never by rows) and prefix-summed into offsets;
4. id = offset[partition] + local rank.

Because the order key is required to be a total order, the resulting ids
are the global ORDER BY rank exactly — independent of where the range
boundaries fall — so the output is deterministic under any partition
count, retry, or cluster size (property-tested, and oracle-verified
against DuckDB's row_number in the `global_row_number` entry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def contiguous_row_ids(
    df: DataFrame,
    order_cols: list[Column | str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col``: the 1-based global rank of each row under
    ``order_cols`` — which MUST be a total order (ties would make ids
    boundary-dependent; append a unique key as the last column).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # materialize the ranged layout ONCE: the counts collect and the main
    # query must see the SAME boundary sampling (and the exchange is paid
    # once, not per consumer)
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
    )
    pid = ranged.withColumn("__pid", F.spark_partition_id())
    # bounded collect: one row per partition
    counts = {
        r["__pid"]: r["cnt"]
        for r in pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        pid.withColumn(id_col, (off + F.row_number().over(w)).cast("bigint"))
        .drop("__pid")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "run_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col``: the INCLUSIVE global running sum of ``value_col``
    under the total order ``order_cols`` — the same range-exchange +
    per-partition-window + driver-prefix-sum shape as
    :func:`contiguous_row_ids` (a global ``sum() OVER (ORDER BY ...)``
    window is a single-partition scale-killer; this is its distributed
    form). The per-partition OFFSETS collect is bounded by the partition
    count, never by rows. ``order_cols`` must be a total order (append a
    unique key); the explicit ROWS frame makes the window exact even if a
    caller violates that, and determinism then still holds because RANGE
    vs ROWS only differ under ties.

    NULL semantics (pinned, ADVICE r7): exactly SQL
    ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` —
    ``out_col`` is NULL until the first non-NULL value in the GLOBAL
    prefix, after which NULLs contribute 0. Invariant under
    ``num_partitions``: the per-partition totals are coalesced to 0 for
    the offset arithmetic (an all-NULL partition never poisons the
    driver prefix loop) and a parallel non-NULL COUNT prefix decides
    the NULL-vs-0 head, so partition boundaries never show through."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
    )
    pid = ranged.withColumn("__pid", F.spark_partition_id())
    stats = {
        r["__pid"]: (r["s"], r["c"])
        for r in pid.groupBy("__pid")
        .agg(
            # coalesce: an all-NULL partition sums to NULL, which would
            # raise TypeError in the prefix loop below (ADVICE r7)
            F.coalesce(F.sum(F.col(value_col).cast("bigint")), F.lit(0)).alias("s"),
            F.count(value_col).alias("c"),  # non-NULL count for the head rule
        )
        .collect()
    }
    offsets, acc, acc_c = {}, 0, 0
    for p in sorted(stats):
        offsets[p] = (acc, acc_c)
        acc += stats[p][0]
        acc_c += stats[p][1]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for p, (s, _) in sorted(offsets.items()) for x in (p, s)]
        ),
        F.col("__pid"),
    )
    off_cnt = F.element_at(
        F.create_map(
            *[F.lit(x) for p, (_, c) in sorted(offsets.items()) for x in (p, c)]
        ),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_sum = F.sum(F.col(value_col).cast("bigint")).over(w)
    win_cnt = F.count(value_col).over(w)
    return pid.withColumn(
        out_col,
        F.when(off_cnt + win_cnt == 0, F.lit(None).cast("bigint")).otherwise(
            (off + F.coalesce(win_sum, F.lit(0))).cast("bigint")
        ),
    ).drop("__pid")
