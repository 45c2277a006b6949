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
    vs ROWS only differ under ties."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=False)
    )
    pid = ranged.withColumn("__pid", F.spark_partition_id())
    sums = {
        r["__pid"]: r["s"]
        for r in pid.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pid.withColumn(
        out_col,
        (off + F.sum(F.col(value_col).cast("bigint")).over(w)).cast("bigint"),
    ).drop("__pid")
