"""Top-N / recent-history operators.

Reference: the ``recent_conversation_history`` view — a global streaming
Top-6 over ``$rowtime`` (``ROW_NUMBER() OVER (ORDER BY $rowtime DESC)`` +
``WHERE msg_rank <= 6`` + final ASC re-sort;
terraform/generate_personalized_commands.sh:489-505).

Batch global case: ``orderBy(desc).limit(n)`` — Spark plans
TakeOrderedAndProject (each task keeps a local top-n heap, the driver merges
n·num_partitions candidates), NOT an unpartitioned ``row_number`` window,
which would sort the entire input on a single partition and is the classic
100-TB scale-killer. Ranks are then assigned on the ≤n surviving rows
(bounded by contract: n is a view size like 6, never data-sized) without a
window node: the limited set is coalesced to one sorted partition and
``monotonically_increasing_id`` enumerates it — lazy, JVM-only, and no
driver round-trip of row values.
Streaming: Spark refuses un-partitioned row_number on a stream, so
streaming/pipeline.py maintains the bounded table via ``foreachBatch``
(SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recent_top_n(
    df: DataFrame,
    n: int = 6,
    ts_col: str = "rowtime",
    partition_by: list[str] | None = None,
    tiebreak: list[str] | None = None,
    rank_col: str = "msg_rank",
) -> DataFrame:
    """Latest-n rows (optionally per partition key), re-sorted ascending like
    the reference view. ``tiebreak`` columns make ranking deterministic when
    timestamps collide (the reference relies on Kafka offset order)."""
    order: list[Column] = [F.desc(ts_col)] + [F.desc(c) for c in (tiebreak or [])]
    if not partition_by:
        # global top-n: TakeOrderedAndProject, then rank the ≤n survivors on
        # ONE sorted partition — monotonically_increasing_id on partition 0
        # is the 0-based row position, so rank = mid + 1 with no window node
        # (an empty-spec WindowExec) and no driver collect
        top = df.orderBy(*order).limit(n).coalesce(1).sortWithinPartitions(*order)
        ranked = top.withColumn(
            rank_col, (F.monotonically_increasing_id() + 1).cast("int")
        )
        return ranked.orderBy(*([ts_col] + (tiebreak or [])))
    w = Window.partitionBy(*partition_by).orderBy(*order)
    ranked = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return ranked.orderBy(*(partition_by + [ts_col] + (tiebreak or [])))
