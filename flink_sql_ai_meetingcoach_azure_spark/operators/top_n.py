"""Top-N / recent-history operators.

Reference: the ``recent_conversation_history`` view — a global streaming
Top-6 over ``$rowtime`` (``ROW_NUMBER() OVER (ORDER BY $rowtime DESC)`` +
``WHERE msg_rank <= 6`` + final ASC re-sort;
terraform/generate_personalized_commands.sh:489-505).

Batch global case: ``orderBy(desc).limit(n)`` — Spark plans
TakeOrderedAndProject (each task keeps a local top-n heap, the driver merges
n·num_partitions candidates), NOT an unpartitioned ``row_number`` window,
which would sort the entire input on a single partition and is the classic
100-TB scale-killer. Ranks are then assigned driver-side on the ≤n collected
rows (bounded by contract: n is a view size like 6, never data-sized).
Streaming: Spark refuses un-partitioned row_number on a stream, so
streaming/pipeline.py maintains the bounded table via ``foreachBatch``
(SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
        # global top-n: TakeOrderedAndProject + driver-side rank on ≤n rows
        top = df.orderBy(*order).limit(n)
        rows = top.collect()  # ordered desc by the plan's sort order
        schema = T.StructType(
            list(top.schema.fields) + [T.StructField(rank_col, T.IntegerType(), False)]
        )
        ranked = df.sparkSession.createDataFrame(
            [(*row, i + 1) for i, row in enumerate(rows)], schema
        )
        return ranked.orderBy(*([ts_col] + (tiebreak or [])))
    w = Window.partitionBy(*partition_by).orderBy(*order)
    ranked = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return ranked.orderBy(*(partition_by + [ts_col] + (tiebreak or [])))
