"""As-of join — for each left row, the latest right row at-or-before its
timestamp (per key). The standard alignment primitive for event streams vs
slowly-changing state (quotes/trades, feature stores, label joins).

Not in the reference (its joins are all correlated lateral lookups,
SURVEY.md §2.3) — this is part of the beyond-reference training-data layer.

Spark-first design: no native ASOF JOIN in Spark SQL, and a naive
``t_right <= t_left`` range join is O(n·m). Implemented instead as
union + single window pass:

    tag sides → union → window over (key) ordered by (ts, side) →
    ``last(right_value, ignorenulls)`` carries the most recent right row
    forward → keep left rows.

One shuffle on the key (same as any keyed join), linear scan within
partitions — survives 100 TB because it never materializes the pair space.
Right-side rows sort before left rows at equal ts (side tag 0 < 1), giving
inclusive at-or-before semantics like DuckDB ``ASOF JOIN`` / pandas
``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """left + latest right_value_cols where right.ts <= left.ts, per key.

    Returns all left columns plus ``right_value_cols`` (null when no right
    row precedes the left row).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in keys + [right_ts]
    ]

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = lhs.unionByName(rhs)

    # NB: if the right side can contain duplicate (key, ts) rows, pre-dedupe
    # it (keep one per (key, ts)) — otherwise which duplicate wins is
    # partition-order-dependent, as in any as-of implementation.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_value_cols
        ],
    )
    out_left_cols = [c for c in left.columns if c not in keys]
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *keys,
            *[F.col(c) for c in out_left_cols],
            *[F.col(f"__asof_{c}").alias(c) for c in right_value_cols],
        )
    )
