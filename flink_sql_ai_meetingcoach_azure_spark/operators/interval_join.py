"""Interval-overlap join — equi-join blocking for a non-equi predicate.

``A.start < B.end AND B.start < A.end`` is a classic Spark trap: with no
equality key the planner falls back to a broadcast-nested-loop /
cartesian comparison. The standard scale fix (DB folklore; e.g. the
bucketing strategy in temporal-join literature) is to EXPLODE every
interval onto the coarse time cells it covers and equi-join on the cell:
two intervals overlap only if they share at least one ``bucket_width``
cell, so the non-equi predicate becomes a verify filter AFTER a
hash-distributed equi-join — the same candidate/verify shape as the LSH
and PassJoin operators here.

Scale design: each interval emits ``len/bucket_width + 1`` cell rows —
pick the width near the typical interval length and the blow-up is ~2×;
the join is hash-partitioned by cell; a pair sharing several cells is
deduplicated by a ``distinct`` on the id pair. Skew mode: a cell where
many intervals stack (incident pile-ups) squares inside that bucket —
the same hot-key mode as shingle/segment joins, bounded upstream by
capping per-cell membership if a workload needs it. Cell arithmetic is
EXACT BIGINT floor division (a double divide can mis-bucket a boundary
microsecond and silently drop a touching pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(x: Column, width: int) -> Column:
    """Exact floor(x / width) for non-negative BIGINT microseconds."""
    return ((x - F.pmod(x, F.lit(width))) / F.lit(width)).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_start: str,
    l_end: str,
    r_id: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """All (l_id, r_id) pairs whose half-open intervals ``[start, end)``
    (BIGINT, e.g. epoch µs) overlap, with the overlap window. Exact —
    blocking only reorganizes the candidate space, the overlap predicate
    verifies every candidate."""
    lv = left.select(l_id, l_start, l_end).filter(F.col(l_end) > F.col(l_start))
    rv = right.select(r_id, r_start, r_end).filter(F.col(r_end) > F.col(r_start))
    lc = lv.select(
        "*",
        F.explode(
            F.sequence(
                _cell(F.col(l_start), bucket_width),
                _cell(F.col(l_end) - F.lit(1), bucket_width),
            )
        ).alias("__cell"),
    )
    rc = rv.select(
        "*",
        F.explode(
            F.sequence(
                _cell(F.col(r_start), bucket_width),
                _cell(F.col(r_end) - F.lit(1), bucket_width),
            )
        ).alias("__cell"),
    )
    return (
        lc.join(rc, "__cell")
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .select(
            l_id,
            r_id,
            F.greatest(F.col(l_start), F.col(r_start)).alias("overlap_start"),
            F.least(F.col(l_end), F.col(r_end)).alias("overlap_end"),
        )
        .distinct()
    )
