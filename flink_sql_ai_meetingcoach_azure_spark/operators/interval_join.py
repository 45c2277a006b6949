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
emitted ONCE by construction (kept only at the canonical first shared
cell, the cell containing ``max(l_start, r_start)`` — it always lies in
both intervals' cell ranges when they overlap), so no post-join
``distinct`` exchange is needed. Skew mode: a cell where
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
    (BIGINT, e.g. epoch µs) overlap, with the overlap window — one row
    per overlapping (left row, right row) pair. Exact — blocking only
    reorganizes the candidate space, the overlap predicate verifies
    every candidate, and the canonical-cell filter keeps exactly one
    copy of each pair (no dedup shuffle over the output)."""
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
    # a pair sharing k cells would be found k times; keep it only at the
    # cell of max(l_start, r_start). For an overlapping pair that cell is
    # always shared: say r_start >= l_start — then cell(r_start) is r's
    # first cell, and r_start < l_end gives cell(r_start) <= cell(l_end-1),
    # so it also lies in l's range. Codegen per candidate row — no
    # post-join distinct exchange over the (output-sized) pair list.
    return (
        lc.join(rc, "__cell")
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .filter(
            F.col("__cell")
            == F.greatest(
                _cell(F.col(l_start), bucket_width),
                _cell(F.col(r_start), bucket_width),
            )
        )
        .select(
            l_id,
            r_id,
            F.greatest(F.col(l_start), F.col(r_start)).alias("overlap_start"),
            F.least(F.col(l_end), F.col(r_end)).alias("overlap_end"),
        )
    )
