"""Z-order layout: key correctness vs a Python Morton reference, and the
actual data-skipping payoff measured against raw parquet footers."""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.layout import (
    normalize_to_bits,
    write_zordered,
    zorder_key,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _py_morton(cells: list[int], bits: int) -> int:
    out = 0
    n = len(cells)
    for dim, c in enumerate(cells):
        for b in range(bits):
            out += ((c >> b) & 1) << (b * n + dim)
    return out


def test_zorder_key_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [
        (i, rng.randrange(0, 256), rng.randrange(0, 256), rng.randrange(0, 8))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["i", "x", "y", "z3"])
    # 2-D at 8 bits and 3-D at 4 bits
    got2 = {
        r.i: r.k
        for r in df.select(
            "i", zorder_key([F.col("x"), F.col("y")], 8).alias("k")
        ).collect()
    }
    for i, x, y, _ in rows:
        assert got2[i] == _py_morton([x, y], 8)
    got3 = {
        r.i: r.k
        for r in df.select(
            "i",
            zorder_key([F.col("x") % 16, F.col("y") % 16, F.col("z3")], 4).alias("k"),
        ).collect()
    }
    for i, x, y, z3 in rows:
        assert got3[i] == _py_morton([x % 16, y % 16, z3], 4)


def test_normalize_to_bits_exact_integer_cells(spark):
    """Cell assignment must be exact integer floor division (a double `/`
    can straddle a cell boundary) and must clamp out-of-range values."""
    rows = [(v,) for v in [-5, 0, 1, 999_999_999_999, 10**12, 2 * 10**12]]
    df = spark.createDataFrame(rows, ["v"])
    got = [
        r.c
        for r in df.select(
            normalize_to_bits(F.col("v"), 0, 10**12, 16).alias("c")
        ).collect()
    ]
    want = [
        max(0, min(10**12, v)) * 65535 // 10**12
        for (v,) in rows
    ]
    assert got == want


def _groups_surviving(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(surviving, total) row groups whose min-max stats intersect the box."""
    total = survive = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        pf = pq.ParquetFile(f)
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            stats = {}
            for c in range(rg.num_columns):
                col = rg.column(c)
                name = col.path_in_schema
                if col.statistics is not None:
                    stats[name] = (col.statistics.min, col.statistics.max)
            total += 1
            if all(
                not (stats[k][1] < lo or stats[k][0] > hi)
                for k, (lo, hi) in box.items()
                if k in stats
            ):
                survive += 1
    return survive, total


def test_write_zordered_prunes_boxes_single_sort_does_not(spark, tmp_path):
    """The payoff assertion: against raw parquet footers, a 2-D box filter
    intersects far fewer row groups under the z-ordered layout than under
    a plain single-column sort — the second dimension's stats are tight
    boxes instead of full-range."""
    rng = random.Random(9)
    rows = [(i, rng.randrange(0, 256), rng.randrange(0, 256)) for i in range(40_000)]
    df = spark.createDataFrame(rows, ["i", "x", "y"])

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], [(0, 255), (0, 255)], bits=8, num_files=64)

    xpath = str(tmp_path / "xsorted")
    (
        df.repartitionByRange(64, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # aligned 32x32 quadrant: an eighth of each dimension, 1/64 of the grid
    box = {"x": (64, 95), "y": (64, 95)}
    z_surv, z_total = _groups_surviving(zpath, box)
    x_surv, x_total = _groups_surviving(xpath, box)
    assert z_total >= 32 and x_total >= 32  # enough granularity to mean anything
    # x-sorted prunes on x only: ~1/8 of groups survive; z-ordered carries
    # tight boxes in BOTH dims: ~1/64 + run boundaries. Range-partition
    # boundary sampling jitters which groups straddle the box edge by ±1
    # on either side, so assert a 1.5x ratio (not the knife-edge 2x) plus
    # an absolute bound: z must prune to at most 1/8 of groups — the level
    # the single-column sort can only reach on its OWN dimension.
    assert z_surv * 3 <= x_surv * 2, (z_surv, z_total, x_surv, x_total)
    assert z_surv <= z_total // 8, (z_surv, z_total)
    # and the z-ordered write kept every row
    assert spark.read.parquet(zpath).count() == len(rows)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    SortMergeJoin with ZERO Exchange (the write-time shuffle is amortized
    over every later join); the same join over raw parquet pays two. Also
    the bucketed groupBy on the key plans no exchange."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.layout import write_bucketed

    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "t_orders_b", "o_key", 8)
        write_bucketed(lines, "t_lines_b", "l_key", 8, sort_col="l_key")
        ob, lb = spark.table("t_orders_b"), spark.table("t_lines_b")
        joined = ob.join(lb, ob["o_key"] == lb["l_key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        assert joined.count() == 4000

        agg_plan = (
            lb.groupBy("l_key").count()._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Exchange" not in agg_plan  # bucketing serves the agg too

        # control: the identical join over raw (unbucketed) parquet shuffles
        orders.write.mode("overwrite").parquet(str(tmp_path / "o_raw"))
        lines.write.mode("overwrite").parquet(str(tmp_path / "l_raw"))
        o_raw = spark.read.parquet(str(tmp_path / "o_raw"))
        l_raw = spark.read.parquet(str(tmp_path / "l_raw"))
        raw_plan = (
            o_raw.join(l_raw, o_raw["o_key"] == l_raw["l_key"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert raw_plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_date_partitioned_scan_prunes_directories(spark, tmp_path):
    """A time-range filter over the date-partitioned layout must become a
    PartitionFilter (directory pruning before I/O), and the number of
    files actually read must shrink to the matching dates."""
    import os

    from flink_sql_ai_meetingcoach_azure_spark.operators.layout import (
        write_date_partitioned,
    )
    from flink_sql_ai_meetingcoach_azure_spark.queries import _events, _prep

    _prep(spark)
    ev = _events(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "ev_by_day")
    write_date_partitioned(ev, path, "ts", granularity="day")
    dirs = [d for d in os.listdir(path) if d.startswith("__date=")]
    assert len(dirs) >= 5  # events span ~a month of days

    scan = spark.read.parquet(path).filter(
        (F.col("__date") >= "2024-01-10") & (F.col("__date") < "2024-01-12")
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "2024-01-10" in plan  # the bound reached the partition filter
    # correctness: pruned read equals the unpartitioned filter
    want = ev.filter(
        (F.date_format("ts", "yyyy-MM-dd") >= "2024-01-10")
        & (F.date_format("ts", "yyyy-MM-dd") < "2024-01-12")
    ).count()
    assert scan.count() == want and want > 0


def test_date_partitioned_write_parallelism_scales_with_dates(spark, tmp_path):
    """The small-files bound must not collapse write parallelism: with
    files_per_partition=1 every date hashes to its OWN shuffle partition
    (one file per date, parallelism = number of dates — NOT one global
    partition, the ADVICE r6 regression where repartition(1, key) hashed
    the whole dataset into a single writer task), and files_per_partition=2
    salts each date across ~2 writer tasks."""
    import os

    from flink_sql_ai_meetingcoach_azure_spark.operators.layout import (
        write_date_partitioned,
    )
    from flink_sql_ai_meetingcoach_azure_spark.queries import _events, _prep

    def files_per_date(path):
        out = {}
        for d in os.listdir(path):
            if d.startswith("__date="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
                )
        return out

    _prep(spark)
    ev = _events(spark, "/root/testdata/sf0.001")

    # pin AQE partition coalescing off for the file-count assertions: on
    # this kilobyte test input AQE folds the whole shuffle into one
    # partition (correctly — the salted layout only matters when partitions
    # carry real volume), which would mask the per-date fan-out under test
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        p1 = str(tmp_path / "fpp1")
        write_date_partitioned(ev, p1, "ts", granularity="day")
        fpd = files_per_date(p1)
        assert len(fpd) >= 5
        # one file per date: each date owns one hash partition (collisions
        # of two dates onto one shuffle partition still write one file per
        # date — partitionBy splits by date within the task)
        assert all(n == 1 for n in fpd.values()), fpd

        p2 = str(tmp_path / "fpp2")
        write_date_partitioned(
            ev, p2, "ts", granularity="day", files_per_partition=2
        )
        fpd2 = files_per_date(p2)
        # salted: dates fan out to up to 2 files, at least one actually
        # does, and none exceeds the bound
        assert all(1 <= n <= 2 for n in fpd2.values()), fpd2
        assert any(n == 2 for n in fpd2.values()), fpd2
        # same rows either way
        assert spark.read.parquet(p2).count() == ev.count()
    finally:
        spark.conf.set(coalesce_key, prev)
