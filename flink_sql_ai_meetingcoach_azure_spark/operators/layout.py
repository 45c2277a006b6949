"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

Parquet scans prune at TWO granularities before any I/O: partition
directories, and row-group/file min-max statistics. A table sorted by one
column has tight stats on that column only — a filter on any other column
scans everything. Interleaving the bits of several columns into one
Morton key and range-partitioning + sorting the write by that key gives
every row group a tight bounding BOX in all interleaved dimensions, so a
conjunctive range filter on any subset of them prunes most groups (the
layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; the curve is
Morton 1966, public).

Everything here is exact integer arithmetic in plain column expressions
(shift/and/add — WholeStageCodegen, reproducible bit-for-bit in ANSI
SQL), so z-keys are oracle-checkable and identical under any
partitioning or engine.

Scale design: key computation is map-only (zero exchanges);
``write_zordered`` costs exactly ONE range-partitioning exchange (the
same shuffle a plain global sort-write pays) — the skipping benefit is
bought once at write time and repaid on every subsequent scan. The
min-max normalization bounds come from a 1-row aggregate (driver-side
scalars, the IVF-centroid discipline) or caller-pinned constants for
append-stable layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column, lo: int, hi: int, bits: int
) -> Column:
    """Affine-map an integer column from [lo, hi] onto [0, 2^bits): exact
    BIGINT arithmetic (``(v - lo) * (2^bits - 1) div (hi - lo)``) so both
    engines place every value in the same cell. Values are clamped to the
    range first (append workloads can exceed pinned bounds)."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = hi - lo
    top = (1 << bits) - 1
    v = F.greatest(F.lit(lo), F.least(F.lit(hi), col.cast("long")))
    p = (v - F.lit(lo)) * F.lit(top)
    # exact integer division: strip the remainder in BIGINT before the
    # (now-divisible, small-quotient) divide — a plain double `/` can be
    # off by one ulp when p exceeds 2^53
    return ((p - F.pmod(p, F.lit(span))) / F.lit(span)).cast("long")


def zorder_key(cells: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each cell column into one
    Morton key (dimension 0 owns bit positions 0, n, 2n, ...). Disjoint
    target bits mean the per-bit terms can be SUMMED — addition renders
    identically in Spark and ANSI SQL where bitwise OR spellings differ."""
    n = len(cells)
    terms = []
    for dim, cell in enumerate(cells):
        c = cell.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)), b * n + dim
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_key_sql(cell_exprs: list[str], bits: int = 16) -> str:
    """The identical interleave as ANSI SQL text (DuckDB-ready) over
    pre-normalized cell expressions — single source of truth for oracles."""
    n = len(cell_exprs)
    terms = []
    for dim, e in enumerate(cell_exprs):
        for b in range(bits):
            # full parens: several dialects bind `+` TIGHTER than `<<`
            terms.append(f"(((({e}) >> {b}) & 1) << {b * n + dim})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    ranges: list[tuple[int, int]],
    bits: int = 8,
    num_files: int = 8,
) -> None:
    """Persist ``df`` clustered on the Morton key of ``cols`` (integer
    columns with caller-pinned [lo, hi] bounds): ONE range-partitioning
    exchange + in-partition sort, then parquet. Row-group min-max stats
    become tight boxes in every interleaved dimension — conjunctive range
    scans over the written table prune groups in all of them (asserted
    against raw parquet footers in test_layout.py)."""
    cells = [
        normalize_to_bits(F.col(c), lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)
    ]
    keyed = df.withColumn("__z", zorder_key(cells, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` hash-BUCKETED on ``bucket_col`` (optionally
    sort-within-bucket) as a managed parquet table — the pre-shuffled
    storage layout for repeated co-located joins/aggregations.

    Two tables bucketed on their join key with the SAME bucket count
    join with ZERO Exchange on either side (asserted against the
    physical plan in test_layout.py): the shuffle every fresh join of
    raw files must pay happens ONCE at write time and is amortized over
    every subsequent join, aggregation, or window keyed on the bucket
    column. At 100 TB this is the difference between re-shuffling the
    fact table per query and reading it join-ready; the same layout
    serves groupBy/window on the key (no exchange) and survives
    executors joining/leaving because bucket->file mapping is static.

    Spark requires ``saveAsTable`` for bucketing metadata (the bucket
    spec lives in the catalog, not the parquet footers). Re-writes are
    robust to STALE warehouse leftovers from another session: a managed
    table's location surviving a process exit (the in-memory catalog
    forgets the table but not the directory) would fail the overwrite
    with LOCATION_ALREADY_EXISTS, so both the catalog entry and any
    orphaned location are cleared first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(f"{warehouse.rstrip('/')}/{table}")
    fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(loc):
        fs.delete(loc, True)
    w = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    files_per_partition: int = 1,
) -> None:
    """Persist ``df`` hive-partitioned by a derived date column — the
    third canonical layout next to :func:`write_bucketed` (join keys)
    and :func:`write_zordered` (multi-dim range scans): time-range
    queries prune whole DIRECTORIES before any file I/O (PartitionFilters
    in the scan, asserted in test_layout.py).

    The derived ``__date`` partition column keeps the original timestamp
    intact in the data files. One hash repartition on (date, salt) bounds
    the writer to ~files_per_partition files per date (without it every
    task writes a sliver into every date dir — the classic small-files
    failure at scale) while write PARALLELISM scales with the number of
    dates × files_per_partition: each (date, salt) pair lands in its own
    hash partition (bounded above by spark.sql.shuffle.partitions), never
    the single global partition a count-only ``repartition(n, key)`` with
    small n would force. The salt is a deterministic hash of the
    timestamp, not rand(), so re-runs produce identical file contents."""
    gran = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}[granularity]
    keyed = df.withColumn("__date", F.date_format(F.col(ts_col), gran))
    if files_per_partition <= 1:
        parted = keyed.repartition("__date")
    else:
        salt = F.pmod(F.xxhash64(F.col(ts_col)), F.lit(files_per_partition))
        parted = keyed.repartition(F.col("__date"), salt)
    (
        parted.write.mode("overwrite")
        .partitionBy("__date")
        .parquet(path)
    )
