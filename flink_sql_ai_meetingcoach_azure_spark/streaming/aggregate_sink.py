"""Continuously-maintained materialized rollup: streaming aggregate sink.

Spark's native streaming aggregation (update mode) keeps its state in
the checkpoint — opaque to SQL until rows are emitted. Production
pipelines usually want the opposite: a DURABLE, directly-queryable
aggregate table that every micro-batch advances and any outside reader
can scan. This sink maintains exactly that, with the same merge-on-read
LSM state shape as the near-dup dedup and IVF-ingest sinks:

- per micro-batch, the batch is PARTIAL-AGGREGATED distributed-side
  (one combinable groupBy — count + sums shrink each batch to one row
  per key before anything is written), and the partials are APPENDED to
  a parquet log — append-cheap, no rewrite of existing state;
- reads merge on the fly (``current()``: one groupBy-sum over the log);
  ``compact()`` folds the log back to one row per key offline;
- replayed batches are no-ops via ``_batches/<id>`` markers (Hadoop FS
  API — hdfs/s3a/abfs safe), so restart recovery cannot double-count —
  the write-then-mark pair leaves the same at-most-one-duplicate-batch
  crash window every non-transactional object-store sink has.

Only COMBINABLE aggregates (count, sum — and anything derivable from
them: mean, integer-cents totals) belong here; a non-combinable metric
(exact distinct, median) needs its own state shape. At 100 TB the log
grows by ~|active keys per batch| rows per trigger, independent of
input row count — the partial-agg is what makes a hot topic sustainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingAggregateSink:
    """``foreachBatch`` sink maintaining per-key (count, sum…) partials
    in an append-only parquet log merged on read."""

    def __init__(
        self,
        state_dir: str,
        key_cols: list[str],
        sum_cols: list[str],
        spark: SparkSession,
    ) -> None:
        self.state_dir = state_dir.rstrip("/")
        self.key_cols = list(key_cols)
        self.sum_cols = list(sum_cols)
        self.spark = spark

    # -- replay markers (same contract as StreamingIvfIngest) ----------
    def _marker(self, batch_id: int):
        jvm = self.spark._jvm
        return jvm.org.apache.hadoop.fs.Path(
            f"{self.state_dir}/_batches/{int(batch_id)}"
        )

    def _partial(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(c).cast("long").alias(f"__sum_{c}") for c in self.sum_cols
        ]
        return df.groupBy(*self.key_cols).agg(*aggs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = self._marker(batch_id)
        fs = marker.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if fs.exists(marker):
            return  # replayed batch: already committed
        if not batch_df.isEmpty():
            self._partial(batch_df).write.mode("append").parquet(
                f"{self.state_dir}/log"
            )
        fs.create(marker, True).close()

    # -- merge-on-read views -------------------------------------------
    def _merged(self) -> DataFrame:
        log = self.spark.read.parquet(f"{self.state_dir}/log")
        aggs = [F.sum("__n").cast("long").alias("n_rows")] + [
            F.sum(f"__sum_{c}").cast("long").alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return log.groupBy(*self.key_cols).agg(*aggs)

    def current(self) -> DataFrame:
        """The maintained rollup: one row per key, exact counts/sums."""
        return self._merged()

    def compact(self) -> None:
        """Fold the log to one partial row per key (same read results,
        O(keys) storage). Offline maintenance, not on the hot path."""
        merged = self._merged().select(
            *self.key_cols,
            F.col("n_rows").alias("__n"),
            *[F.col(f"sum_{c}").alias(f"__sum_{c}") for c in self.sum_cols],
        )
        compacted = merged.localCheckpoint()  # materialize before overwrite
        compacted.write.mode("overwrite").parquet(f"{self.state_dir}/log")
