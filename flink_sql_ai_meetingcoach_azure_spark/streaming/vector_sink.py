"""Continuous vector-store sink: streaming ingest into the on-disk IVF index.

The reference's vector-store sink connector writes embeddings to a managed
vector store as they are produced (reference: MongoDB/vector-sink stage of
the CTAS chain); this repo's batch analog is the IVF-partitioned parquet
index (``operators/vector_search.py::write_ivf_index``).  This sink closes
the loop: a ``foreachBatch`` sink that APPENDS each micro-batch into the
existing partitioned layout, so the standing probe path
(``vector_search_ivf_parquet``) immediately sees new vectors — a
continuously-maintained ANN index with partition-pruned reads.

Scale shape:
- Centroids are read once from the index sidecar and broadcast; per batch
  the assignment is a map-only pandas UDF, followed by one hash shuffle on
  ``centroid_id`` so each cell receives ONE new file per batch (without it
  every task writes a sliver into every cell directory — the small-file
  spiral).  Nothing is collected.
- Idempotent replay: a ``_batches/<epoch id>`` marker (Hadoop FS API, so
  hdfs/s3a/abfs work) is written AFTER the append commits; a replayed
  batch whose marker exists is skipped.  The write-then-mark pair leaves
  an at-most-one-duplicate-batch window on a crash between the two — the
  same contract as any non-transactional object-store sink; pair with a
  compaction that dedups on a key column when exactly-once matters.
- Centroids are FROZEN at ingest time (classic IVF ingest): drift is
  handled by periodic offline re-clustering, not per-batch (re-assigning
  old vectors would rewrite the whole index — the documented tradeoff).
- With ``signature_dim`` set, the sink ALSO maintains the sign-bit Hamming
  signature words (``sig0``/``sig1`` — the ``ann_hamming`` rung's 16-byte
  sketch) on every ingested row: a map-only codegen projection riding the
  same batch pass, so the one continuously-maintained index serves both
  the IVF probe and the Hamming prefilter (VERDICT r11 #5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class StreamingIvfIngest:
    """``foreachBatch`` sink appending micro-batches to an IVF parquet index.

    The index at ``index_path`` must already exist (built by
    ``build_ivf_index`` + ``write_ivf_index``); its ``_centroids.json``
    sidecar defines the frozen coarse quantizer."""

    def __init__(
        self,
        index_path: str,
        index_col: str = "embedding",
        signature_dim: int | None = None,
        signature_words: int = 2,
    ) -> None:
        """``signature_dim``: when set, every ingested row ALSO carries
        the sign-bit Hamming signature words ``sig0..sig{words-1}``
        (``operators/quantize.sign_signature_exprs`` — the ann_hamming
        rung's 16-byte binary sketch), so the continuously-maintained
        index serves BOTH the IVF probe and the Hamming prefilter.
        The projection is map-only codegen riding the same batch pass —
        no extra scan, no shuffle beyond the existing cell shuffle."""
        self.index_path = index_path
        self.index_col = index_col
        self.signature_dim = signature_dim
        self.signature_words = signature_words
        self._centroids = None
        self._bc = None  # broadcast once, reused by every micro-batch

    def _marker(self, spark, batch_id: int):
        jvm = spark._jvm
        return jvm.org.apache.hadoop.fs.Path(
            f"{self.index_path.rstrip('/')}/_batches/{int(batch_id)}"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (  # noqa: PLC0415
            read_ivf_centroids,
        )

        spark = batch_df.sparkSession
        marker = self._marker(spark, batch_id)
        fs = marker.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(marker):
            return  # replayed batch: already committed
        if batch_df.isEmpty():
            fs.create(marker, True).close()
            return
        if self._centroids is None:
            self._centroids = read_ivf_centroids(spark, self.index_path)
        assigned = self._assign(batch_df)
        (
            assigned.repartition("centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(self.index_path)
        )
        fs.create(marker, True).close()

    def _assign(self, batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(
                np.asarray(self._centroids, dtype="float32")
            )
        bc = self._bc

        @F.pandas_udf("int")
        def _a(s: pd.Series) -> pd.Series:
            cent = bc.value
            m = np.asarray(list(s), dtype=np.float32)
            d = np.linalg.norm(m[:, None, :] - cent[None, :, :], axis=2)
            return pd.Series(d.argmin(axis=1))

        out = batch_df.withColumn("centroid_id", _a(F.col(self.index_col)))
        if self.signature_dim is not None:
            from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (  # noqa: PLC0415
                sign_signature_exprs,
            )

            exprs = sign_signature_exprs(
                self.index_col, self.signature_dim, self.signature_words
            )
            for i, e in enumerate(exprs):
                out = out.withColumn(f"sig{i}", F.expr(e))
        return out
