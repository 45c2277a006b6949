"""Crash-safe log compaction shared by the LSM merge-on-read sinks.

The naive compaction — ``folded.localCheckpoint(); folded.write.mode(
"overwrite").parquet(log)`` — holds the ONLY copy of the state in executor
memory (localCheckpoint is not fault-tolerant) while the overwrite first
truncates the directory: a driver/executor failure in that window loses
the entire sink state irrecoverably. The safe shape is write-then-swap:

1. write the folded log to a sibling temp dir (``<log>__compact_tmp``);
2. rename ``<log>`` -> ``<log>__pre_compact`` (atomic dir rename on HDFS/
   local; one object-store LIST+COPY otherwise);
3. rename the temp dir -> ``<log>``;
4. delete ``<log>__pre_compact``.

A crash before (3) leaves the full pre-compaction log recoverable at
``<log>__pre_compact`` (step 0 of the next compact() restores it); a crash
after (3) leaves the already-complete compacted log live. At no point is
the only copy of the state in memory or a half-deleted directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TMP_SUFFIX = "__compact_tmp"
_OLD_SUFFIX = "__pre_compact"


def _fs_path(spark: SparkSession, p: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def recover_log(spark: SparkSession, log_path: str) -> None:
    """Roll back an interrupted compaction: if a previous run crashed
    between steps (2) and (3), ``log_path`` is missing and the
    ``__pre_compact`` sibling holds the authoritative pre-compaction
    state — rename it back. Stale temp output from any crash is removed
    unconditionally."""
    log_path = log_path.rstrip("/")
    fs, log = _fs_path(spark, log_path)
    _, old = _fs_path(spark, f"{log_path}{_OLD_SUFFIX}")
    _, tmp = _fs_path(spark, f"{log_path}{_TMP_SUFFIX}")
    if fs.exists(tmp):
        fs.delete(tmp, True)
    if fs.exists(old):
        if not fs.exists(log):
            fs.rename(old, log)  # crashed mid-swap: restore
        else:
            fs.delete(old, True)  # crashed after swap: drop the stale copy


def replace_log_atomically(
    spark: SparkSession, log_path: str, folded: DataFrame
) -> None:
    """Replace the parquet directory at ``log_path`` with ``folded`` via
    write-then-swap. ``folded`` may read FROM the live log — it is fully
    materialized into the temp directory before the live directory is
    touched."""
    log_path = log_path.rstrip("/")
    recover_log(spark, log_path)
    fs, log = _fs_path(spark, log_path)
    _, old = _fs_path(spark, f"{log_path}{_OLD_SUFFIX}")
    _, tmp = _fs_path(spark, f"{log_path}{_TMP_SUFFIX}")
    folded.write.mode("overwrite").parquet(f"{log_path}{_TMP_SUFFIX}")
    if fs.exists(log):
        fs.rename(log, old)
    fs.rename(tmp, log)
    if fs.exists(old):
        fs.delete(old, True)
