"""Sequence packing for training-data pipelines — beyond-reference.

LLM pre-training concatenates documents into fixed-token-budget context
windows ("packing"). The exact best-fit bin packing is inherently
sequential; the standard scalable form is CONTIGUOUS packing: documents in
a deterministic order fill bins greedily, a document that would overflow
the current bin starts the next one (approximated here as
``bin_id = (cumsum_before_doc) div budget`` — each bin holds ~budget tokens
with at most one straddling document, the same guarantee T5-style packing
gives after truncation).

Scale shape: packing is per SHARD (``partition_by``), not global — a global
order would serialize the corpus through one partition. Sharded, the whole
operator is ONE partitioned window (a single hash exchange on the shard
key), deterministic under retries because the order key is data, not
arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_contiguous(
    df: DataFrame,
    order_col: str,
    token_col: str | Column,
    budget: int,
    partition_by: list[str] | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a pack/bin id under a token ``budget``.

    Appends ``bin_col`` (0-based, per ``partition_by`` group) and
    ``overflow`` (row alone exceeds the budget — must be split/truncated
    downstream). Rows are packed in ``order_col`` order within each
    partition group; ``order_col`` must be unique per group for
    engine-independent determinism.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(*partition_by).orderBy(order_col)
        if partition_by
        else Window.orderBy(order_col)
    )
    cum_before = F.sum(tok).over(w) - tok
    # integer-exact while cum < 2^53 (a single shard never holds that many
    # tokens); cast truncation == floor for the non-negative cumsum
    return df.withColumn(bin_col, (cum_before / F.lit(budget)).cast("bigint")).withColumn(
        "overflow", tok > F.lit(budget)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    split_col: str = "split",
    key_col: str | None = None,
    files_per_split: int = 1,
    order_by: list[str] | None = None,
) -> None:
    """Materialize a curated corpus as training shards: one directory per
    ``split_col`` value (train/val/test), ~``files_per_split`` parquet files
    per split, each file internally sorted by ``order_by``.

    The layout decisions ARE the operator: file count controls downstream
    read parallelism and file size (the classic small-files/giant-files
    trade at 100 TB — tune files_per_split so files land in the 100 MB–1 GB
    band); in-file ordering keeps packed bins contiguous so a sequential
    reader streams one bin at a time; file membership hashes a DATA column
    (``key_col``, default the first order key) so a retried job writes the
    identical shard assignment — rand()-distributed writes can't.

    One hash exchange total: repartition on (split, file_idx) then a
    task-local sort feeds ``partitionBy`` directly.
    """
    order_by = order_by or []
    key = key_col or (order_by[0] if order_by else split_col)
    file_idx = F.pmod(F.xxhash64(F.col(key), F.lit("shardfile")), F.lit(files_per_split))
    staged = (
        df.withColumn("__file_idx", file_idx)
        .repartition(F.col(split_col), F.col("__file_idx"))
        .sortWithinPartitions(split_col, *order_by)
        .drop("__file_idx")
    )
    staged.write.mode("overwrite").partitionBy(split_col).parquet(path)
