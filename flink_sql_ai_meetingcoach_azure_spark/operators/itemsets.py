"""Frequent co-occurring pairs — Apriori-pruned market-basket mining.

"Which items appear together in many documents" is the set-level
counterpart of the adjacency statistics in
``functions/text_analysis.pmi_collocations``: baskets are per-doc
DISTINCT token sets (presence, not count), support is document
frequency. The naive pair count is Σ_d C(L_d, 2) over FULL doc
vocabularies — quadratic in doc length and dominated by pairs of rare
words that can never reach min_support.

The Apriori property bounds it: a pair is frequent only if BOTH items
are (support is anti-monotone), so one cheap item-frequency pass prunes
the pair space before any pair exists:

1. **Item pass** — per-doc distinct items (one explode over
   ``array_distinct``), document frequency per item as a map-side-
   combinable groupBy, keep items with ``df >= min_support``.
2. **Restrict** — semi-join the (doc, item) stream to frequent items
   (item-keyed shuffle, never hint-broadcast: the frequent-item set is
   vocabulary-sized, the TF-IDF/idf discipline).
3. **Pair + count** — self-join the restricted stream on ``doc_id``
   with ``item_a < item_b`` (doc-keyed shuffle; pair space is
   Σ_d C(f_d, 2) where f_d counts only FREQUENT items in doc d — the
   PCY bound, further capped by real corpora's bounded doc length),
   then one combinable groupBy bounded by distinct frequent pairs.
4. Final ``min_support`` filter + integer support_ppm + top-k via
   TakeOrderedAndProject.

Everything is exact integer arithmetic; the DuckDB oracle reproduces
the output bit-for-bit with the unpruned full group-by (pruning only
removes pairs that cannot pass the final filter — asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import tokens_col


def doc_items(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, item) stream of per-doc DISTINCT tokens (basket membership)."""
    return df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("item"),
    )


def frequent_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_support: int = 10,
    top_n: int = 50,
) -> DataFrame:
    """Top-``top_n`` item pairs co-occurring in ≥ ``min_support`` docs.

    Columns: ``(item_a, item_b, pair_docs, support_ppm)`` with
    ``item_a < item_b``, ordered by (pair_docs desc, item_a, item_b);
    ``support_ppm = pair_docs·10^6 div n_docs`` in exact BIGINTs."""
    items = doc_items(df, id_col, text_col)
    freq = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_support)
        .select("item")
    )
    restricted = items.join(freq, "item", "left_semi")
    a = restricted.select("__doc", F.col("item").alias("item_a"))
    b = restricted.select("__doc", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "__doc")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_support)
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "item_a",
            "item_b",
            "pair_docs",
            F.expr("CAST(pair_docs * 1000000 AS BIGINT) div __n_docs").alias(
                "support_ppm"
            ),
        )
        .orderBy(F.desc("pair_docs"), "item_a", "item_b")
        .limit(top_n)
    )
