"""Exact set-similarity join via PPJoin-style prefix filtering.

The LSH near-dup path (`operators/dedup.lsh_candidate_pairs`) trades a
small miss probability for its bound; this operator is the DETERMINISTIC
counterpart: all pairs of documents whose distinct-token sets have
Jaccard ≥ τ, exactly, with no probabilistic miss — the prefix-filter
lemma (Chaudhuri et al. SSJoin / Xiao et al. PPJoin) guarantees every
qualifying pair shares a candidate token, and the exact verify does the
rest.

**Prefix-filter lemma.** Order all tokens by a global total order
(rarest first). For a set x, keep only its first
``p(x) = |x| − ceil(τ·|x|) + 1`` tokens ("prefix"). If
``J(A,B) ≥ τ`` then prefix(A) and prefix(B) share at least one token —
so the self-join on PREFIX tokens proposes a candidate superset, at a
fraction of the full inverted-index join (with τ = 4/5 the prefix is
~|x|/5 of each set, and rarest-first ordering puts the smallest join
buckets in the prefix: the frequent tokens that create quadratic
buckets are exactly the ones pruned).

Scale shape, window-free: the global token order is the SORT KEY
``struct(df, token)`` itself — any total order works for the lemma, so
no rank window over the vocabulary is needed; document frequencies come
from one combinable groupBy joined back token-keyed (vocabulary-sized
shuffle); per-doc sorted arrays from one doc-keyed ``collect_list`` +
``array_sort``; prefix = ``slice``; candidates from the prefix-token
self-join (id_a < id_b, distinct); verify = ``array_intersect`` on the
two docs' full token arrays with the threshold tested by exact integer
cross-multiplication (``inter·den ≥ num·union`` — τ is the rational
num/den, never a float).

All output is integer-exact (`inter`, `uni`, `jaccard_ppm`), so the
DuckDB oracle — the brute-force O(n²) pair join this operator avoids —
matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import tokens_col


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau_num: int,
    tau_den: int,
) -> DataFrame:
    """All pairs with distinct-token-set Jaccard ≥ tau_num/tau_den.

    Columns: ``(id_a, id_b, inter, uni, jaccard_ppm)`` with
    ``id_a < id_b``, ordered by (id_a, id_b). Empty-token docs are
    excluded (they cannot reach any positive τ)."""
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("__tok"),
    )
    dfreq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    keyed = toks.join(dfreq, "__tok").select(
        "__doc", F.struct("__df", "__tok").alias("__key")
    )
    docs = (
        keyed.groupBy("__doc")
        .agg(F.array_sort(F.collect_list("__key")).alias("__arr"))
        .withColumn("__sz", F.size("__arr"))
        .withColumn(
            "__plen",
            F.col("__sz")
            - F.expr(f"CAST(({tau_num} * __sz + {tau_den} - 1) div {tau_den} AS INT)")
            + F.lit(1),
        )
        .localCheckpoint(eager=False)  # feeds the prefix stream AND both verify sides
    )
    prefix = docs.select(
        "__doc", F.explode(F.expr("slice(__arr, 1, __plen)")).alias("__key")
    )
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "__key")
        .filter(F.col("a.__doc") < F.col("b.__doc"))
        .select(F.col("a.__doc").alias("id_a"), F.col("b.__doc").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col("__doc").alias("id_a"), F.col("__arr").alias("__arr_a"))
    db = docs.select(F.col("__doc").alias("id_b"), F.col("__arr").alias("__arr_b"))
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect("__arr_a", "__arr_b")).cast("bigint")
        )
        .withColumn(
            "uni",
            (F.size("__arr_a") + F.size("__arr_b")).cast("bigint") - F.col("inter"),
        )
        .filter(F.col("inter") * tau_den >= tau_num * F.col("uni"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.expr("CAST(inter * 1000000 AS BIGINT) div uni").alias("jaccard_ppm"),
        )
        .orderBy("id_a", "id_b")
    )
