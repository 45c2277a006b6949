"""Exact heavy hitters via distributed Misra-Gries candidate generation.

"Every term with frequency > n/k" is the canonical corpus-curation
question (stopword discovery, boilerplate detection, hot-key audits).
The naive answer — groupBy(term).count() then filter — shuffles the
ENTIRE vocabulary; at 100 TB that is billions of group keys riding the
exchange to answer a question whose output is at most k-1 rows.

This operator bounds the shuffle with the classic two-phase scheme:

1. **Per-partition Misra-Gries summaries** (``mapInPandas``): each input
   partition keeps at most ``k`` counters; when a new term overflows the
   budget, all counters drop by the evicted mass (the batch
   generalization: add a batch's value_counts, then subtract the
   (k+1)-th largest count from everyone and drop non-positives).
   Soundness: every decrement round removes ≥ k+1 occurrences, so a
   partition with n_p tokens decrements any single term by at most
   n_p/(k+1) — a term with GLOBAL count > n/k ≥ Σ n_p/(k+1) keeps a
   positive counter in at least one partition. The candidate union is
   therefore a SUPERSET of the true heavy hitters, and each partition
   emits ≤ k candidate rows no matter how large it is.
2. **Exact recount** of candidates only: broadcast the candidate set
   (≤ k × n_partitions rows), hash-semi-join the token stream, exact
   groupBy count, keep ``cnt * k > n`` (strict — matching the MG
   guarantee). False candidates die here, so the output is EXACT — the
   DuckDB oracle computes it with a full group-by.

The Python stage touches each token once per partition with
vectorized ``value_counts`` per Arrow batch; the candidate set and the
final aggregate stay JVM-side. This is the same
approximate-candidates → exact-verify shape as the repo's LSH dedup and
PassJoin operators.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(tokens: DataFrame, term_col: str, k: int) -> DataFrame:
    """≤ k candidate terms per input partition (superset of >n/k hitters)."""
    import pandas as pd  # noqa: PLC0415

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf[term_col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > k:
                # batch MG: one decrement by the (k+1)-th largest count
                # restores the budget; removes >= (k+1) * d occurrences
                cuts = sorted(counters.values(), reverse=True)
                d = cuts[k]
                counters = {t: c - d for t, c in counters.items() if c - d > 0}
        yield pd.DataFrame({term_col: list(counters.keys())})

    return tokens.mapInPandas(summarize, f"{term_col} string")


def heavy_hitters_exact(
    tokens: DataFrame, term_col: str, k: int
) -> DataFrame:
    """All terms with count·k > n, with EXACT counts.

    Columns: ``term``, ``cnt``, ``n`` (corpus token total) — ordered by
    cnt desc, term asc. The only full pass over the token stream outside
    the bounded MG stage is the candidate-restricted recount (broadcast
    semi join, map-side combinable count) and one scalar count."""
    cands = misra_gries_candidates(tokens, term_col, k).distinct()
    total = tokens.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        tokens.join(F.broadcast(cands), term_col)
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n"))
        .select(F.col(term_col).alias("term"), "cnt", "n")
        .orderBy(F.desc("cnt"), F.asc("term"))
    )
