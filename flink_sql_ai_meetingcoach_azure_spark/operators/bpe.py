"""Distributed BPE (byte-pair-encoding) vocabulary training + application.

Sennrich et al. 2016 subword tokenization, structured the way it actually
scales: BPE statistics depend only on the WORD-FREQUENCY table, so the
corpus is touched exactly once (one combinable ``groupBy(word)`` — linear,
map-side-combined), and every merge round then runs over distinct words
only (vocabulary-sized, many orders smaller than the corpus). Each round
is one partial-aggregated pair count + a one-row ``TakeOrderedAndProject``
argmax + a codegen'd merge rewrite, with ``localCheckpoint`` cutting the
iterative lineage (swap for ``checkpoint`` with a dir on a cluster).

Determinism: ties on pair frequency break lexicographically on (left,
right) — the merge sequence is a pure function of the corpus, independent
of partitioning/retries.

Application (:func:`apply_bpe`) is an Arrow-batched pandas UDF running the
classic rank-greedy merge loop per word with a per-batch word cache —
tokenizing with a TRAINED vocab is exactly the "custom semantics Spark
lacks" seam the mandate routes through pandas UDFs, and word-level caching
makes the per-token cost amortize the way real tokenizers do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import tokens_col


def _merge_expr(s: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent symbol
    pair (left, right) with their concatenation — a single codegen'd
    ``aggregate`` over the symbol array. A merged symbol is strictly longer
    than ``left``, so it can never re-match as ``left`` within the same
    round (no overlap double-merge)."""
    merged = F.array(F.lit(left + right))
    return F.aggregate(
        s,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide pass BPE
    training needs."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Train BPE merges on the corpus; returns the ordered merge list.

    Stops early when no adjacent pair reaches ``min_count`` weighted
    occurrences. The corpus is read once; every round after that runs over
    the distinct-word table only.
    """
    # lazy checkpoints: each round's one-row argmax is the only action, so
    # it materializes the (vocabulary-sized) checkpoint it reads — one job
    # per round instead of an eager-checkpoint job PLUS the argmax job
    syms = (
        word_frequencies(df, text_col)
        .select("freq", F.split("w", "").alias("s"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = syms.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("s", 1, F.size("s") - 1),
                    F.slice("s", 2, F.size("s") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if best is None or best["cnt"] < min_count:
            break
        merges.append((best["l"], best["r"]))
        syms = syms.select(
            "freq", _merge_expr(F.col("s"), best["l"], best["r"]).alias("s")
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: whitespace words →
    rank-greedy BPE subwords (lowest-rank applicable merge first — the
    classic application loop, equivalent to replaying merges in training
    order). Arrow-batched pandas UDF with a per-batch word cache."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best_i, best_rank = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_rank:
                    best_i, best_rank = i, r
            if best_i < 0 or best_rank >= len(ranks):
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    # NOTE: no type hints — `from __future__ import annotations` stringifies
    # them and pandas_udf's hint inference can't resolve the local `pd`
    @pandas_udf("array<string>")
    def _encode(texts):
        cache: dict = {}
        out = []
        for t in texts:
            toks = [w for w in (t or "").lower().split() if w]
            enc: list[str] = []
            for w in toks:
                enc.extend(encode_word(w, cache))
            out.append(enc)
        return pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(text_col)))
