"""Span-level (exact-substring) deduplication across a corpus.

Document- and line-level dedup (``dedup.py``, ``line_dedup``) miss the
third duplication mode training corpora exhibit: long VERBATIM substrings
repeated across otherwise-distinct documents (boilerplate paragraphs,
licenses, quoted passages).  The reference treatment is suffix-array exact
substring dedup (Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022); a suffix array is inherently a single-machine
structure, so the distributed re-expression here is the standard
fixed-width rolling-window form of the same idea:

  every ``window``-token span of every document is hashed; a span whose
  hash occurs in two or more DISTINCT documents is a duplicated span; a
  document's duplication profile is the fraction of its spans that are
  duplicated.  Any repeated substring of length >= window tokens is
  guaranteed to produce matching windows (it contains at least one full
  window), so recall on >=window-token verbatim repeats is exact — the
  difference vs a suffix array is only that sub-window repeats go
  undetected and boundaries are quantized to tokens.

Scale shape: tokenize + windowed hashing is a map-only pass inside the
scan's codegen (one md5 per token position); the only corpus-wide
exchange is the groupBy on span hash, whose input is ~n_tokens rows and
whose aggregates are all map-side combinable.  Cross-doc detection uses
``min(doc) != max(doc)`` instead of ``countDistinct`` — exact for the
"more than one distinct doc" predicate at combiner cost.  Nothing here is
quadratic: pairs are produced by a bucketed self-join per span hash with
the same hot-bucket document-frequency cap as
:func:`~.dedup.ngram_jaccard_pairs`.

Reference parity note: the reference app dedups whole messages by md5
content hash only (app/utils/kafka_utils.py:209-217); span-level dedup is
part of this repo's beyond-reference training-data curation layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.hashing import md5_int32_col
from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import tokens_col

#: spans shared by more documents than this are capped out of the pair
#: join (a boilerplate span in m docs would emit m² pairs); stats still
#: count them — the cap bounds the JOIN, not the detection.
DEFAULT_MAX_DOC_FREQ = 1000

#: two independent polynomial (Horner) hash channels over per-token 32-bit
#: md5 hashes.  P are the largest primes with P·B + 2³² < 2⁶³ (every
#: intermediate fits a BIGINT under ANSI arithmetic on both engines);
#: combined channel space ≈ 2e28, birthday-safe past 10¹² spans.  An
#: earlier variant md5'd the joined token window per position — a
#: higher-order-function expression Catalyst evaluates INTERPRETED
#: (~11k windows/s); per-token md5 + integer Horner leads stays inside
#: WholeStageCodegen end to end (measured ~20× faster at sf0.1).
SPAN_HASH_B = (65_521, 65_519)
SPAN_HASH_P = (140_769_707_918_953, 140_769_707_918_951)


def span_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """(id, pos, span_hash) for every ``window``-token span of every doc.

    One row per token position (minus window-1 per doc); ``span_hash`` is
    the pair of polynomial channel hashes over the window's per-token
    md5_int32 values (see :data:`SPAN_HASH_P`), rendered ``"h1_h2"``.
    Documents shorter than ``window`` tokens emit nothing (no span of the
    target length exists — padding would fabricate matches between short
    docs)."""
    w = int(window)
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    tok_rows = toks.select(
        "id", F.posexplode("t").alias("pos", "__tok")
    ).withColumn("__h", md5_int32_col("__tok")).drop("__tok")
    # one per-doc window supplies the next w-1 token hashes via lead();
    # each channel folds them with Horner steps — pure BIGINT codegen.
    win = Window.partitionBy("id").orderBy("pos")
    chans = []
    for b, p in zip(SPAN_HASH_B, SPAN_HASH_P):
        acc = F.col("__h")
        for j in range(1, w):
            acc = (acc * F.lit(b) + F.lead("__h", j).over(win)) % F.lit(p)
        chans.append(acc)
    # lead() past the document end is null => the trailing w-1 positions
    # (which start no full window) drop out of the null-rejecting filter;
    # docs shorter than w tokens emit nothing, as before
    out = tok_rows.select(
        "id",
        "pos",
        F.concat_ws("_", *[c.cast("string") for c in chans]).alias("span_hash"),
        chans[0].isNotNull().alias("__full"),
    )
    return out.filter(F.col("__full")).drop("__full")


def duplicated_span_hashes(postings: DataFrame) -> DataFrame:
    """Span hashes occurring in >= 2 DISTINCT documents:
    (span_hash, n_occurrences, n_docs_lower_bound is implied by min!=max).

    ``min(id) != max(id)`` decides cross-doc duplication exactly with
    combinable aggregates — no countDistinct shuffle."""
    return (
        postings.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("id").alias("__mn"),
            F.max("id").alias("__mx"),
        )
        .filter(F.col("__mn") != F.col("__mx"))
        .drop("__mn", "__mx")
    )


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Per-document span-duplication profile:
    (id_col, n_spans, n_dup_spans, dup_ratio_micro).

    ``n_dup_spans`` counts the document's span POSITIONS whose hash is
    shared with at least one other document; ``dup_ratio_micro`` is the
    integer-micro ratio (exact under any partitioning — the float division
    happens once per row, after the integer counts are final).  Documents
    with no spans (shorter than ``window`` tokens) report 0/0/0.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    # ONE corpus pass: pre-aggregate positions per (span_hash, doc) — the
    # combinable groupBy collapses the token-count-sized posting list to
    # distinct (hash, doc) rows — then decide cross-doc duplication with
    # min/max window functions over the hash partition (no self-join, no
    # second scan of the corpus).
    postings = span_postings(df, id_col, text_col, window)
    by_hash_doc = postings.groupBy("span_hash", "id").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("span_hash")
    flagged = by_hash_doc.withColumn(
        "is_dup", F.min("id").over(w) != F.max("id").over(w)
    )
    per_doc = flagged.groupBy("id").agg(
        F.sum("c").alias("n_spans"),
        F.sum(F.when(F.col("is_dup"), F.col("c")).otherwise(F.lit(0))).alias(
            "n_dup_spans"
        ),
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                # integer floor-division: exact and engine-portable where a
                # double divide could round differently at scale boundaries
                F.expr("div(coalesce(n_dup_spans, 0) * 1000000, n_spans)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dup_ratio_micro"),
        )
    )
    return out


def span_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    max_doc_freq: int = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """Distinct document pairs (id_a < id_b) sharing at least one
    ``window``-token verbatim span, with the number of distinct shared
    span hashes: (id_a, id_b, n_shared_spans).

    The self-join is keyed by span hash, so cost is sum over hashes of
    (docs-per-hash choose 2), never corpus²; ``max_doc_freq`` caps a
    boilerplate span's contribution before the join (same guard as
    :func:`~.dedup.ngram_jaccard_pairs`).  Feed the result to
    :func:`~.components.connected_components` for transitive clusters.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    by_doc = (
        span_postings(df, id_col, text_col, window)
        .select("id", "span_hash")
        .distinct()
    )
    if max_doc_freq is not None:
        # document frequency as a count over the hash partition (one
        # window on the already-hash-clustered distinct output) instead of
        # an agg + join — keeps ONE corpus pass and leaves the two sides
        # of the pair self-join as identical subtrees for exchange reuse
        by_doc = (
            by_doc.withColumn(
                "__df", F.count(F.lit(1)).over(Window.partitionBy("span_hash"))
            )
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    a = by_doc.select(F.col("span_hash"), F.col("id").alias("id_a"))
    b = by_doc.select(F.col("span_hash"), F.col("id").alias("id_b"))
    return (
        a.join(b, "span_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )


def mask_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """REMOVE cross-document duplicated spans from every document — the
    rewrite step of Lee et al.'s substring dedup (detection alone only
    profiles; curation pipelines drop the duplicated bytes). A token
    position is removed iff it is covered by any ``window``-token span
    whose hash occurs in >= 2 distinct documents; the survivors are
    reassembled in order.

    Output: (id_col, n_tokens, n_removed, clean_text) — ``clean_text``
    is token-normalized (the same whitespace-split, lowercased stream
    the span hashes are computed over; original spacing is not
    preserved, matching the operator's curation use).

    Scale shape: cross-doc duplication is decided with min/max window
    functions over the span-hash partition — ONE pass over the postings
    (an aggregate + join-back form re-ran the whole span_postings
    subtree, including its per-doc lead() window exchange, once per
    consumer: 2 token-stream exchanges and a duplicated corpus pass,
    measured ~25% slower at sf0.1); coverage expansion is one bounded
    explode (``window`` rows per duplicated span START, not per token);
    removal is a left-anti join keyed by (doc, pos); reassembly is one
    per-doc aggregate of the surviving tokens. No self-joins, nothing
    quadratic."""
    w = int(window)
    postings = span_postings(df, id_col, text_col, w)
    # min(id) != max(id) over the hash partition == "hash occurs in >=2
    # distinct docs" (the duplicated_span_hashes predicate) — same rows
    # as the join-back on duplicated hashes, computed in the same pass
    whash = Window.partitionBy("span_hash")
    starts = (
        postings.withColumn("__mn", F.min("id").over(whash))
        .withColumn("__mx", F.max("id").over(whash))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("id", "pos")
    )
    cov = starts.select(
        "id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))).alias(
            "pos"
        ),
    ).distinct()
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    tok_rows = toks.select("id", F.posexplode("t").alias("pos", "tok"))
    kept = tok_rows.join(cov, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            # .getField("tok") (GetArrayStructFields) is ordinary codegen;
            # the transform-HOF form paid an interpreted lambda per
            # surviving token (r13 A/B on the corpus reassembly pass:
            # 0.614 -> 0.506 s, results exceptAll-equal)
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).getField(
                "tok"
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = tok_rows.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("bigint").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
