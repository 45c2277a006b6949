"""Keyword (BM25) full-text search and hybrid keyword+vector fusion.

Beyond-reference retrieval operators (task mandate alongside the ANN
family): the reference retrieves knowledge-base chunks by vector
similarity only (terraform/main.tf:649-669 — Atlas cosine index). A
production RAG / training-data pipeline also needs *lexical* retrieval —
exact keyword matches that embeddings blur — and a principled way to fuse
both rankings (Reciprocal Rank Fusion, Cormack et al. SIGIR'09).

Scale design (100 TB corpus, ~1e3 query batch):

- the query-term set is tiny and known up front → postings are filtered to
  query terms **before** the tf aggregation, so the explode→groupBy shuffle
  carries only matching tokens, not the corpus vocabulary;
- per-term document frequencies and corpus stats (N, avgdl) are
  kilobyte-sized aggregates → broadcast joins, never a shuffle of the
  corpus side;
- every ranking carries an explicit (score DESC, doc_id ASC) tie-break,
  so ranks are reproducible across engines and partitionings;
- scores are summed in **integer micro-points** (round(w·1e6) per term,
  exact BIGINT sum): double summation is order-dependent across
  partitionings, integer summation is not — the same convention as the
  repo's integer-cents money math (queries.py header). BM25's ln() is
  the one libm call; per-term micro-rounding absorbs last-ulp drift
  before any cross-row arithmetic happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60  # Cormack et al.'s constant

# Query-term sets up to this size are collected to the driver and inlined
# as an InSet token filter, enabling the one-pass corpus plan below; larger
# sets fall back to the two-pass broadcast-join plan.
MAX_LITERAL_TERMS = 4096


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("toks"),
    ).withColumn("dl", F.size("toks"))


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-(query, document) BM25 score.

    ``queries`` has columns (qid BIGINT, term STRING) — one row per query
    term, already tokenized/lowercased. Returns (qid, doc_id,
    score_micro BIGINT) — BM25 in integer micro-points (see module
    docstring); only documents matching ≥1 query term appear.

    Plan shape: ONE corpus pass. When the query-term set is small (the
    normal case — it is O(queries·terms), kilobytes), it is collected and
    inlined as an InSet filter over the token array, so a single
    scan+tokenize projection yields both the per-doc length (for avgdl)
    and the matched tokens; that narrow (doc_id, dl, matched) relation is
    lazily localCheckpoint'd and BOTH the stats aggregate and the postings
    explode read from it — the corpus is tokenized once, not once per
    consumer (two full passes cost ~2× at every scale). The checkpoint
    stores O(corpus rows) but only ~16 bytes + matched hits per row. For
    query-term sets past MAX_LITERAL_TERMS the plan falls back to
    exploding the corpus and pruning via broadcast semi join before the tf
    shuffle (two passes, no driver collect). df/N/avgdl are tiny
    aggregates joined by broadcast either way.
    """
    # NULL terms can never match a token: drop them up front so the inline
    # InSet never sees None and both plans agree (the join path dropped
    # them implicitly via equi-join null semantics)
    qterms = (
        queries.select("qid", "term")
        .where(F.col("term").isNotNull())
        .distinct()
    )
    term_rows = (
        qterms.select("term").distinct().limit(MAX_LITERAL_TERMS + 1).collect()
    )
    terms = [r.term for r in term_rows]

    toks = _doc_tokens(docs, id_col, text_col)
    # zero-term queries short-circuit through the join path (an InSet with
    # no arguments is a degenerate Column.isin() call); the empty broadcast
    # semi-join yields the correct empty result with the right schema
    if 0 < len(terms) <= MAX_LITERAL_TERMS:
        per_doc = toks.select(
            "doc_id",
            "dl",
            F.filter("toks", lambda t: t.isin(*terms)).alias("matched"),
        ).localCheckpoint(eager=False)
        stats = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        )
        postings = (
            per_doc.select("doc_id", "dl", F.explode("matched").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        stats = toks.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        )
        uniq_terms = qterms.select("term").distinct()
        postings = (
            toks.select("doc_id", "dl", F.explode("toks").alias("term"))
            .join(F.broadcast(uniq_terms), "term")  # prune before the tf shuffle
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    # document frequency as a count over the term partition: one extra
    # exchange of the (already tiny) postings table, instead of a second
    # full scan+explode pass to aggregate df separately (a separate
    # agg+join re-ran the whole postings subtree — no ReusedExchange)
    w_term = Window.partitionBy("term")

    scored = (
        postings.withColumn("df", F.count(F.lit(1)).over(w_term))
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn("w_micro", F.round(F.col("w") * 1_000_000).cast("bigint"))
    )
    return scored.groupBy("qid", "doc_id").agg(
        F.sum("w_micro").alias("score_micro")
    )


def top_k_ranks(
    scored: DataFrame, k: int, score_col: str = "score_micro", id_col: str = "doc_id"
) -> DataFrame:
    """Per-qid top-k with rank, tie-broken (score DESC, id ASC)."""
    w = Window.partitionBy("qid").orderBy(F.desc(score_col), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(*rank_lists: DataFrame, k: int, rrf_k: int = RRF_K) -> DataFrame:
    """Reciprocal Rank Fusion over ≥2 (qid, doc_id, rank) lists.

    rrf_micro = Σ_lists round(1e6/(rrf_k + rank)) — exact BIGINT
    arithmetic from integer ranks, so fusion is bit-deterministic with no
    epsilon at all. Top-k per qid by (rrf_micro DESC, doc_id ASC). Each
    input list is already top-k'd (bounded), so the union + groupBy here
    shuffles O(queries·k·lists) rows — negligible at any corpus scale.
    """
    unioned = rank_lists[0].select("qid", "doc_id", "rank")
    for other in rank_lists[1:]:
        unioned = unioned.unionByName(other.select("qid", "doc_id", "rank"))
    fused = unioned.groupBy("qid", "doc_id").agg(
        F.sum(
            F.round(F.lit(1_000_000.0) / (F.lit(rrf_k) + F.col("rank"))).cast("bigint")
        ).alias("rrf_micro"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
    )


def rerank_by_term_overlap(
    candidates: DataFrame,
    docs: DataFrame,
    qterms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_col: str = "fused_rank",
    rank_col: str = "rerank",
) -> DataFrame:
    """Second-stage reranking of a BOUNDED candidate list — the standard
    retrieve→rerank pipeline tail, where the expensive per-(query, doc)
    scorer touches only the O(queries·k) candidates a first stage
    produced, never the corpus.

    The relevance signal here is exact distinct query-term overlap
    (deterministic and SQL-reproducible — a cross-encoder drops into the
    same seam); ties fall back to the first-stage rank, so reranking can
    only reorder, never destabilize. The corpus is touched by ONE
    semi-join against the broadcast candidate-id set before tokenizing —
    only candidate documents are ever tokenized."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (  # noqa: PLC0415
        tokens_col,
    )

    # the candidate list is tiny (O(queries·k)) but its LINEAGE is the
    # whole first-stage retrieval plan, and it feeds two consumers (the
    # overlap join and the final rescore) — materialize once, same
    # discipline as lsh_candidate_pairs
    candidates = candidates.localCheckpoint(eager=False)
    cand_ids = candidates.select(id_col).distinct()
    texts = docs.join(F.broadcast(cand_ids), id_col).select(
        id_col, tokens_col(text_col).alias("__toks")
    )
    terms = texts.select(
        id_col, F.explode(F.array_distinct("__toks")).alias("term")
    )
    hits = (
        candidates.select("qid", id_col, prior_col)
        .join(terms, id_col)
        .join(qterms.select("qid", "term").distinct(), ["qid", "term"])
        .groupBy("qid", id_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    scored = candidates.join(hits, ["qid", id_col], "left").withColumn(
        "overlap", F.coalesce("overlap", F.lit(0))
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("overlap"), F.asc(prior_col)
    )
    return scored.withColumn(rank_col, F.row_number().over(w))


def phrase_search(
    docs: DataFrame,
    phrase_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching over a POSITIONAL postings index — the
    lexical-retrieval capability BM25's bag-of-words scoring cannot
    express (reference boundary: its vector store retrieves by cosine
    only; a phrase filter is the standard lexical companion).

    Plan shape (the selective-postings discipline of :func:`bm25_scores`):
    the token explode is filtered to the phrase's terms BEFORE any
    shuffle, so postings carry only the (few) matching tokens, never the
    corpus vocabulary; adjacency is an equi-join on ``(doc_id,
    pos + offset)`` per subsequent term — each join is keyed and linear
    in the term's posting size. Returns one row per matching document:
    ``(doc_id, n_matches, first_pos)`` with ``first_pos`` the 1-based
    token index of the first occurrence.

    At 100 TB: posting sizes are term-frequency-bounded (the same reason
    inverted indexes work); a stop-word phrase degrades to the hot-term
    join and should be df-capped upstream like the shingle joins.
    """
    if len(phrase_terms) < 2:
        raise ValueError("phrase_search: need at least 2 phrase terms")
    pos = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens_col(text_col)).alias("pos", "w"),
        )
        .filter(F.col("w").isin(list(set(phrase_terms))))
    )
    cur = (
        pos.filter(F.col("w") == phrase_terms[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = pos.filter(F.col("w") == term).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["doc_id", "p0"])
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        (F.min("p0") + 1).cast("bigint").alias("first_pos"),
    )


def vocab_coverage_curve(
    term_counts: DataFrame,
    vocab_ns: list[int],
    term_col: str = "term",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Vocabulary-size coverage curve over a (term, count) table: for
    each candidate vocabulary size N, the token-instance share covered
    by the top-N types (freq DESC, term ASC rank) in exact integer ppm,
    plus the types actually available.  ONE implementation shared by the
    batch sweep (queries.q_vocab_coverage_sweep) and the continuous
    readout (streaming.aggregate_sink.vocab_coverage_readout) so the two
    cannot drift (ADVICE r10).

    Shape: one range-exchange contiguous rank over the vocabulary-sized
    input, then a BROADCAST threshold join + combinable per-threshold
    sums — never a running-sum window over the vocabulary.  Thresholds
    past the vocabulary saturate at 1e6 ppm by construction.  Output:
    (vocab_n, n_types, covered_tokens, covered_ppm) ordered by vocab_n.
    """
    from flink_sql_ai_meetingcoach_azure_spark.operators.indexing import (  # noqa: PLC0415
        contiguous_row_ids,
    )

    spark = term_counts.sparkSession
    ranked = contiguous_row_ids(
        term_counts.select(
            F.col(term_col).alias("__term"),
            F.col(cnt_col).cast("bigint").alias("__cnt"),
        ),
        [F.desc("__cnt"), F.asc("__term")],
        id_col="__rank",
    ).localCheckpoint(eager=False)
    ths = spark.createDataFrame([(n,) for n in vocab_ns], "vocab_n bigint")
    per = (
        ranked.join(F.broadcast(ths), F.col("__rank") <= F.col("vocab_n"))
        .groupBy("vocab_n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("__cnt").cast("bigint").alias("covered_tokens"),
        )
    )
    tot = ranked.agg(F.sum("__cnt").alias("__t"))
    return (
        ths.join(per, "vocab_n", "left")
        .join(F.broadcast(tot))
        .select(
            "vocab_n",
            F.coalesce("n_types", F.lit(0)).cast("bigint").alias("n_types"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.expr(
                "coalesce(covered_tokens, 0L) * 1000000L div nullif(__t, 0)"
            ).alias("covered_ppm"),
        )
        .orderBy("vocab_n")
    )
