"""BM25 / RRF / clustering / mixture / rule-pack operator tests (round-5
beyond-reference additions). Pin behavior against small hand-checkable
corpora and a pure-Python BM25 reference; assert the scale-relevant plan
shapes (broadcasts, pruned postings)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (
    assign_nearest_centroid,
    cluster_balanced_sample,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.sampling import mixture_sample
from flink_sql_ai_meetingcoach_azure_spark.operators.text_search import (
    bm25_scores,
    rrf_fuse,
    top_k_ranks,
)


def _py_bm25(docs: dict[int, str], queries: dict[int, str], k1=1.2, b=0.75):
    """Pure-Python reference BM25 (micro-points), mirroring the operator
    spec: whitespace-lowercase tokens, per-term micro rounding, exact
    integer sum."""
    toks = {d: [t for t in text.lower().split() if t] for d, text in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, qtext in queries.items():
        for d, tlist in toks.items():
            dl = len(tlist)
            score = 0
            matched = False
            for term in dict.fromkeys(qtext.split()):
                tf = tlist.count(term)
                if tf == 0:
                    continue
                matched = True
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                w = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
                score += int(round(w * 1_000_000))
            if matched:
                out[(qid, d)] = score
    return out


def test_bm25_matches_python_reference(spark):
    docs = {
        0: "the cat sat on the mat",
        1: "the dog chased the cat",
        2: "dogs and cats living together",
        3: "a completely unrelated document about spark",
        4: "cat cat cat repetition boosts term frequency",
    }
    queries = {0: "cat", 1: "dog spark", 2: "the cat sat"}
    ddf = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(qid, t) for qid, qt in queries.items() for t in qt.split()],
        "qid bigint, term string",
    )
    got = {
        (r["qid"], r["doc_id"]): r["score_micro"]
        for r in bm25_scores(ddf, qdf).collect()
    }
    assert got == _py_bm25(docs, queries)


def test_bm25_tf_saturation_and_idf_ordering(spark):
    """More repeats score higher but sub-linearly (k1 saturation); a rarer
    term outscores a common one at equal tf."""
    docs = [
        (0, "x a b c"),
        (1, "x x a b"),
        (2, "x x x a"),
        (3, "y a b c"),
        (4, "a b c d"),
        (5, "a b c d"),
    ]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "x"), (1, "y")], "qid bigint, term string")
    s = {
        (r["qid"], r["doc_id"]): r["score_micro"]
        for r in bm25_scores(ddf, qdf).collect()
    }
    assert s[(0, 0)] < s[(0, 1)] < s[(0, 2)]  # tf monotone
    gain1 = s[(0, 1)] - s[(0, 0)]
    gain2 = s[(0, 2)] - s[(0, 1)]
    assert gain2 < gain1  # saturating
    assert s[(1, 3)] > s[(0, 0)]  # df(y)=1 < df(x)=3 -> higher idf


def test_bm25_postings_pruned_and_broadcast(spark):
    """Scale shape (one-pass literal-terms path): the qterms/stats joins
    are broadcasts, and the corpus subtree is the checkpointed narrow
    (doc_id, dl, matched) relation — tokens filtered to query terms
    BEFORE any explode/shuffle, corpus tokenized exactly once."""
    docs = spark.createDataFrame([(i, f"term{i % 7} filler") for i in range(50)],
                                 ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "term1")], "qid bigint, term string")
    plan = bm25_scores(docs, qdf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2
    # both consumers read the checkpointed RDD, not a re-tokenized scan
    assert plan.count("Scan ExistingRDD [doc_id") + plan.count(
        "Scan ExistingRDD[doc_id"
    ) >= 2


def test_bm25_fallback_path_prunes_via_broadcast(spark, monkeypatch):
    """Past MAX_LITERAL_TERMS the plan must fall back to the two-pass
    shape: explode, then broadcast semi join on query terms before the tf
    aggregation (never a shuffle of the corpus vocabulary)."""
    import flink_sql_ai_meetingcoach_azure_spark.operators.text_search as ts

    monkeypatch.setattr(ts, "MAX_LITERAL_TERMS", 0)
    docs = spark.createDataFrame([(i, f"term{i % 7} filler") for i in range(50)],
                                 ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "term1")], "qid bigint, term string")
    scored = ts.bm25_scores(docs, qdf)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 3
    # same answer on both paths
    assert {(r.qid, r.doc_id, r.score_micro) for r in scored.collect()} == {
        (r.qid, r.doc_id, r.score_micro)
        for r in bm25_scores(docs, qdf).collect()
    }


def test_rrf_fusion_exact_and_rank_order(spark):
    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)], ["qid", "doc_id", "rank"])
    b = spark.createDataFrame([(0, 11, 1), (0, 12, 2)], ["qid", "doc_id", "rank"])
    out = {r["doc_id"]: (r["rrf_micro"], r["fused_rank"], r["n_lists"])
           for r in rrf_fuse(a, b, k=3).collect()}
    m = lambda r: int(round(1_000_000.0 / (60 + r)))  # noqa: E731
    assert out[11] == (m(2) + m(1), 1, 2)  # on both lists -> wins
    assert out[10] == (m(1), 2, 1)
    assert out[12] == (m(2), 3, 1)


def test_top_k_ranks_tiebreak_by_id(spark):
    scored = spark.createDataFrame(
        [(0, 5, 100), (0, 3, 100), (0, 9, 50)], ["qid", "doc_id", "score_micro"]
    )
    ranks = {r["doc_id"]: r["rank"] for r in top_k_ranks(scored, 3).collect()}
    assert ranks == {3: 1, 5: 2, 9: 3}


def test_nearest_centroid_assignment_and_tiebreak(spark):
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["centroid_id", "centroid"]
    )
    got = {r["vec_id"]: (r["cluster_id"], r["sim"])
           for r in assign_nearest_centroid(emb, cents).collect()}
    assert got[10] == (0, 1.0)
    assert got[11] == (1, 1.0)
    # equidistant -> lowest centroid id wins
    assert got[12][0] == 0 and abs(got[12][1] - round(1 / math.sqrt(2), 6)) < 1e-9


def test_cluster_balanced_sample_quota_and_determinism(spark):
    rows = [(i, i % 3, 0.5) for i in range(60)]
    assigned = spark.createDataFrame(rows, ["vec_id", "cluster_id", "sim"])
    out1 = cluster_balanced_sample(assigned, 5).collect()
    out2 = cluster_balanced_sample(assigned.repartition(7), 5).collect()
    per = {}
    for r in out1:
        per.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    assert all(len(v) == 5 for v in per.values()) and len(per) == 3
    assert {tuple(r) for r in out1} == {tuple(r) for r in out2}  # retry-stable


def test_mixture_sample_quota_per_domain(spark):
    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = mixture_sample(df, "doc_id", "source", scale=2.0).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by["big"]) == 20  # ceil(2*sqrt(100))
    assert sorted(by["small"]) == [1000, 1001, 1002, 1003]  # quota >= n keeps all
    # determinism under repartitioning
    out2 = mixture_sample(df.repartition(5), "doc_id", "source", scale=2.0).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_gopher_filter_reasons(spark):
    from flink_sql_ai_meetingcoach_azure_spark.functions.text_analysis import (
        gopher_filter_cols,
    )

    df = spark.createDataFrame(
        [
            (0, "a good plain document with several normal words here"),
            (1, "one two"),  # too few tokens
            (2, "!!! ??? ### $$$ %%%"),  # symbol heavy (and short)
            (3, "12345 67890 11111 22222 33333 44444"),  # digit heavy
        ],
        ["doc_id", "text"],
    )
    passes, reasons = gopher_filter_cols("text")
    got = {r["doc_id"]: (r["p"], r["r"]) for r in
           df.select("doc_id", passes.alias("p"), reasons.alias("r")).collect()}
    assert got[0] == (True, "")
    assert got[1] == (False, "too_few_tokens")
    assert "symbol_heavy" in got[2][1] and not got[2][0]
    assert "digit_heavy" in got[3][1] and not got[3][0]


def test_bm25_matches_python_reference_on_random_corpus(spark):
    """Seeded random corpus from a small vocabulary (forces shared terms,
    repeated terms, empty-ish docs) vs the pure-Python reference."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(15)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for d in range(60)
    }
    queries = {qid: " ".join(rng.sample(vocab, rng.randint(1, 3))) for qid in range(6)}
    ddf = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(qid, t) for qid, qt in queries.items() for t in qt.split()],
        "qid bigint, term string",
    )
    got = {
        (r["qid"], r["doc_id"]): r["score_micro"]
        for r in bm25_scores(ddf, qdf).collect()
    }
    assert got == _py_bm25(docs, queries)


def test_bm25_deterministic_under_repartitioning(spark):
    """Integer micro-point scores are partition-count-invariant — the
    reason floats were banned from the cross-row sums."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma") for i in range(40)], ["doc_id", "text"]
    )
    qdf = spark.createDataFrame(
        [(0, "alpha"), (0, "w1"), (1, "gamma")], "qid bigint, term string"
    )
    r1 = {(r["qid"], r["doc_id"]): r["score_micro"]
          for r in bm25_scores(docs, qdf).collect()}
    r2 = {(r["qid"], r["doc_id"]): r["score_micro"]
          for r in bm25_scores(docs.repartition(13), qdf).collect()}
    assert r1 == r2


def test_bm25_unmatched_and_empty_inputs(spark):
    """Terms absent from the corpus yield no rows (not nulls/crashes);
    an empty corpus yields an empty result."""
    docs = spark.createDataFrame([(0, "alpha beta"), (1, "beta gamma")],
                                 ["doc_id", "text"])
    qdf = spark.createDataFrame([(0, "nosuchterm")], "qid bigint, term string")
    assert bm25_scores(docs, qdf).count() == 0

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    qdf2 = spark.createDataFrame([(0, "alpha")], "qid bigint, term string")
    assert bm25_scores(empty, qdf2).count() == 0


def test_trained_centroids_feed_cluster_sampling(spark, sf_dir):
    """The IVF build's Lloyd k-means centroids slot directly into the
    clustering operators: train on the corpus, assign every embedding,
    draw the balanced sample — the SemDeDup curation loop end-to-end with
    TRAINED (not seeded) centroids."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (
        build_ivf_index,
    )

    _, centroids = build_ivf_index(emb, nlist=4, seed=1)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        ["centroid_id", "centroid"],
    )
    assigned = assign_nearest_centroid(emb, cents)
    assert assigned.count() == emb.count()  # total assignment
    sample = cluster_balanced_sample(assigned, 5)
    sizes = {r["cluster_id"]: r["n"] for r in
             sample.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 5 for n in sizes.values())
    assert len(sizes) >= 2  # trained centroids split the corpus


def test_lloyd_refine_shrinks_max_cell_share_vs_first_k(spark):
    """VERDICT r7 #2's acceptance test: on clustered/sorted input (the
    first-K failure mode — all K seeds land in one region), fixed-round
    Lloyd refinement shrinks the max-cell share. Three 30-point blobs,
    ids ordered so every seed starts inside blob one: seeded assignment
    puts ~86/90 points in one cell; two Lloyd rounds cut the max cell
    to ≤ 2/3 — the Σn_c² SemDeDup bound and IVF probe-latency win."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (
        lloyd_refine,
    )

    rows = []
    for i in range(30):
        rows.append((i, [0.001 * i, 0.0]))
    for i in range(30):
        rows.append((30 + i, [10.0, 0.001 * i]))
    for i in range(30):
        rows.append((60 + i, [0.001 * i, 10.0]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def max_share(iters):
        a, _ = lloyd_refine(emb, k=3, iters=iters)
        sizes = [r["count"] for r in a.groupBy("cid").count().collect()]
        return max(sizes) / sum(sizes)

    seeded, refined = max_share(0), max_share(2)
    assert seeded > 0.9  # first-K seeding is pathological here
    assert refined <= 2 / 3 + 1e-9
    assert refined < seeded


def test_lloyd_refine_hand_case_empty_cluster_and_exactness(spark):
    """Two well-separated blobs with BOTH seeds in blob one: after two
    rounds the assignment is the textbook separation; an all-identical
    corpus leaves cluster 1 empty and its centroid keeps the previous
    (seed) value — the pinned empty-cluster rule; empty input raises."""
    import pytest as _pytest

    from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (
        lloyd_refine,
    )

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [0.1, 0.0]),
            (2, [0.2, 0.0]),
            (3, [10.0, 10.0]),
            (4, [10.1, 10.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    assigned, cents = lloyd_refine(emb, k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}
    # exact-integer means: c0 = mean(0, .1, .2) = .1; c1 = mean(10, 10.1)
    assert cents[0] == [100000, 0] and cents[1] == [10050000, 10000000]

    same = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(4)], "vec_id bigint, embedding array<float>"
    )
    a2, c2 = lloyd_refine(same, k=2, iters=2)
    assert {r["cid"] for r in a2.collect()} == {0}  # id-ASC tie-break
    assert c2[1] == [1000000, 1000000]  # empty cluster kept its seed

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with _pytest.raises(ValueError, match="empty"):
        lloyd_refine(empty, k=2, iters=1)


def test_lloyd_refine_pinned_edges_k1_ragged_budget(spark):
    """ADVICE r8 pins: k=1 assigns everything to cluster 0 (no least());
    ragged vector widths raise up front instead of NULL-winning the
    argmin; k<1 and k*dim over the inline budget raise ValueError."""
    import pytest as _pytest

    from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (
        lloyd_refine,
    )

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [9.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    a, c = lloyd_refine(emb, k=1, iters=2)
    assert {r["cid"] for r in a.collect()} == {0}
    assert len(c) == 1  # centroid = exact-integer mean of all rows
    assert c[0] == [4666666, 1666666]

    ragged = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0])], "vec_id bigint, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="ragged"):
        lloyd_refine(ragged, k=2, iters=1)
    with _pytest.raises(ValueError, match="k must be"):
        lloyd_refine(emb, k=0, iters=1)
    with _pytest.raises(ValueError, match="budget"):
        lloyd_refine(emb, k=1_000_001, iters=1)  # k*dim = 2,000,002 > 2e6


def test_lloyd_assignment_paths_bit_identical(spark, monkeypatch):
    """The Arrow int64-matmul assignment (x·x - 2x·c + c·c, argmin
    first-min) must produce the SAME centroids and assignment as the
    inline-literal zip_with form on the same input — the expansion is
    exact integer math and np.argmin's first-occurrence rule equals the
    least(struct) cid-ASC tie-break. Includes deliberate exact ties."""
    from flink_sql_ai_meetingcoach_azure_spark.operators import clustering

    rows = [(i, [float((i * 7) % 13) - 6.0, float((i * 11) % 17) - 8.0,
                 float(i % 5)]) for i in range(60)]
    # exact-tie rows: equidistant from multiple refined centroids
    rows += [(100, [0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def run():
        a, c = clustering.lloyd_refine(emb, k=4, iters=2)
        return sorted((r["vec_id"], r["cid"]) for r in a.collect()), c

    monkeypatch.setattr(clustering, "INLINE_ASSIGN_BUDGET", 10**9)  # expr
    a_expr, c_expr = run()
    monkeypatch.setattr(clustering, "INLINE_ASSIGN_BUDGET", 0)  # numpy
    a_np, c_np = run()
    assert c_expr == c_np
    assert a_expr == a_np


def test_lloyd_oracle_division_is_exact_integer():
    """ADVICE r8 (medium): the unrolled oracle's centroid update must
    truncate EXACT integer sums — a DOUBLE-cast division rounds
    (sum=999999999*1e8-1, n=1e8 -> 999999999) and loses precision past
    2^53, silently breaking the bit-for-bit entry/oracle contract. Pin
    that the shipped SQL uses integer `//` (truncate-toward-zero on
    HUGEINT, matching _trunc_div) and that the exact form disagrees
    with the DOUBLE form at the adversarial magnitudes."""
    import duckdb

    from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (
        _trunc_div,
    )
    from flink_sql_ai_meetingcoach_azure_spark.queries import _sql_kmeans_refine

    sql = _sql_kmeans_refine()
    assert "// count(*)" in sql
    assert "AS DOUBLE" not in sql.split("WITH e AS")[0]  # update CTEs exact

    con = duckdb.connect()
    cases = [
        (999999999 * 10**8 - 1, 10**8),  # DOUBLE trunc gives 999999999
        (-(999999999 * 10**8 - 1), 10**8),  # sign: truncate toward zero
        (2**60 + 7, 3),  # beyond 2^53 — DOUBLE loses the low bits
        (-7, 2),
    ]
    for s, n in cases:
        (got,) = con.sql(
            f"SELECT CAST(CAST({s} AS HUGEINT) // {n} AS BIGINT)"
        ).fetchone()
        assert got == _trunc_div(s, n), (s, n)
    # and the old DOUBLE form is genuinely wrong on the first case
    (bad,) = con.sql(
        "SELECT CAST(trunc(CAST(99999999900000000 - 1 AS DOUBLE) / 100000000)"
        " AS BIGINT)"
    ).fetchone()
    assert bad != _trunc_div(999999999 * 10**8 - 1, 10**8)


def test_bm25_zero_and_null_terms_guarded(spark):
    """A query table with zero non-null terms (or only NULL terms) must
    short-circuit to an empty result through the join path — the inline
    InSet plan would otherwise build a degenerate no-argument isin()
    (ADVICE r6) — and NULL terms mixed with real ones must not match
    anything."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], ["doc_id", "text"]
    )
    empty_q = spark.createDataFrame([], "qid bigint, term string")
    assert bm25_scores(docs, empty_q).count() == 0

    null_q = spark.createDataFrame([(0, None)], "qid bigint, term string")
    assert bm25_scores(docs, null_q).count() == 0

    mixed = spark.createDataFrame(
        [(0, None), (0, "alpha")], "qid bigint, term string"
    )
    got = bm25_scores(docs, mixed).collect()
    assert [(r.qid, r.doc_id) for r in got] == [(0, 0)]


def test_phrase_search_overlaps_and_three_terms(spark):
    """Phrase pins: overlapping occurrences each count ('x x x' matches
    'x x' twice); first_pos is the 1-based token index; a 3-term phrase
    chains adjacency joins; docs without the full phrase (terms present
    but not adjacent) don't match; < 2 terms raises."""
    import pytest

    from flink_sql_ai_meetingcoach_azure_spark.operators.text_search import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "x x x y"),          # 'x x' twice (overlap), at pos 1
            (2, "y x z x"),          # terms present, never adjacent
            (3, "pad x x tail"),     # once, at pos 2
            (4, "a b c a b c"),      # 3-term phrase twice
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(docs, ["x", "x"]).collect()
    }
    assert got == {1: (2, 1), 3: (1, 2)}
    got3 = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(docs, ["a", "b", "c"]).collect()
    }
    assert got3 == {4: (2, 1)}
    with pytest.raises(ValueError):
        phrase_search(docs, ["solo"])
