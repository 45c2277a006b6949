"""Span-level (exact-substring) dedup: constructed-corpus semantics."""

import pyspark.sql.functions as F
import pytest

from flink_sql_ai_meetingcoach_azure_spark.operators.spans import (
    dup_span_stats,
    duplicated_span_hashes,
    span_dup_pairs,
    span_postings,
)

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # docs 1 and 2 share an 8-token verbatim passage mid-document
        (1, f"one unique prefix {SHARED} and a unique tail here"),
        (2, f"totally different opening {SHARED} closing words differ too"),
        # doc 3: no overlap with anyone
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        # doc 4: shorter than the window — must emit no spans at all
        (4, "too short for any span"),
        # doc 5: repeats doc 3's full text verbatim (every span shared)
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_count_and_short_doc(corpus):
    posts = span_postings(corpus, "doc_id", "text", window=8)
    per_doc = {
        r["id"]: r["n"]
        for r in posts.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    # n_tokens - window + 1 spans per doc; doc 4 (5 tokens) emits none
    assert per_doc[1] == 16 - 8 + 1  # doc 1 has 16 tokens
    assert per_doc[3] == 12 - 8 + 1  # doc 3 has 12 tokens
    assert 4 not in per_doc


def test_stats_flag_shared_passage(corpus):
    stats = {
        r["doc_id"]: r.asDict()
        for r in dup_span_stats(corpus, "doc_id", "text", window=8).collect()
    }
    # the shared 8-token passage is exactly ONE window of each carrier doc
    assert stats[1]["n_dup_spans"] == 1
    assert stats[2]["n_dup_spans"] == 1
    # verbatim-duplicate docs 3 and 5: every span duplicated, ratio = 1.0
    assert stats[3]["n_dup_spans"] == stats[3]["n_spans"] == 5
    assert stats[3]["dup_ratio_micro"] == 1_000_000
    assert stats[5]["dup_ratio_micro"] == 1_000_000
    # the short doc reports a 0/0/0 profile, not an absent row
    assert stats[4] == {
        "doc_id": 4,
        "n_spans": 0,
        "n_dup_spans": 0,
        "dup_ratio_micro": 0,
    }


def test_duplicated_span_hashes(corpus):
    posts = span_postings(corpus, "doc_id", "text", window=8)
    dup = duplicated_span_hashes(posts).collect()
    # the shared passage (1 window in each of docs 1/2) + doc 3≡5's five
    # windows = 6 distinct cross-doc hashes, each occurring exactly twice
    assert len(dup) == 6
    assert all(r["n_occurrences"] == 2 for r in dup)


def test_pairs_and_doc_freq_cap(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared_spans"]
        for r in span_dup_pairs(corpus, "doc_id", "text", window=8).collect()
    }
    assert pairs == {(1, 2): 1, (3, 5): 5}
    # a cap below the duplicate pair's doc frequency removes those spans
    # from the JOIN (stats still count them — the cap bounds pair blowup)
    capped = span_dup_pairs(corpus, "doc_id", "text", window=8, max_doc_freq=1)
    assert capped.count() == 0


def test_sub_window_repeat_not_flagged(spark):
    # a 7-token shared substring has no full 8-token window: by design the
    # fixed-window form cannot see sub-window repeats (suffix-array tradeoff)
    seven = "a b c d e f g"
    df = spark.createDataFrame(
        [(1, f"x1 y1 z1 {seven} p1 q1"), (2, f"x2 y2 z2 {seven} p2 q2")],
        ["doc_id", "text"],
    )
    assert span_dup_pairs(df, "doc_id", "text", window=8).count() == 0
    stats = dup_span_stats(df, "doc_id", "text", window=8)
    assert stats.agg(F.sum("n_dup_spans")).first()[0] == 0


# ---- score-tiered (CCNet-style) resampling ----


def test_score_tiered_sample_tiers_and_rates(spark):
    from flink_sql_ai_meetingcoach_azure_spark.operators.sampling import (
        N_BUCKETS,
        hash_bucket_col,
        score_tiered_sample,
    )

    df = spark.createDataFrame(
        [(i, (i - 1) // 30 * 10 + i % 7) for i in range(1, 91)], ["id", "sc"]
    )
    out = score_tiered_sample(df, "id", "sc", rates=(1.0, 1.0, 1.0)).collect()
    # with all-1.0 rates nothing is dropped and tiers are a partition
    assert len(out) == 90
    tiers = {r["id"]: r["tier"] for r in out}
    by_tier = {t: [i for i, tt in tiers.items() if tt == t] for t in (0, 1, 2)}
    # tier sizes are CDF thirds up to score-group granularity
    assert sum(len(v) for v in by_tier.values()) == 90
    assert all(len(v) > 0 for v in by_tier.values())
    # better scores never land in a worse tier
    scores = {r["id"]: r["sc"] for r in df.collect()}
    for t_good, t_bad in ((0, 1), (1, 2)):
        assert min(scores[i] for i in by_tier[t_good]) >= max(
            scores[i] for i in by_tier[t_bad]
        )

    # with a 0-rate tail, every admitted row is from tiers 0/1, and the
    # admitted set is exactly the hash-bucket rule (deterministic)
    out2 = score_tiered_sample(df, "id", "sc", rates=(1.0, 0.5, 0.0)).collect()
    assert all(r["tier"] in (0, 1) for r in out2)
    expected_t1 = {
        r["id"]
        for r in df.withColumn("b", hash_bucket_col("id", "tier")).collect()
        if tiers[r["id"]] == 1 and r["b"] < int(0.5 * N_BUCKETS)
    }
    assert {r["id"] for r in out2 if r["tier"] == 1} == expected_t1
    # replay-determinism
    out3 = score_tiered_sample(df, "id", "sc", rates=(1.0, 0.5, 0.0)).collect()
    assert sorted(r["id"] for r in out3) == sorted(r["id"] for r in out2)


def test_score_tiered_sample_empty_input(spark):
    from flink_sql_ai_meetingcoach_azure_spark.operators.sampling import (
        score_tiered_sample,
    )

    df = spark.createDataFrame([(1, 5)], ["id", "sc"]).filter("id < 0")
    out = score_tiered_sample(df, "id", "sc")
    assert out.count() == 0
    assert out.columns == ["sc", "id", "tier"]


def test_mask_dup_spans_removes_shared_passage_only(spark):
    """The rewrite half: a verbatim 10-token passage shared by two docs
    is removed from BOTH; unique text survives in order; a doc with no
    cross-doc span is untouched (modulo token normalization); short
    docs pass through whole."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.spans import mask_dup_spans

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, f"intro one two three {passage} outro four five six"),
            (2, f"{passage} completely different tail content here"),
            (3, "no shared content in this document at all whatsoever"),
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in mask_dup_spans(docs, "doc_id", "text", window=8).collect()
    }
    # doc 1: the 10 passage tokens removed, frame kept in order
    assert out[1][2] == "intro one two three outro four five six"
    assert out[1][1] == 10
    # doc 2: passage gone, tail kept
    assert out[2][2] == "completely different tail content here"
    assert out[2][1] == 10
    # doc 3: untouched (token-normalized join)
    assert out[3][1] == 0
    assert out[3][2] == "no shared content in this document at all whatsoever"
    # doc 4: shorter than the window — no spans, nothing removed
    assert out[4] == (2, 0, "tiny doc")


def test_mask_dup_spans_keeps_within_doc_repeats(spark):
    """A span repeated INSIDE one document (min(id) == max(id) over the
    hash partition) is not cross-doc duplicated and must survive — the
    edge the one-pass min/max-window rewrite has to preserve exactly."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.spans import mask_dup_spans

    rep = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, f"{rep} middle words {rep}"), (2, "entirely unrelated other text")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_removed, r.clean_text)
        for r in mask_dup_spans(docs, "doc_id", "text", window=8).collect()
    }
    assert out[1] == (0, f"{rep} middle words {rep}")
    assert out[2][0] == 0
