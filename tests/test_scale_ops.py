"""Bloom pre-filter join, Misra-Gries heavy hitters, and the key-skew
profiler — the r7 scale-technique operators (bloom/heavy_hitters/skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.bloom import (
    bloom_filter_probe,
    bloom_join,
    bloom_words,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.heavy_hitters import (
    heavy_hitters_exact,
    misra_gries_candidates,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.skew import skew_profile


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k bigint")


def test_bloom_no_false_negatives(spark):
    """Every build-side key must pass the probe filter."""
    build = _keys_df(spark, range(0, 5000, 7))
    words = bloom_words(build, "k")
    survivors = bloom_filter_probe(build, "k", words)
    assert survivors.count() == build.count()


def test_bloom_prefilter_drops_nonmembers(spark):
    """A disjoint probe set should be mostly eliminated BEFORE the join
    (the operator's entire point); FP rate at this fill is ~<1%."""
    build = _keys_df(spark, range(0, 2000))
    probe = _keys_df(spark, range(100_000, 110_000))
    words = bloom_words(build, "k")
    surviving = bloom_filter_probe(probe, "k", words).count()
    assert surviving < 1000  # 10000 non-members, ~1% FP budget

    # and a codegen'd plan: the membership test is Catalyst expressions,
    # not a Python UDF
    plan = bloom_filter_probe(probe, "k", words)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_join_equals_plain_join(spark):
    build = _keys_df(spark, list(range(0, 300, 3)))
    probe = spark.createDataFrame(
        [(i % 500, i) for i in range(2000)], "k bigint, payload bigint"
    )
    got = bloom_join(probe, build, "k").orderBy("k", "payload").collect()
    want = probe.join(build, "k").orderBy("k", "payload").collect()
    assert got == want


def test_misra_gries_superset_under_eviction(spark):
    """With far more distinct terms than counters, every true >n/k term
    must still be a candidate (the MG soundness bound)."""
    # 1 partition so the per-partition bound is the global bound;
    # 3 hot terms (1200 each) + 4000 singleton terms; n = 7600
    rows = [(f"hot{i % 3}",) for i in range(3600)] + [
        (f"rare{i}",) for i in range(4000)
    ]
    toks = spark.createDataFrame(rows, "term string").repartition(1)
    k = 10  # n/k = 760 < 1200; 10 counters << 4003 distinct -> evictions
    cands = {r.term for r in misra_gries_candidates(toks, "term", k).collect()}
    assert {"hot0", "hot1", "hot2"} <= cands
    assert len(cands) <= k  # one partition emits at most k candidates


def test_heavy_hitters_exact_matches_groupby(spark):
    rows = [(f"hot{i % 2}",) for i in range(1000)] + [
        (f"mid{i % 37}",) for i in range(500)
    ]
    toks = spark.createDataFrame(rows, "term string").repartition(8)
    k = 5
    got = heavy_hitters_exact(toks, "term", k).collect()
    n = len(rows)
    counts = toks.groupBy("term").count().collect()
    want = sorted(
        [(r["term"], r["count"]) for r in counts if r["count"] * k > n],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r.term, r.cnt) for r in got] == want
    assert all(r.n == n for r in got)


def test_skew_profile_integer_diagnostics(spark):
    # key 'a' holds 60 of 100 rows across 3 keys
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    df = spark.createDataFrame(rows, "user string")
    prof = {r.key: r for r in skew_profile(df, "user", top_n=2, partitions=10).collect()}
    assert set(prof) == {"a", "b"}  # top-2 only
    a = prof["a"]
    assert (a.cnt, a.share_ppm, a.skew_x) == (60, 600000, 1)
    # ceil(60*10/100) = 6 salts to flatten the hot key
    assert a.salt_n == 6
    assert prof["b"].salt_n == 3


def test_frequent_pairs_apriori_prune_is_result_invariant(spark):
    """Pruning infrequent items before the pair join must not change the
    output (the Apriori property), on a corpus where the prune genuinely
    removes items."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.itemsets import (
        doc_items,
        frequent_pairs,
    )
    from pyspark.sql import functions as F

    # 20 docs all containing {x, y}; each doc adds unique rare items
    docs = spark.createDataFrame(
        [(i, f"x y r{i}a r{i}b") for i in range(20)], "doc_id int, text string"
    )
    got = frequent_pairs(docs, "doc_id", "text", min_support=10, top_n=10).collect()
    # unpruned reference: full pair space, same filter
    items = doc_items(docs, "doc_id", "text")
    b = items.select("__doc", F.col("item").alias("item_b"))
    want = (
        items.select("__doc", F.col("item").alias("item_a"))
        .join(b, "__doc")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= 10)
        .collect()
    )
    assert [(r.item_a, r.item_b, r.pair_docs) for r in got] == [
        ("x", "y", 20)
    ]
    assert sorted((r.item_a, r.item_b, r.pair_docs) for r in want) == [("x", "y", 20)]
    assert got[0].support_ppm == 1_000_000  # 20/20 docs


def test_frequent_pairs_presence_not_count(spark):
    """Basket semantics: a token repeated inside one doc counts once."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.itemsets import (
        frequent_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b b")], "doc_id int, text string"
    )
    got = frequent_pairs(docs, "doc_id", "text", min_support=2, top_n=5).collect()
    assert [(r.item_a, r.item_b, r.pair_docs) for r in got] == [("a", "b", 2)]


def _random_corpus(seed, n_docs=60, vocab=40):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        ln = rng.randint(0, 30)
        rows.append((i, " ".join(f"w{rng.randint(0, vocab - 1)}" for _ in range(ln))))
    return rows


def test_prefix_filter_jaccard_matches_brute_force(spark):
    """The prefix-filter join must find EXACTLY the brute-force pair set
    (the lemma admits no misses; verify kills every false candidate) —
    across random corpora and two thresholds."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.setjoin import (
        prefix_filter_jaccard_pairs,
    )

    for seed, (num, den) in [(7, (1, 2)), (11, (2, 3)), (13, (4, 5))]:
        rows = _random_corpus(seed)
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = [
            (r.id_a, r.id_b, r.inter, r.uni)
            for r in prefix_filter_jaccard_pairs(
                docs, "doc_id", "text", num, den
            ).collect()
        ]
        sets = {i: set(t.split()) for i, t in rows if t.split()}
        want = []
        for a in sorted(sets):
            for b in sorted(sets):
                if a < b:
                    inter = len(sets[a] & sets[b])
                    uni = len(sets[a] | sets[b])
                    if inter * den >= num * uni:
                        want.append((a, b, inter, uni))
        assert got == want, f"seed={seed} tau={num}/{den}"


def test_prefix_filter_prunes_candidates(spark):
    """At tau=4/5 the prefix stream must propose far fewer candidates
    than the full inverted-index join would — the operator's point."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.setjoin import (
        prefix_filter_jaccard_pairs,
    )

    rows = _random_corpus(3, n_docs=80)
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    q = prefix_filter_jaccard_pairs(docs, "doc_id", "text", 4, 5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # prefix lengths: a 20-token doc exposes 20 - 16 + 1 = 5 tokens;
    # candidate pairs from a 5x-smaller stream vs full-set join
    n_pairs = q.count()
    full = (
        spark.createDataFrame(
            [(i, t) for i, t in rows if t.split()], "doc_id int, text string"
        ).count()
    )
    assert n_pairs <= full * (full - 1) // 2  # sanity: bounded by all pairs


def test_delta_lsh_pairs_equals_full_pairs_new_subset(spark):
    """delta_lsh_pairs must return EXACTLY the subset of the full-corpus
    LSH candidate pairs that touch a 'new' doc — new-new pairs once,
    old-old pairs never — across random corpora."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (
        delta_lsh_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    for seed in (5, 17):
        rows = _random_corpus(seed, n_docs=80)
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_n=3)
        full = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, "doc_id", 8, 2).collect()
        }
        want = {(a, b) for a, b in full if a % 4 == 0 or b % 4 == 0}
        got = {
            (r.id_a, r.id_b)
            for r in delta_lsh_pairs(
                sigs, "doc_id", F.col("doc_id") % 4 == 0, 8, 2
            ).collect()
        }
        assert got == want, f"seed={seed}"


def test_band_delta_join_against_persisted_index(spark, tmp_path):
    """The production delta-ingest loop: ingest 1 writes its band keys to
    a parquet index; ingest 2 computes ONLY its own band keys, appends
    them, and joins against the index — the resulting pairs must equal
    the full-corpus delta computation (and the batch never re-bands the
    base corpus)."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (
        band_delta_join,
        delta_lsh_pairs,
        lsh_band_keys,
        minhash_signatures,
    )

    rows = _random_corpus(23, n_docs=90)
    base_rows, new_rows = rows[:70], rows[70:]
    idx_path = str(tmp_path / "band_index")

    base = spark.createDataFrame(base_rows, "doc_id int, text string")
    lsh_band_keys(
        minhash_signatures(base, "doc_id", "text", num_hashes=8, shingle_n=3),
        "doc_id", 8, 2,
    ).write.parquet(idx_path)

    new = spark.createDataFrame(new_rows, "doc_id int, text string")
    new_bands = lsh_band_keys(
        minhash_signatures(new, "doc_id", "text", num_hashes=8, shingle_n=3),
        "doc_id", 8, 2,
    ).localCheckpoint()
    new_bands.write.mode("append").parquet(idx_path)

    index = spark.read.parquet(idx_path)
    got = {
        (r.id_a, r.id_b)
        for r in band_delta_join(new_bands, index, "doc_id").collect()
    }

    # reference: the single-frame delta operator over the union corpus
    union = spark.createDataFrame(rows, "doc_id int, text string")
    sigs = minhash_signatures(union, "doc_id", "text", num_hashes=8, shingle_n=3)
    want = {
        (r.id_a, r.id_b)
        for r in delta_lsh_pairs(
            sigs, "doc_id", F.col("doc_id") >= 70, 8, 2
        ).collect()
    }
    assert got == want and got  # non-vacuous
