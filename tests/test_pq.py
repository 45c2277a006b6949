"""Product quantization: encode parity, ADC-vs-reconstruction, recall."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (
    PQ_D2_ROUND,
    pq_codebooks_from_rows,
    pq_encode,
    train_pq_codebooks,
    vector_search_topk_pq,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (
    vector_search_topk_flat,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _py_encode(x, cb):
    """Independent reference encoder: per subspace, nearest centroid by
    9-dp-rounded squared L2, lowest index on ties — plain Python loops."""
    m, ksub, dsub = cb.shape
    codes = []
    for j in range(m):
        xs = x[j * dsub : (j + 1) * dsub]
        best, best_d = 0, None
        for c in range(ksub):
            d2 = round(float(((xs - cb[j][c]) ** 2).sum()), PQ_D2_ROUND)
            if best_d is None or d2 < best_d:
                best, best_d = c, d2
        codes.append(best)
    return codes


def test_encode_matches_python_reference(emb):
    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, cb, "embedding").select("vec_id", "pq_code").collect()
    }
    raw = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.select("vec_id", "embedding").collect()}
    for vid, x in raw.items():
        assert got[vid] == _py_encode(x, cb), f"vec {vid}"


def test_adc_equals_explicit_reconstruction(emb):
    """ADC LUT scoring must equal cosine(query, materialized
    reconstruction) after the 6-dp round — the property the SQL oracle
    checks end-to-end; here pinned directly in numpy."""
    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    hits = vector_search_topk_pq(
        queries, emb.select("vec_id", "embedding"), cb, k=3,
        payload_cols=["vec_id"],
    ).collect()
    raw = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.select("vec_id", "embedding").collect()}
    m, ksub, dsub = cb.shape
    for h in hits:
        recon = np.concatenate(
            [cb[j][_py_encode(raw[h["vec_id"]], cb)[j]] for j in range(m)]
        )
        q = raw[h["qid"]]
        expect = round(
            float(q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon))), 6
        )
        assert abs(h["similarity"] - expect) < 1e-9


def test_trained_codebooks_recall(emb):
    """k-means codebooks: recall@3 vs exact flat search at m=16 (16×
    compression). PQ is lossy by design and the synthetic embeddings are
    near-structureless (PQ's worst case); the bound asserts the codebooks
    are actually trained — random 3-of-n overlap would be ~0.09."""
    cb = train_pq_codebooks(emb.select("embedding"), "embedding", m=16, ksub=16)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    index = emb.select("vec_id", "embedding")
    pq_hits = vector_search_topk_pq(
        queries, index, cb, k=3, payload_cols=["vec_id"]
    ).collect()
    exact_hits = vector_search_topk_flat(
        queries, index, k=3, payload_cols=["vec_id"]
    ).collect()
    pq_sets: dict[int, set] = {}
    exact_sets: dict[int, set] = {}
    for h in pq_hits:
        pq_sets.setdefault(h["qid"], set()).add(h["vec_id"])
    for h in exact_hits:
        exact_sets.setdefault(h["qid"], set()).add(h["vec_id"])
    hits = sum(len(pq_sets[q] & exact_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.5, f"recall@3 {hits}/{total}"


def test_determinism_across_runs(emb):
    cb1 = train_pq_codebooks(emb.select("embedding"), "embedding", m=8, ksub=16)
    cb2 = train_pq_codebooks(emb.select("embedding"), "embedding", m=8, ksub=16)
    assert np.array_equal(cb1, cb2)
    c1 = pq_encode(emb, cb1, "embedding").select("pq_code").collect()
    c2 = pq_encode(emb, cb1, "embedding").select("pq_code").collect()
    assert [list(r[0]) for r in c1] == [list(r[0]) for r in c2]


def test_ivfpq_exact_at_full_probe_and_pruned_scan(spark, emb, tmp_path):
    """IVF-PQ at nprobe == nlist must reproduce flat PQ exactly, and the
    probe's index scan must PRUNE partitions, not filter rows."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (
        build_ivfpq_index,
        vector_search_ivfpq_parquet,
        write_ivfpq_index,
    )
    from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (
        ivf_pruned_scan,
    )

    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    enc, centroids, cb = build_ivfpq_index(
        emb.select("vec_id", "embedding"), "embedding", nlist=4, codebooks=cb
    )
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(enc, centroids, cb, path)

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    ivfpq = {
        (r["qid"], r["search_rank"]): (r["vec_id"], r["similarity"])
        for r in vector_search_ivfpq_parquet(
            queries, path, k=3, nprobe=4, payload_cols=["vec_id"]
        ).collect()
    }
    flat = {
        (r["qid"], r["search_rank"]): (r["vec_id"], r["similarity"])
        for r in vector_search_topk_pq(
            queries, emb.select("vec_id", "embedding"), cb, k=3,
            payload_cols=["vec_id"],
        ).collect()
    }
    assert ivfpq == flat and len(ivfpq) == 8 * 3

    plan = ivf_pruned_scan(spark, path, [0, 2])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters", 1)[1][:200]

    # nprobe < nlist reads fewer cells and stays a subset of valid ids
    some = vector_search_ivfpq_parquet(
        queries, path, k=3, nprobe=1, payload_cols=["vec_id"]
    )
    assert 0 < some.count() <= 8 * 3


def test_ivfpq_zero_queries(spark, emb, tmp_path):
    from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (
        build_ivfpq_index,
        vector_search_ivfpq_parquet,
        write_ivfpq_index,
    )

    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    enc, centroids, cb = build_ivfpq_index(
        emb.select("vec_id", "embedding"), "embedding", nlist=2, codebooks=cb
    )
    path = str(tmp_path / "ivfpq0")
    write_ivfpq_index(enc, centroids, cb, path)
    none = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = vector_search_ivfpq_parquet(none, path, k=3, payload_cols=["vec_id"])
    assert out.count() == 0


def test_pq_and_quantized_empty_index(spark, emb):
    from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (
        vector_search_topk_quantized,
    )

    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    none = emb.filter(F.col("vec_id") < 0).select("vec_id", "embedding")
    for fn in (
        lambda: vector_search_topk_pq(queries, none, cb, k=3, payload_cols=["vec_id"]),
        lambda: vector_search_topk_quantized(queries, none, k=3, payload_cols=["vec_id"]),
    ):
        out = fn()
        assert out.count() == 0
        assert "similarity" in out.columns and "search_rank" in out.columns


def test_ivfpq_query_side_collect_guarded(spark, emb, tmp_path):
    """The IVF-PQ probe driver-collects and broadcasts the QUERY table
    (with per-query LUTs); past max_query_rows it must raise the
    actionable IndexTooLargeError instead of OOMing the driver (VERDICT
    r6 #3) — and the limit rides the collect job itself. An explicit
    max_query_rows=None opts out."""
    import pytest

    from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (
        build_ivfpq_index,
        vector_search_ivfpq_parquet,
        write_ivfpq_index,
    )
    from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (
        IndexTooLargeError,
    )

    cb = pq_codebooks_from_rows(emb, "vec_id", "embedding", m=8, ksub=16)
    enc, centroids, cb = build_ivfpq_index(
        emb.select("vec_id", "embedding"), "embedding", nlist=2, codebooks=cb
    )
    path = str(tmp_path / "ivfpq_guard")
    write_ivfpq_index(enc, centroids, cb, path)

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    with pytest.raises(IndexTooLargeError, match="max_query_rows"):
        vector_search_ivfpq_parquet(
            queries, path, k=3, payload_cols=["vec_id"], max_query_rows=4
        )
    # at or under the bound (and with the guard disabled) results flow
    ok = vector_search_ivfpq_parquet(
        queries, path, k=3, nprobe=2, payload_cols=["vec_id"], max_query_rows=8
    )
    unguarded = vector_search_ivfpq_parquet(
        queries, path, k=3, nprobe=2, payload_cols=["vec_id"], max_query_rows=None
    )
    assert ok.count() == unguarded.count() == 8 * 3
