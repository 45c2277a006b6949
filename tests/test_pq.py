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
