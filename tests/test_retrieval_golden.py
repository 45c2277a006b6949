"""Retrieval goldens that are meaningful under the hash-based mock
embeddings: identical text embeds to the identical vector (cosine 1.0), so
exact-match retrieval MUST rank that chunk first. (Semantic 'pricing
question finds pricing doc' goldens need a real embedding model — the mock
space is deliberately non-semantic; SURVEY §5.2.2's semantic replay is an
Azure-provider integration test.)"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.models import default_registry
from flink_sql_ai_meetingcoach_azure_spark.plans import (
    build_knowledge_index,
    coaching_pipeline,
)


def _corpus(spark):
    cats = ["pricing", "competitors", "implementation", "security", "integrations"]
    rows = []
    for c in cats:
        for i in range(3):
            rows.append(
                (f"{c}/doc{i}.md", f"doc{i}.md", c,
                 f"The {c} guide section {i} ### covers {c} topic {i} in detail "
                 f"### unique marker {c}-{i}.")
            )
    return spark.createDataFrame(
        rows, ["document_id", "document_name", "document_category", "document_text"]
    )


def test_exact_chunk_text_ranks_first(spark):
    reg = default_registry(dim=64)
    index = build_knowledge_index(_corpus(spark), reg).cache()
    # take three real chunks and query with their exact text
    chunks = index.select("document_id", "chunks").limit(3).collect()
    msgs = spark.createDataFrame(
        [(c["chunks"], "prospect") for c in chunks], ["message", "speaker"]
    )
    out = coaching_pipeline(msgs, index, reg, k=3).collect()
    got = {r["message"]: json.loads(r["rag_results_string"]) for r in out}
    for c in chunks:
        top = got[c["chunks"]][0]
        assert top["chunks"] == c["chunks"]
        assert top["document_id"] == c["document_id"]


def test_both_search_methods_agree_on_goldens(spark):
    reg = default_registry(dim=64)
    index = build_knowledge_index(_corpus(spark), reg).cache()
    chunks = index.select("chunks").limit(5).collect()
    msgs = spark.createDataFrame(
        [(c["chunks"], "prospect") for c in chunks], ["message", "speaker"]
    )
    a = {r["message"]: r["rag_results_string"]
         for r in coaching_pipeline(msgs, index, reg, search_method="numpy").collect()}
    b = {r["message"]: r["rag_results_string"]
         for r in coaching_pipeline(msgs, index, reg, search_method="sql").collect()}
    for m in a:
        assert json.loads(a[m])[0] == json.loads(b[m])[0], m
