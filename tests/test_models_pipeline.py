"""Model registry + mock provider + end-to-end coaching pipeline
(the reference's smoke test, SURVEY.md §7.1)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.text import parse_coaching_response
from flink_sql_ai_meetingcoach_azure_spark.models import default_registry
from flink_sql_ai_meetingcoach_azure_spark.models.providers import (
    MockProvider,
    mock_embedding,
)
from flink_sql_ai_meetingcoach_azure_spark.plans import (
    build_knowledge_index,
    coaching_pipeline,
)
from flink_sql_ai_meetingcoach_azure_spark.plans.coaching import filter_prospect


def test_mock_embedding_deterministic_unit_norm():
    a = mock_embedding("hello", dim=64)
    b = mock_embedding("hello", dim=64)
    c = mock_embedding("other", dim=64)
    assert a == b and a != c and len(a) == 64
    assert abs(sum(v * v for v in a) - 1.0) < 1e-6


def test_mock_provider_batches():
    p = MockProvider(dim=32)
    embs = p.embed(["x", None, "y"])
    assert len(embs) == 3 and all(len(e) == 32 for e in embs)
    gens = p.generate(["## PROSPECT MESSAGE: hi\n\n## RAG DOCUMENTS:\nDocument 1: d/a.md\nchunk text\n\n"])
    payload = json.loads(gens[0].replace("```json", "").replace("```", ""))
    assert payload["sources"][0]["document_id"] == "d/a.md"
    assert "suggested_response" in payload and "reasoning" in payload


def test_registry_ml_predict(spark):
    reg = default_registry(dim=16)
    df = spark.createDataFrame([("hello",), ("world",)], ["message"])
    out = reg.ml_predict(df, "openaiembed", "message", "embedding")
    rows = out.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    # determinism across invocations (same text -> same vector)
    again = reg.ml_predict(df, "openaiembed", "message", "embedding").collect()
    assert [r["embedding"] for r in rows] == [r["embedding"] for r in again]


def test_registry_unknown_model():
    import pytest

    reg = default_registry(dim=8)
    with pytest.raises(KeyError):
        reg.get("nope")


# --- the reference's smoke scenario (generate_personalized_commands.sh:529-545)

_DOC = (
    "Pricing Objection Playbook ### When a prospect raises pricing concerns, "
    "acknowledge the concern, reframe around value and ROI, and offer a "
    "tailored cost breakdown. ### Flexible payment plans are available."
)


def _knowledge(spark):
    return spark.createDataFrame(
        [("objection_response_playbooks/pricing_objection_playbook.md",
          "pricing_objection_playbook.md", "objection_response_playbooks", _DOC),
         ("product_info/overview.md", "overview.md", "product_info",
          "Our product is a streaming analytics platform ### built on open standards.")],
        ["document_id", "document_name", "document_category", "document_text"],
    )


def test_end_to_end_smoke(spark):
    reg = default_registry(dim=64)
    index = build_knowledge_index(_knowledge(spark), reg)
    # index schema = knowledge_embeddings_chunked (document_id, chunks, embedding)
    assert index.columns == ["document_id", "chunks", "embedding"]
    msgs = spark.createDataFrame(
        [("I am interested in your product but I am concerned about the pricing.",
          "prospect"),
         ("Let me pull up the pricing sheet.", "salesperson")],
        ["message", "speaker"],
    )
    out = coaching_pipeline(msgs, index, reg).collect()
    # salesperson row filtered out (P3)
    assert len(out) == 1
    row = out[0]
    assert row["message"].startswith("I am interested")
    rag = json.loads(row["rag_results_string"])
    assert len(rag) == 3
    assert all(set(r) == {"document_id", "chunks"} for r in rag)
    # generated response parses through the cleanup parser (F14)
    df = spark.createDataFrame([(row["coaching_response"],)], ["raw"])
    parsed = df.select(parse_coaching_response("raw").alias("p")).head()["p"]
    assert parsed["suggested_response"]
    assert len(parsed["sources"]) == 3


def test_chunk_dedup_before_embed(spark):
    """Identical chunk text across documents is embedded once and re-joined
    (SURVEY §4.2 chunk-dedup rewrite)."""
    reg = default_registry(dim=16)
    k = spark.createDataFrame(
        [("a", "same ### text"), ("b", "same ### text")],
        ["document_id", "document_text"],
    )
    out = build_knowledge_index(k, reg, dedup_chunks=True)
    rows = out.collect()
    assert len(rows) == 2  # both splits merge into one chunk per doc
    by_chunk = {}
    for r in rows:
        by_chunk.setdefault(r["chunks"], set()).add(tuple(r["embedding"]))
    assert all(len(v) == 1 for v in by_chunk.values())


def test_filter_prospect(spark):
    df = spark.createDataFrame(
        [("m1", "prospect"), ("m2", "salesperson")], ["message", "speaker"]
    )
    assert [r["message"] for r in filter_prospect(df).collect()] == ["m1"]
