"""Retrieval goldens that are meaningful under the hash-based mock
embeddings: identical text embeds to the identical vector (cosine 1.0), so
exact-match retrieval MUST rank that chunk first. (Semantic 'pricing
question finds pricing doc' goldens need a real embedding model — the mock
space is deliberately non-semantic; SURVEY §5.2.2's semantic replay is an
Azure-provider integration test.)"""

from __future__ import annotations

import json
import os

import pytest
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


# ---------------------------------------------------------------------------
# SEMANTIC goldens: the reference's demo concept ("perfect context at the
# perfect moment", sample-data/README.md) on its real 28-doc corpus, made
# assertable by the lexical hashing-TF mock (SemanticMockProvider) — no
# model dependency, fully deterministic.

REF_CORPUS = "/root/reference/sample-data/knowledge_base_markdown"

# trigger messages lifted from the reference's scripted demo call
# (sample-data/knowledge_base_markdown/sales_conversation_demo/
# sample_sales_call.md): competitor mention, pricing objection,
# implementation concern — the README's "Sample Triggers for System
# Response" categories.
# (message, acceptable top-3 docs): acceptance sets are the topically
# correct documents for the trigger — the competitor mention may surface
# either competitive-intelligence profile covering CloudCRM
GOLDENS = [
    (
        "We did get a demo from CloudCRM last week, and their AI features "
        "looked pretty advanced. How does your solution compare to theirs?",
        {"cloudcrm_competitive_profile.md", "competitor_analysis.md"},
    ),
    (
        "What about pricing? CloudCRM quoted us at $95 per user per month, "
        "plus implementation fees. That seems expensive for our budget.",
        {"pricing_objection_playbook.md", "price_objection_battlecard.md"},
    ),
    (
        "I'm concerned about implementation time. Our last CRM migration "
        "took almost 6 months, and it was painful. We can't afford that "
        "kind of disruption again.",
        {"implementation_concerns_playbook.md"},
    ),
]


@pytest.mark.skipif(not os.path.isdir(REF_CORPUS), reason="reference corpus absent")
def test_semantic_goldens_on_reference_corpus(spark):
    from flink_sql_ai_meetingcoach_azure_spark.models.providers import SemanticMockProvider
    from flink_sql_ai_meetingcoach_azure_spark.models.registry import ModelRegistry
    from flink_sql_ai_meetingcoach_azure_spark.sources.documents import load_markdown_corpus

    reg = ModelRegistry()
    provider = SemanticMockProvider(dim=256)
    reg.register_embedding("openaiembed", provider)
    reg.register_text_generation("coaching_response_generator", provider)

    # the demo-script directory is conversation material, not knowledge
    corpus = load_markdown_corpus(spark, REF_CORPUS).filter(
        F.col("document_category") != "sales_conversation_demo"
    )
    assert corpus.count() == 28  # the documented 28-doc knowledge base
    index = build_knowledge_index(corpus, reg).cache()

    msgs = spark.createDataFrame(
        [(m, "prospect") for m, _ in GOLDENS], ["message", "speaker"]
    )
    out = coaching_pipeline(msgs, index, reg, k=3).collect()
    got = {r["message"]: json.loads(r["rag_results_string"]) for r in out}
    for message, acceptable in GOLDENS:
        top_docs = [hit["document_id"].rsplit("/", 1)[-1] for hit in got[message]]
        # the TOP hit must be a topically correct document for the trigger
        assert top_docs[0] in acceptable, (message[:50], top_docs)


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
