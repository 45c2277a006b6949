"""SQL surface: the reference's Flink SQL statements ported ~1:1 into
spark.sql (generate_personalized_commands.sh:315-433 shapes)."""

from __future__ import annotations

import json

from flink_sql_ai_meetingcoach_azure_spark.models import default_registry
from flink_sql_ai_meetingcoach_azure_spark.sqlapi import (
    register_engine_sql,
    register_vector_search_view,
)


def test_chunk_embed_ingest_statement(spark):
    """The chunk+embed ingest CTAS (:315-335) as one SQL statement."""
    reg = default_registry(dim=16)
    register_engine_sql(spark, reg)
    spark.createDataFrame(
        [("doc/a.md", "Alpha section ### beta section ### gamma section")],
        ["document_id", "document_text"],
    ).createOrReplaceTempView("knowledge")
    out = spark.sql("""
        SELECT document_id, chunks, ml_embed('openaiembed', chunks) AS embedding
        FROM (
          SELECT document_id,
                 explode(ml_character_text_splitter(
                   document_text, 200, 20, '###', false, false, true, 'START')) AS chunks
          FROM knowledge
        )
    """).collect()
    assert len(out) >= 1
    assert all(len(r["embedding"]) == 16 for r in out)


def test_full_coaching_statement_chain(spark):
    """Stages a, b, d of the coaching chain (:347-433) in SQL; stage c via
    the vector-search view."""
    reg = default_registry(dim=16)
    register_engine_sql(spark, reg)
    spark.createDataFrame(
        [("Pricing seems high", "prospect"), ("Noted!", "salesperson")],
        ["message", "speaker"],
    ).createOrReplaceTempView("messages_conversation")
    # stage a (:347-350)
    spark.sql(
        "SELECT * FROM messages_conversation WHERE speaker = 'prospect'"
    ).createOrReplaceTempView("messages_prospect")
    # stage b (:355-362)
    spark.sql("""
        SELECT message, speaker, ml_embed('openaiembed', message) AS embedding
        FROM messages_prospect
    """).createOrReplaceTempView("messages_prospect_embeddings")
    # knowledge index
    spark.createDataFrame(
        [("kb/pricing.md", "Pricing reframing ### value first")],
        ["document_id", "chunks"],
    ).createOrReplaceTempView("_raw_kb")
    spark.sql("""
        SELECT document_id, chunks, ml_embed('openaiembed', chunks) AS embedding
        FROM _raw_kb
    """).createOrReplaceTempView("knowledge_embeddings")
    # stage c (:367-385): VECTOR_SEARCH as a view
    register_vector_search_view(
        spark, "messages_prospect_rag_results",
        "messages_prospect_embeddings", "knowledge_embeddings",
        k=1, payload_cols=["document_id", "chunks"], output_col="rag_results",
    )
    # stage d (:412-433): prompt CONCAT + generation
    rows = spark.sql("""
        SELECT message,
               CAST(to_json(rag_results) AS STRING) AS rag_results_string,
               ml_generate('coaching_response_generator',
                 CONCAT('## PROSPECT MESSAGE: ', message,
                        '\\n\\n## RAG DOCUMENTS:\\nDocument 1: ',
                        rag_results[0].document_id, '\\n', rag_results[0].chunks)
               ) AS coaching_response
        FROM messages_prospect_rag_results
    """).collect()
    assert len(rows) == 1
    assert "kb/pricing.md" in rows[0]["rag_results_string"]
    payload = json.loads(
        rows[0]["coaching_response"].replace("```json", "").replace("```", "")
    )
    assert payload["sources"][0]["document_id"] == "kb/pricing.md"


def test_model_dispatch_two_models_one_column(spark):
    """The dispatching UDF handles mixed model names in one batch."""
    reg = default_registry(dim=8)
    register_engine_sql(spark, reg)
    spark.createDataFrame(
        [("openaiembed", "a"), ("openaiembed", "b")], ["m", "t"]
    ).createOrReplaceTempView("mix")
    out = spark.sql("SELECT ml_embed(m, t) AS e FROM mix").collect()
    assert all(len(r["e"]) == 8 for r in out)
