"""Knowledge-base ingestion pipeline (SURVEY.md §3.1).

Reference: scan ``knowledge`` → CROSS JOIN UNNEST(ML_CHARACTER_TEXT_SPLITTER
(document_text, 200, 20, '###', false, false, true, 'START')) → LATERAL
TABLE(ML_PREDICT('openaiembed', chunks)) → INSERT INTO
knowledge_embeddings_chunked(document_id, chunks, embedding)
(terraform/generate_personalized_commands.sh:315-335), sunk to the MongoDB
vector store (terraform/main.tf:594-635).

Spark-first: chunk (UDF→array→explode) → optional chunk-dedup (same chunk
text embeds once — SURVEY §4.2, a beyond-reference efficiency win: the
embed UDF is the expensive stage, so dedup-before-embed cuts provider calls
by the duplication factor) → pandas-UDF embed → the vector-store table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.chunking import chunk_text_udf
from flink_sql_ai_meetingcoach_azure_spark.models.registry import ModelRegistry


def chunk_documents(knowledge: DataFrame, **chunk_params) -> DataFrame:
    """knowledge(document_id, .., document_text) -> (document_id, chunks)."""
    splitter = chunk_text_udf(**chunk_params)
    return knowledge.select(
        "document_id",
        F.explode(splitter(F.col("document_text"))).alias("chunks"),
    )


def build_knowledge_index(
    knowledge: DataFrame,
    registry: ModelRegistry,
    model: str = "openaiembed",
    dedup_chunks: bool = True,
    **chunk_params,
) -> DataFrame:
    """Full ingest: chunk → (dedup) → embed. Returns the
    knowledge_embeddings_chunked table (document_id, chunks, embedding)."""
    chunked = chunk_documents(knowledge, **chunk_params)
    if dedup_chunks:
        # embed each distinct chunk text once. groupBy+collect_list+explode
        # instead of distinct+self-join: ONE shuffle (map-side combinable)
        # and the chunk subtree is evaluated exactly once — the
        # distinct/join formulation scanned+chunked the knowledge base
        # twice per action and shuffled both join sides.
        grouped = chunked.groupBy("chunks").agg(
            F.collect_list("document_id").alias("__doc_ids")
        )
        embedded = registry.ml_predict(grouped, model, "chunks", "embedding")
        return embedded.select(
            F.explode("__doc_ids").alias("document_id"), "chunks", "embedding"
        )
    return registry.ml_predict(chunked, model, "chunks", "embedding").select(
        "document_id", "chunks", "embedding"
    )
