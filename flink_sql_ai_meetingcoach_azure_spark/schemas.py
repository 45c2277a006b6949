"""Fixed, declared schemas for every pipeline table (never inferred).

The reference declares every table schema explicitly in Flink DDL and the
producers *fetch* registered schemas rather than inferring
(reference: app/utils/kafka_utils.py:297-301, auto.register.schemas=False).
Mapping per FIXTURES.md / SURVEY.md §1.2: STRING->StringType (nullable unless
NOT NULL), ARRAY<FLOAT>->ArrayType(FloatType), ROW<...>->StructType.
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM = 1536  # reference: terraform/main.tf:655-658 (ada-002, cosine)

# reference: terraform/generate_personalized_commands.sh:269-277
KNOWLEDGE = T.StructType(
    [
        T.StructField("document_id", T.StringType(), True),
        T.StructField("document_name", T.StringType(), True),
        T.StructField("document_category", T.StringType(), True),
        T.StructField("document_text", T.StringType(), True),
    ]
)

# reference: terraform/generate_personalized_commands.sh:282-288
MESSAGES_CONVERSATION = T.StructType(
    [
        T.StructField("message", T.StringType(), False),  # STRING NOT NULL
        T.StructField("speaker", T.StringType(), True),
        # Flink's implicit $rowtime system column, made explicit
        T.StructField("rowtime", T.TimestampType(), True),
    ]
)


def _embedding_type(dim: int = EMBEDDING_DIM) -> T.ArrayType:  # noqa: ARG001
    return T.ArrayType(T.FloatType(), True)


# reference: terraform/main.tf:575 + generate_personalized_commands.sh:293-306
KNOWLEDGE_EMBEDDINGS_CHUNKED = T.StructType(
    [
        T.StructField("document_id", T.StringType(), True),
        T.StructField("chunks", T.StringType(), True),
        T.StructField("embedding", _embedding_type(), True),
    ]
)

# reference: terraform/generate_personalized_commands.sh:355-362
MESSAGES_PROSPECT_EMBEDDINGS = T.StructType(
    [
        T.StructField("message", T.StringType(), True),
        T.StructField("speaker", T.StringType(), True),
        T.StructField("embedding", _embedding_type(), True),
    ]
)

RAG_RESULT_ELEMENT = T.StructType(
    [
        T.StructField("document_id", T.StringType(), True),
        T.StructField("chunks", T.StringType(), True),
    ]
)

# reference: terraform/generate_personalized_commands.sh:367-385
MESSAGES_PROSPECT_RAG_RESULTS = T.StructType(
    [
        T.StructField("message", T.StringType(), True),
        T.StructField("speaker", T.StringType(), True),
        T.StructField("rag_results", T.ArrayType(RAG_RESULT_ELEMENT), True),
    ]
)

# reference: generate_personalized_commands.sh:412-433, kafka_utils.py:362-374
MESSAGES_PROSPECT_RAG_LLM_RESPONSE = T.StructType(
    [
        T.StructField("message", T.StringType(), True),
        T.StructField("rag_results_string", T.StringType(), True),
        T.StructField("coaching_response", T.StringType(), True),
    ]
)

# Parsed coaching_response JSON payload.
# reference: system prompt generate_personalized_commands.sh:240-249 and
# client-side parser app/static/script.js:961-972
COACHING_SOURCE = T.StructType(
    [
        T.StructField("document_index", T.IntegerType(), True),
        T.StructField("document_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("full_text", T.StringType(), True),
        T.StructField("used_excerpt", T.StringType(), True),
    ]
)
COACHING_RESPONSE = T.StructType(
    [
        T.StructField("suggested_response", T.StringType(), True),
        T.StructField("sources", T.ArrayType(COACHING_SOURCE), True),
        T.StructField("reasoning", T.StringType(), True),
    ]
)

# reference: app/utils/cache_utils.py:47 (CSV header)
CACHED_RESPONSES = T.StructType(
    [
        T.StructField("Message", T.StringType(), True),
        T.StructField("Response", T.StringType(), True),
        T.StructField("Reasoning", T.StringType(), True),
        T.StructField("Used Excerpts", T.StringType(), True),
        T.StructField("RAG sources", T.StringType(), True),
    ]
)
