"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `confluentinc/flink-sql-ai-meetingcoach-azure`
(a Confluent Cloud Flink SQL + Kafka + Azure OpenAI + MongoDB Atlas RAG
"Meeting Coach" demo).

This is NOT a port: the reference's entire query surface is ~15 declarative
Flink SQL statements executed by a managed service
(reference: terraform/generate_personalized_commands.sh:151-593). This package
re-expresses those semantics Spark-first:

- Flink dynamic tables / CTAS chains  -> DataFrame + Structured Streaming
- CREATE MODEL + ML_PREDICT           -> model registry + pandas UDFs
- MongoDB Atlas VECTOR_SEARCH         -> native similarity-search operator
- ML_CHARACTER_TEXT_SPLITTER + UNNEST -> chunker UDF + explode
- Kafka topics                        -> parquet/file/kafka sources & sinks

Layering (SURVEY.md §7.0):
    schemas -> functions -> models -> operators -> plans -> streaming
"""

__version__ = "0.1.0"

from flink_sql_ai_meetingcoach_azure_spark.session import get_spark  # noqa: F401
