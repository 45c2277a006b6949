from flink_sql_ai_meetingcoach_azure_spark.plans.ingest import build_knowledge_index  # noqa: F401
from flink_sql_ai_meetingcoach_azure_spark.plans.coaching import coaching_pipeline  # noqa: F401
