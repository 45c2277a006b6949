from flink_sql_ai_meetingcoach_azure_spark.models.registry import (  # noqa: F401
    ModelRegistry,
    default_registry,
)
from flink_sql_ai_meetingcoach_azure_spark.models.providers import (  # noqa: F401
    MockProvider,
    mock_embedding,
)
