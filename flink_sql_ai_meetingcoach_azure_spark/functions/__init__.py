from flink_sql_ai_meetingcoach_azure_spark.functions.chunking import (  # noqa: F401
    chunk_text,
    chunk_text_udf,
    fixed_stride_chunks_col,
)
from flink_sql_ai_meetingcoach_azure_spark.functions.text import (  # noqa: F401
    TRIGGER_KEYWORDS,
    assemble_coaching_prompt,
    clean_llm_json_col,
    keyword_trigger_col,
    parse_coaching_response,
)
from flink_sql_ai_meetingcoach_azure_spark.functions.vectors import (  # noqa: F401
    cosine_similarity_col,
)
from flink_sql_ai_meetingcoach_azure_spark.functions.hashing import (  # noqa: F401
    md5_bigint_col,
)
