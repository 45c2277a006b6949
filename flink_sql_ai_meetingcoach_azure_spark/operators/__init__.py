from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (  # noqa: F401
    vector_search,
    vector_search_topk_flat,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.top_n import recent_top_n  # noqa: F401
from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    minhash_signatures,
    lsh_candidate_pairs,
)
