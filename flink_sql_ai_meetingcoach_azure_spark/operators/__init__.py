from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (  # noqa: F401
    vector_search,
    vector_search_topk_flat,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.top_n import recent_top_n  # noqa: F401
from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (  # noqa: F401
    contamination_flags,
    dedup_exact,
    dedup_keep_best,
    dedup_lines,
    embedding_lsh_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_survivors,
    simhash_pairs,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    deterministic_split,
    shuffle_by_hash,
    stratified_sample,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.asof_join import asof_join  # noqa: F401
from flink_sql_ai_meetingcoach_azure_spark.operators.skew import (  # noqa: F401
    salted_count_by_key,
    salted_join,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.multimodal import (  # noqa: F401
    attach_media_metadata,
    decode_and_featurize,
    sample_video_frames,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (  # noqa: F401
    build_ivf_index,
    vector_search_ivf,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.dedup import (  # noqa: F401
    embedding_cosine_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.packing import (  # noqa: F401
    pack_contiguous,
    write_training_shards,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.components import (  # noqa: F401
    connected_components,
    dedup_by_components,
    duplicate_clusters,
    leakage_safe_split,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.cep import match_funnel  # noqa: F401
from flink_sql_ai_meetingcoach_azure_spark.operators.quantize import (  # noqa: F401
    dequantize_col,
    quantize_embeddings,
    vector_search_topk_quantized,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.bpe import (  # noqa: F401
    apply_bpe,
    learn_bpe_merges,
    word_frequencies,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.editdist import (  # noqa: F401
    edit_distance_pairs,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.layout import (  # noqa: F401
    normalize_to_bits,
    write_zordered,
    zorder_key,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.projection import (  # noqa: F401
    projection_matrix,
    random_projection,
)
from flink_sql_ai_meetingcoach_azure_spark.operators.interval_join import (  # noqa: F401
    interval_overlap_join,
)
