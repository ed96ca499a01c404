from polaroam_spark.operators.stops import detect_stops, stop_medians
from polaroam_spark.operators.clustering import (
    attach_medoids,
    cluster_communities,
    cluster_medoids,
    cluster_stops_dbscan,
    cluster_stops_dbscan_distributed,
    convex_hull,
    max_pairwise_distance,
)
from polaroam_spark.operators.homework import (
    calculate_total_days,
    date_counts,
    detect_home,
    detect_work,
    filter_clusters,
    home_work_wide,
    prepare_labeling,
    rolling_home_candidates,
)
from polaroam_spark.operators.postprocess import compute_intervals
from polaroam_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    duplicate_components,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprint,
    simhash_pairs,
)
from polaroam_spark.operators.joins import (
    asof_join,
    point_in_interval_join,
)
from polaroam_spark.operators.chunking import (
    chunk_documents,
    corpus_vocabulary,
    packing_plan,
)
from polaroam_spark.operators.similarity import (
    add_lsh_bucket,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)
from polaroam_spark.operators.textstats import (
    detect_language,
    document_fingerprint,
    pii_counts,
    quality_features,
    quality_stratified_filter,
    repetition_ratio,
    scrub_text,
    token_count,
)
from polaroam_spark.operators.sampling import (
    sample_by_hash,
    train_test_split,
)
from polaroam_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    frame_sample_plan,
    media_repartition,
)

__all__ = [
    "detect_stops",
    "stop_medians",
    "cluster_stops_dbscan",
    "cluster_stops_dbscan_distributed",
    "cluster_communities",
    "cluster_medoids",
    "attach_medoids",
    "convex_hull",
    "max_pairwise_distance",
    "prepare_labeling",
    "detect_home",
    "detect_work",
    "home_work_wide",
    "calculate_total_days",
    "date_counts",
    "filter_clusters",
    "rolling_home_candidates",
    "compute_intervals",
    "dedup_exact",
    "dedup_minhash_lsh",
    "minhash_lsh_pairs",
    "simhash_fingerprint",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "duplicate_components",
    "chunk_documents",
    "packing_plan",
    "corpus_vocabulary",
    "asof_join",
    "point_in_interval_join",
    "embedding_neardup_pairs",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "add_lsh_bucket",
    "detect_language",
    "quality_features",
    "token_count",
    "document_fingerprint",
    "scrub_text",
    "pii_counts",
    "repetition_ratio",
    "quality_stratified_filter",
    "sample_by_hash",
    "train_test_split",
    "attach_media_meta",
    "extract_media_features",
    "media_repartition",
    "frame_sample_plan",
]
