"""Large-scale training-data pipeline operators over document/embedding
tables — the operations a 100TB web corpus needs after link analysis:
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
over embeddings, text statistics (language-ID heuristic, quality
scores, token counts, fingerprints), and multimodal column plumbing.

All DataFrame-native or Arrow-vectorized; no per-row Python.
"""

from olive_spark.pipeline.dedup import (
    dedup_clusters,
    exact_duplicate_examples,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from olive_spark.pipeline.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)
from olive_spark.pipeline.similarity import (
    brute_force_knn,
    cosine_scores,
    embedding_near_duplicates,
    ivf_knn,
    lsh_bucketed_knn,
)
from olive_spark.pipeline.textstats import (
    document_fingerprint,
    language_id,
    ngram_counts,
    quality_score,
    token_stats,
)

__all__ = [
    "exact_duplicates",
    "exact_duplicate_examples",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "dedup_clusters",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "cosine_scores",
    "brute_force_knn",
    "lsh_bucketed_knn",
    "ivf_knn",
    "embedding_near_duplicates",
    "language_id",
    "quality_score",
    "token_stats",
    "ngram_counts",
    "document_fingerprint",
    "extract_features",
    "resize_images",
    "sample_frames",
]
