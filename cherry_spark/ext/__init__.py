"""Training-data pipeline extensions (SURVEY §2.10): dedup, similarity
search, text analysis, multimodal plumbing — first-class operators
beyond the reference's surface, designed for 100 TB Spark execution."""

from cherry_spark.ext.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from cherry_spark.ext.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_similarity,
    lsh_bucket_topk,
)
from cherry_spark.ext.text import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    text_stats_columns,
    token_count,
)
