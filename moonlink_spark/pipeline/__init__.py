"""Training-data pipeline operators over document / embedding / image tables.

These are the large-scale data-curation jobs a 100 TB image+caption lakehouse
needs beyond table maintenance: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing (decode / resize /
feature-extract over binary image payloads).

Every operator is a declarative DataFrame program (JVM-side built-ins; Arrow
-batched pandas UDFs only where pixels are touched) and is paired with an
ANSI-SQL oracle in __spark_entry__.py so the correctness gate can verify it
value-for-value against DuckDB.
"""

from moonlink_spark.pipeline.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    word_shingles,
)
from moonlink_spark.pipeline.similarity import cosine_topk, lsh_ann_topk, lsh_buckets
from moonlink_spark.pipeline.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

__all__ = [
    "exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "lsh_buckets",
    "lsh_ann_topk",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
]
