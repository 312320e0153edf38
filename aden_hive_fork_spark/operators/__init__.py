"""Custom operators built from Spark primitives (SURVEY.md §2.D).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (brute-force + LSH-bucketed cosine), and the supporting text
shingling — each expressed as DataFrame compositions first, Pandas
UDFs only where built-ins can't express the semantics.
"""

from .joins import bucketed_join, salted_join, skewed_key_stats, write_bucketed
from .dedup import (
    exact_dedup,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .layout import (
    compact,
    current_version,
    layout_stats,
    publish_version,
    read_current,
    vacuum_versions,
    zorder_value,
)
from .rollup import (
    hist_range_percentiles,
    materialize_rollup,
    materialize_value_hist,
    rollup_range_agg,
    rollup_range_users,
)
from .table import (
    compact_table,
    create_table,
    read_table,
    upsert,
    vacuum_deltas,
)
from .normalize import normalize_corpus, normalize_text
from .similarity import (
    ann_topk,
    cosine_neardup_pairs,
    cosine_topk_exact,
    cosine_topk_vectorized,
    lsh_bucket_candidates,
    semdedup_kmeans_verdicts,
    semdedup_verdicts,
)

__all__ = [
    "compact",
    "current_version",
    "layout_stats",
    "publish_version",
    "read_current",
    "vacuum_versions",
    "zorder_value",
    "hist_range_percentiles",
    "materialize_rollup",
    "materialize_value_hist",
    "rollup_range_agg",
    "rollup_range_users",
    "compact_table",
    "create_table",
    "read_table",
    "upsert",
    "vacuum_deltas",
    "bucketed_join",
    "salted_join",
    "skewed_key_stats",
    "write_bucketed",
    "exact_dedup",
    "minhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "ann_topk",
    "cosine_neardup_pairs",
    "cosine_topk_exact",
    "cosine_topk_vectorized",
    "lsh_bucket_candidates",
    "normalize_corpus",
    "normalize_text",
    "semdedup_kmeans_verdicts",
    "semdedup_verdicts",
]
