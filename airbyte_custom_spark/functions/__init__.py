from airbyte_custom_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    bpe_ish_token_count,
    stopword_ratio,
    punct_ratio,
    mean_word_len,
    quality_score,
    lang_id,
    word_shingles,
    word_shingle_seq,
    doc_fingerprint,
    h31,
    h31_sql,
)
from airbyte_custom_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_signature,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash48,
    simhash_near_dups,
    MinHashLshIndex,
    connected_components,
)
from airbyte_custom_spark.functions.profile import (  # noqa: F401
    profile_columns,
)
from airbyte_custom_spark.functions.embeddings import (  # noqa: F401
    cosine_similarity,
    brute_force_topk,
    lsh_bucket_topk,
    embedding_near_dups,
    ivf_centroids,
    ivf_random_centroids,
    ivf_topk,
)
