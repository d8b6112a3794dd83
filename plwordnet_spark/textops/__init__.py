from plwordnet_spark.textops.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from plwordnet_spark.textops.quality import (  # noqa: F401
    language_id,
    quality_features,
    text_fingerprint,
    text_fingerprint_poly,
)
