from plwordnet_spark.vectors.pooling import mean_pool, weighted_mean_pool  # noqa: F401
from plwordnet_spark.vectors.similarity import cosine_topk  # noqa: F401
from plwordnet_spark.vectors.hash_embed import hash_embedding  # noqa: F401
