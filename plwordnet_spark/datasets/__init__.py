from plwordnet_spark.datasets.relations import (  # noqa: F401
    expand_group_relations,
    synonymy_cliques,
    union_relation_streams,
)
from plwordnet_spark.datasets.balanced import (  # noqa: F401
    balance_arithmetic,
    negative_synthesis,
    weight_partition,
)
from plwordnet_spark.datasets.split import (  # noqa: F401
    priority_dedup,
    sentence_pair_explode,
    train_test_split,
)
