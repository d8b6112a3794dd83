from plwordnet_spark.sources.io import (  # noqa: F401
    load_graph,
    read_jsonl,
    save_graph,
    write_jsonl,
)
from plwordnet_spark.sources.xml_lmf import parse_lmf_entries  # noqa: F401
from plwordnet_spark.sources.dims import read_relation_weights  # noqa: F401
