"""plwordnet_spark — a PySpark-native link-graph analytics engine.

A from-scratch Spark engine with the capabilities of
radlab-dev-group/plwordnet (reference at /root/reference) generalized to
web scale:

* vectorized text/link extraction from HTML pages
  (reference: plwordnet_handler/base/structure/elems/comment.py),
* edge/node table construction with dedup, hashing, degree/hub analysis
  (reference: plwordnet_handler/base/connectors/nx/db_to_nx.py),
* Pregel-style iterative graph jobs (PageRank, connected components,
  label propagation, triangle counting) as join+groupBy gather-scatter,
* the relation-dataset pipelines (typed edge unions, clique expansion,
  weight-balanced positive/negative sampling, train/test splits;
  reference: plwordnet_handler/dataset/embedder.py),
* node-vector pooling + exact top-k cosine similarity
  (reference: plwordnet_ml/embedder/strategy.py, milvus handlers),
* training-data ops: dedup (exact/MinHash-LSH/SimHash), language id,
  quality scoring, token counts, fingerprints.

Everything is DataFrame-first: logical plans go through Catalyst, Python
appears only inside Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from plwordnet_spark.cache import CacheScope  # noqa: F401
from plwordnet_spark.session import get_spark  # noqa: F401
