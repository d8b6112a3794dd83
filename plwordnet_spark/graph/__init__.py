from plwordnet_spark.graph.build import build_graph, GraphTables  # noqa: F401
from plwordnet_spark.graph.pregel import PregelRunner  # noqa: F401
from plwordnet_spark.graph.pagerank import pagerank  # noqa: F401
from plwordnet_spark.graph.components import connected_components  # noqa: F401
from plwordnet_spark.graph.labelprop import label_propagation  # noqa: F401
from plwordnet_spark.graph.triangles import triangle_count  # noqa: F401
from plwordnet_spark.graph.trustrank import trustrank, spam_mass  # noqa: F401
from plwordnet_spark.graph.chains import resolve_chains  # noqa: F401
from plwordnet_spark.graph.anchors import build_anchor_table, anchor_term_topk  # noqa: F401
from plwordnet_spark.graph.cocitation import cocitation, bibliographic_coupling  # noqa: F401
from plwordnet_spark.graph.salsa import salsa  # noqa: F401
