from plwordnet_spark.graph.build import build_graph, GraphTables  # noqa: F401
from plwordnet_spark.graph.pregel import PregelRunner  # noqa: F401
from plwordnet_spark.graph.pagerank import pagerank  # noqa: F401
from plwordnet_spark.graph.components import connected_components  # noqa: F401
from plwordnet_spark.graph.labelprop import label_propagation  # noqa: F401
from plwordnet_spark.graph.triangles import triangle_count  # noqa: F401
