from webgraph_spark.algos.pagerank import pagerank  # noqa: F401
from webgraph_spark.algos.components import connected_components  # noqa: F401
from webgraph_spark.algos.labelprop import label_propagation  # noqa: F401
from webgraph_spark.algos.triangles import triangle_counts  # noqa: F401
