from .pagerank import pagerank, pagerank_top_k  # noqa: F401
from .components import weakly_connected_components, label_propagation  # noqa: F401
from .triangles import triangle_count  # noqa: F401
from .traversal import bfs, sssp  # noqa: F401
from .stats import degree_distribution, edge_prop_stats, level_spread  # noqa: F401
from .bc import betweenness_centrality  # noqa: F401
