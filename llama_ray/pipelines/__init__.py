from .tpch_graph import (  # noqa: F401
    raw_edges,
    dedup_edge_list,
    build_tpch_graph,
    RAW_EDGES_SQL,
    GRAPH_CTES,
)
