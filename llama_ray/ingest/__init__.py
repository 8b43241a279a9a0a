from .canonicalize import (  # noqa: F401
    undirected_ordered,
    undirected_double,
    dedup_edges,
    max_node_id,
)
from .extract import ExtractLinkEdges, ingest_repo_files  # noqa: F401
