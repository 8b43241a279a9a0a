"""Property-graph container reader — the FGF analogue.

The reference's FGF binary format carries typed vertex/edge types and
named typed properties
(`/root/reference/llama/include/llama/loaders/ll_load_fgf.h:441-567`
header, ``:660-830`` node-property ingest; properties are created
lazily by name, ``:694-727``). Parquet *is* that container here: a
node table ``(id, ...properties)`` and an edge table
``(src, dst, ...properties)`` — arbitrary extra columns become named
properties with their Arrow types (richer than the reference's
32/64-bit cells).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import ray.data as rd

from ..graph import Graph, build_graph


@dataclass
class PropertyGraph:
    graph: Graph
    node_props: rd.Dataset | None  # (id, ...props)
    edge_props: rd.Dataset  # dense (src, dst, ...props) — same rows as graph.edges

    def node_property(self, name: str) -> np.ndarray:
        """Dense per-vertex array of one node property (NaN/None where
        the node table has no row). O(num_vertices) driver memory —
        the analogue of the reference's property arrays."""
        if self.node_props is None:
            raise KeyError(name)
        vals = np.full(self.graph.num_vertices, np.nan, dtype=np.float64)
        for b in self.node_props.select_columns(["id", name]).iter_batches(
            batch_size=1 << 20, batch_format="pandas"
        ):
            ids = b["id"].to_numpy()
            pos = np.searchsorted(self.graph.ids, ids)
            pos = np.clip(pos, 0, self.graph.num_vertices - 1)
            ok = self.graph.ids[pos] == ids
            vals[pos[ok]] = b[name].to_numpy()[ok]
        return vals


def read_property_graph(
    edge_path: str, node_path: str | None = None, **read_kwargs
) -> PropertyGraph:
    """Load a Parquet property graph: edge table required, node table
    optional. Extra edge columns ride through densification."""
    edges = rd.read_parquet(edge_path, **read_kwargs)
    g = build_graph(edges)
    nodes = rd.read_parquet(node_path) if node_path else None
    return PropertyGraph(graph=g, node_props=nodes, edge_props=g.edges)
