"""ID remap / compaction — the ``xs1-reorder`` offline utility.

Reference (`/root/reference/utils/xs1-reorder.cpp:180-194`): renumber
vertices by descending degree (hot vertices get small ids), compact
the id space, dedup. Distributed form: degree table → rank
assignment on the driver (O(V)) → broadcast old→new map →
``map_batches`` remap — the two-pass broadcast-join of SURVEY §2.3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..common import batch_to_numpy
from ..graph import build_graph


def reorder_by_degree(edges: rd.Dataset) -> rd.Dataset:
    """Edges with vertices renumbered 0..V-1 by descending total
    degree (ties by old id). Output ids are compact."""
    g = build_graph(edges)
    total_deg = g.out_degrees + g.in_degrees()
    # rank: highest degree → id 0
    order = np.lexsort((g.ids, -total_deg))
    new_id = np.empty(g.num_vertices, np.int64)
    new_id[order] = np.arange(g.num_vertices)
    ids_ref = g._ids_ref or ray.put(g.ids)
    map_ref = ray.put(new_id)

    def remap(batch: pa.Table):
        m = ray.get(map_ref)
        src = batch_to_numpy(batch, "src")
        dst = batch_to_numpy(batch, "dst")
        return {"src": m[src], "dst": m[dst]}

    return g.edges.map_batches(remap, batch_format="pyarrow")
