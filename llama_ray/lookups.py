"""Point lookups & misc graph API (SURVEY §2.7).

The reference exposes shared-memory point lookups
(``find(src, dst)`` binary search over adjacency,
`/root/reference/llama/include/llama/ll_mlcsr_sp.h:2334-2360`;
``node_exists``/``edge_exists`` :872-935; ``pick_random_node``
``ll_mlcsr_graph.h:677-682``). Distributed form: vectorized filter
scans / broadcast probes — fine for interactive use; batched probes
amortize one scan over many lookups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .common import batch_to_numpy, pair_struct, pairs_member_mask, sorted_pair_struct
from .graph import Graph


def find_edges(edges: rd.Dataset, pairs: list[tuple[int, int]]) -> dict[tuple[int, int], bool]:
    """Batched edge-existence probe: broadcast the probe set, one scan."""
    if not pairs:
        return {}
    probe = np.array(sorted({(int(a), int(b)) for a, b in pairs}), np.int64)
    probe_struct = sorted_pair_struct(probe[:, 0], probe[:, 1])
    probe_ref = ray.put(probe_struct)

    def check(batch: pa.Table):
        # probe pairs sorted lexicographically as a struct array — full
        # int64 id range safe (no bit-packing); which probes appear in
        # this batch, reported by probe index
        p = ray.get(probe_ref)
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        hit_rows = pairs_member_mask(s, d, p)
        if not hit_rows.any():
            return {"idx": np.empty(0, np.int64)}
        q = np.searchsorted(p, pair_struct(s[hit_rows], d[hit_rows]))
        return {"idx": np.unique(q).astype(np.int64)}

    hit = np.zeros(len(probe), bool)
    for b in edges.map_batches(check, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        hit[batch_to_numpy(b, "idx")] = True
    return {tuple(p): bool(h) for p, h in zip(probe.tolist(), hit.tolist())}


def edge_exists(edges: rd.Dataset, src: int, dst: int) -> bool:
    return find_edges(edges, [(src, dst)])[(src, dst)]


def node_exists(graph: Graph, node_id: int) -> bool:
    i = int(np.searchsorted(graph.ids, node_id))
    return i < len(graph.ids) and graph.ids[i] == node_id


def out_degree(graph: Graph, node_id: int) -> int:
    i = int(np.searchsorted(graph.ids, node_id))
    if i >= len(graph.ids) or graph.ids[i] != node_id:
        raise KeyError(node_id)
    return int(graph.out_degrees[i])


def pick_random_node(graph: Graph, *, seed: int | None = None) -> int:
    rng = np.random.default_rng(seed)
    return int(graph.ids[rng.integers(0, len(graph.ids))])


def max_nodes(graph: Graph) -> int:
    """Reference semantics: 1 + max node id (``ll_mlcsr_sp.h:583-589``)."""
    return int(graph.ids.max()) + 1 if len(graph.ids) else 0
