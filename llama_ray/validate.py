"""Cross-validation between two ingest paths (SURVEY §2.6).

Reference ``-C FILE``: load the same input through the incremental
(writable) path and compare per-node sorted out-adjacency sets,
degrees and properties against the direct-load CSR
(`/root/reference/benchmark/tools/cross_validate.h:53-243`). Returns
the first mismatching vertex, or None when equal.

Distributed form: per-batch adjacency-set hashing — each side reduces
to (vertex, xor-of-neighbor-hashes, degree) with a commutative hash,
so comparison is order-insensitive and O(vertices) on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .common import batch_to_numpy


def _adjacency_signature(edges: rd.Dataset) -> dict[int, tuple[int, int]]:
    """vertex → (xor of mixed neighbor hashes, out-degree). XOR is
    commutative/associative → batch order never matters. NOTE: XOR
    sees a *multiset* as a set only if duplicates are pre-deduped;
    callers compare canonicalized (deduped) edge sets."""
    sig: dict[int, list[int]] = {}

    def partial(batch: pa.Table):
        s = batch_to_numpy(batch, "src")
        d = batch_to_numpy(batch, "dst")
        # 64-bit mix of the neighbor id (splitmix64-style)
        x = d.astype(np.uint64, copy=True)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        order = np.argsort(s, kind="stable")
        s_o, x_o = s[order], x[order]
        first = np.ones(len(s_o), bool)
        first[1:] = s_o[1:] != s_o[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(s_o))
        vs = s_o[starts]
        xors = np.array(
            [np.bitwise_xor.reduce(x_o[a:b]) for a, b in zip(starts, ends)], np.uint64
        )
        cnts = (ends - starts).astype(np.int64)
        return {"v": vs, "x": xors.view(np.int64), "c": cnts}

    out: dict[int, tuple[int, int]] = {}
    for b in edges.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v, x, c in zip(
            batch_to_numpy(b, "v").tolist(),
            batch_to_numpy(b, "x").tolist(),
            batch_to_numpy(b, "c").tolist(),
        ):
            if v in out:
                px, pc = out[v]
                out[v] = (px ^ x, pc + c)
            else:
                out[v] = (x, c)
    return out


def cross_validate(edges_a: rd.Dataset, edges_b: rd.Dataset) -> int | None:
    """First vertex whose adjacency set or degree differs; None if the
    two edge datasets describe the same graph."""
    sa = _adjacency_signature(edges_a)
    sb = _adjacency_signature(edges_b)
    for v in sorted(set(sa) | set(sb)):
        if sa.get(v) != sb.get(v):
            return v
    return None
