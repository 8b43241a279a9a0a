"""Single-process numpy reference implementations (test oracles).

Mirrors the reference semantics (float64 accumulation like
``pagerank_double``, `/root/reference/benchmark/benchmarks/pagerank.h:404-433`)
independently of any Ray code path.
"""

from __future__ import annotations

import numpy as np


def pagerank_np(src, dst, n, *, iters=10, d=0.85):
    src = np.asarray(src)
    dst = np.asarray(dst)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.zeros(n)
    inv[deg > 0] = 1.0 / deg[deg > 0]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, dst, r[src] * inv[src])
        r = (1 - d) / n + d * acc
    return r


def wcc_np(src, dst, ids):
    """Min-id label per component over undirected reachability;
    ids = original vertex ids for dense indices."""
    n = len(ids)
    lab = ids.copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, dst, lab[src])
        np.minimum.at(new, src, lab[dst])
        if np.array_equal(new, lab):
            return lab
        lab = new


def lp_np(src, dst, n, *, iterations=4):
    """Synchronous LP over undirected simple graph given as canonical
    (u < v distinct) edges in dense ids; labels = dense index init."""
    lab = np.arange(n)
    for _ in range(iterations):
        nodes = np.concatenate([dst, src])
        labels = np.concatenate([lab[src], lab[dst]])
        # mode per node, tie -> smallest label
        order = np.lexsort((labels, nodes))
        nodes_o, labels_o = nodes[order], labels[order]
        # counts of each (node, label) run
        new = lab.copy()
        uniq, idx, cnt = np.unique(
            np.stack([nodes_o, labels_o]), axis=1, return_index=True, return_counts=True
        )
        un, ul = uniq
        o2 = np.lexsort((ul, -cnt, un))
        un_o = un[o2]
        first = np.ones(len(un_o), bool)
        first[1:] = un_o[1:] != un_o[:-1]
        new[un_o[first]] = ul[o2][first]
        lab = new
    return lab


def triangles_np(src, dst, n):
    """Exact triangle count of the undirected simple graph."""
    pairs = set()
    for a, b in zip(np.minimum(src, dst).tolist(), np.maximum(src, dst).tolist()):
        if a != b:
            pairs.add((a, b))
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in pairs:
        count += sum(1 for c in (adj[a] & adj[b]) if c > b)
    return count


def bfs_np(src, dst, n, root):
    dist = np.full(n, np.inf)
    dist[root] = 0
    frontier = {root}
    out = [[] for _ in range(n)]
    for s, t in zip(src.tolist(), dst.tolist()):
        out[s].append(t)
    level = 0
    while frontier:
        nxt = set()
        for u in frontier:
            for v in out[u]:
                if not np.isfinite(dist[v]):
                    dist[v] = level + 1
                    nxt.add(v)
        frontier = nxt
        level += 1
    return dist


def bellman_ford_np(src, dst, w, n, root):
    dist = np.full(n, np.inf)
    dist[root] = 0.0
    for _ in range(n):
        cand = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(new, dist):
            break
        dist = new
    return dist
