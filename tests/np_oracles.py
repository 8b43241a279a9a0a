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


def tarjan_scc_np(src, dst, n):
    """Iterative Tarjan SCC; returns per-vertex component label = min
    vertex index in the SCC (canonical, visit-order independent)."""
    import numpy as np

    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    comp = [-1] * n
    counter = [0]
    n_comps = [0]

    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                cid = n_comps[0]
                n_comps[0] += 1
                for w in members:
                    comp[w] = cid
            work.pop()
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    # canonical: min vertex index per comp
    comp = np.asarray(comp)
    mins = np.full(n_comps[0], n, dtype=np.int64)
    np.minimum.at(mins, comp, np.arange(n))
    return mins[comp]


def core_numbers_np(src, dst, n):
    """Exact coreness by bucket peeling over the undirected simple
    graph given as canonical (u < v) edge arrays."""
    adj = [[] for _ in range(n)]
    for a, b in zip(np.asarray(src), np.asarray(dst)):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 0
    remaining = n
    while remaining:
        peel = [v for v in range(n) if alive[v] and deg[v] <= k]
        if not peel:
            k += 1
            continue
        while peel:
            v = peel.pop()
            if not alive[v]:
                continue
            core[v] = k
            alive[v] = False
            remaining -= 1
            for u in adj[v]:
                if alive[u]:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def katz_np(src, dst, n, *, iters=8, alpha=0.0625, beta=1.0):
    """Truncated-series Katz from x0=0; duplicate edges contribute."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    x = np.zeros(n)
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, dst, x[src])
        x = beta + alpha * acc
    return x


def pagerank_weighted_np(src, dst, w, n, *, iters=10, d=0.85):
    """Edge-weighted PageRank: contributions w_e * r[src]/strength[src]."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w, np.float64)
    strength = np.bincount(src, weights=w, minlength=n)
    inv = np.zeros(n)
    inv[strength > 0] = 1.0 / strength[strength > 0]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, dst, w * r[src] * inv[src])
        r = (1 - d) / n + d * acc
    return r


def louvain_np(src, dst, n, *, rounds=6, ids=None):
    """Deterministic synchronous Louvain local-moving (integer scores):
    each round the PARITY-GATED vertices (original id parity == round
    parity) move to the candidate community with the highest
    2m*e - k*(tot - k*[own]) score, ties to smallest id. ``ids`` maps
    dense index -> original id for the gate (defaults to identity)."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    keep = a != b
    pairs = {(int(x), int(y)) for x, y in zip(a[keep], b[keep])}
    adj = [[] for _ in range(n)]
    for x, y in pairs:
        adj[x].append(y)
        adj[y].append(x)
    deg = np.array([len(nb) for nb in adj], dtype=np.int64)
    two_m = int(deg.sum())
    ids = np.arange(n) if ids is None else np.asarray(ids)
    c = np.arange(n, dtype=np.int64)
    for k in range(rounds):
        tot = np.zeros(n, np.int64)
        np.add.at(tot, c, deg)
        new = c.copy()
        for v in range(n):
            if int(ids[v]) % 2 != k % 2:
                continue
            cand = {int(c[v]): 0}
            for u in adj[v]:
                cand[int(c[u])] = cand.get(int(c[u]), 0) + 1

            def score(C):
                return two_m * cand[C] - int(deg[v]) * (
                    int(tot[C]) - (int(deg[v]) if C == c[v] else 0)
                )

            # stay on ties: move only on strictly positive gain, then
            # smallest community id among the strictly-better
            best_c, best_s = int(c[v]), score(int(c[v]))
            for C in sorted(cand):
                if C == c[v]:
                    continue
                s = score(C)
                if s > best_s:
                    best_c, best_s = C, s
            new[v] = best_c
        c = new
    return c
