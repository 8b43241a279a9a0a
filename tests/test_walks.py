"""Random-walk sampling vs a pure-python reference: the hop choice is
a pure function of (walk_id, step, seed), so the corpus must be
bit-identical regardless of block layout or partition count."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.algos.walks import random_walks
from llama_ray.data_ops.dedup import _GOLD, _mix64
from llama_ray.graph import build_graph
from llama_ray.ingest.canonicalize import dedup_edges
from llama_ray.sources.generators import rmat


def edges_ds(src, dst, blocks=1):
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def walks_np(src, dst, starts, num_steps, seed):
    """Row-at-a-time reference with python-dict adjacency."""
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    rows = []
    for w in starts:
        cur = w
        rows.append((w, 0, w))
        for t in range(1, num_steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = _mix64(np.array([np.uint64(w) * _GOLD ^ np.uint64(t) ^ np.uint64(seed)]))[0]
            cur = nbrs[int(h % np.uint64(len(nbrs)))]
            rows.append((w, t, cur))
    return sorted(rows)


def _table_rows(t: pa.Table):
    return sorted(
        zip(
            t.column("walk_id").to_pylist(),
            t.column("step").to_pylist(),
            t.column("vertex").to_pylist(),
        )
    )


def test_walks_match_reference_and_stop_at_sinks():
    # 0→{1,2}, 1→{2,3}, 2→{3}, 3 is a sink; 7→7 self-loop spins forever
    src = [0, 0, 1, 1, 2, 7]
    dst = [1, 2, 2, 3, 3, 7]
    g = build_graph(dedup_edges(edges_ds(src, dst)))
    out = random_walks(g, np.array([0, 1, 3, 7]), num_steps=5, seed=99)
    assert _table_rows(out) == walks_np(src, dst, [0, 1, 3, 7], 5, 99)
    # the sink start emits exactly its step-0 row
    sink_rows = out.filter(pa.compute.equal(out.column("walk_id"), 3))
    assert sink_rows.num_rows == 1
    # the self-loop walk survives all 5 steps at vertex 7
    loop = _table_rows(out.filter(pa.compute.equal(out.column("walk_id"), 7)))
    assert loop == [(7, t, 7) for t in range(6)]


def node2vec_np(src, dst, starts, num_steps, seed, weights=(1, 4, 2)):
    """Row-at-a-time node2vec reference: uniform first hop, then
    integer (return, common-neighbor, far) class weights with the
    hash point falling in the cumulative interval."""
    w_ret, w_common, w_far = weights
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(s, set()).add(d)
    sadj = {s: sorted(ds) for s, ds in adj.items()}
    rows = []
    for w in starts:
        cur, prev = w, None
        rows.append((w, 0, w))
        for t in range(1, num_steps + 1):
            nbrs = sadj.get(cur)
            if not nbrs:
                break
            h = int(
                _mix64(np.array([np.uint64(w) * _GOLD ^ np.uint64(t) ^ np.uint64(seed)]))[0]
            )
            if t == 1:
                nxt = nbrs[h % len(nbrs)]
            else:
                wts = [
                    w_ret
                    if n == prev
                    else (w_common if n in adj.get(prev, set()) else w_far)
                    for n in nbrs
                ]
                r, acc, nxt = h % sum(wts), 0, nbrs[-1]
                for n, wt in zip(nbrs, wts):
                    acc += wt
                    if r < acc:
                        nxt = n
                        break
            prev, cur = cur, nxt
            rows.append((w, t, cur))
    return sorted(rows)


def test_node2vec_matches_reference_all_weight_classes():
    """Graph with a mutual edge (return class), a triangle (common-
    neighbor class) and a distance-2 branch (far class) so every
    weight bucket decides at least one hop."""
    from llama_ray.algos.walks import node2vec_walks

    src = [0, 1, 0, 1, 2, 2, 3, 4, 1]
    dst = [1, 0, 2, 2, 3, 4, 1, 0, 5]
    starts = [0, 1, 2, 3, 4]
    g = build_graph(dedup_edges(edges_ds(src, dst)))
    for weights in [(1, 4, 2), (9, 1, 1), (1, 1, 6)]:
        for seed in (7, 99):
            out = node2vec_walks(
                g, np.array(starts), num_steps=5, seed=seed, weights=weights
            )
            assert _table_rows(out) == node2vec_np(src, dst, starts, 5, seed, weights)


def test_node2vec_layout_independent():
    from llama_ray.algos.walks import node2vec_walks

    es = rmat(scale=8, avg_degree=6, seed=11)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    outs = []
    for blocks in (1, 8):
        g = build_graph(dedup_edges(edges_ds(src, dst, blocks)))
        starts = g.ids[:40]
        outs.append(_table_rows(node2vec_walks(g, starts, num_steps=6, seed=5)))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 40
    # and it matches the row-at-a-time reference on the same graph
    g = build_graph(dedup_edges(edges_ds(src, dst, 4)))
    starts = [int(x) for x in g.ids[:25]]
    out = node2vec_walks(g, np.array(starts), num_steps=4, seed=5)
    assert _table_rows(out) == node2vec_np(src, dst, starts, 4, 5)


def test_walks_layout_independent():
    """Same corpus from 1-block and 8-block edge layouts on a seeded
    power-law graph (hub adjacency spans multiple input blocks)."""
    es = rmat(scale=8, avg_degree=6, seed=11)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    outs = []
    for blocks in (1, 8):
        g = build_graph(dedup_edges(edges_ds(src, dst, blocks)))
        starts = g.ids[:40]
        outs.append(_table_rows(random_walks(g, starts, num_steps=6, seed=5)))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 40  # walks actually advanced


def test_walks_rejects_unknown_start():
    g = build_graph(dedup_edges(edges_ds([0, 1], [1, 2])))
    with pytest.raises(ValueError, match="not in graph"):
        random_walks(g, np.array([42]), num_steps=2)


def test_weighted_walks_follow_cumweight_intervals():
    """Duplicate multiplicities bias the hop: reference = integer
    cumulative-weight inversion over ascending neighbors."""
    # 0→1 (×1), 0→2 (×3), 1→2 (×2), 2→0 (×1): duplicates carry weight
    src = [0, 0, 0, 0, 1, 1, 2]
    dst = [1, 2, 2, 2, 2, 2, 0]
    g = build_graph(dedup_edges(edges_ds(src, dst), weights="count"))
    out = random_walks(g, np.array([0, 1, 2]), num_steps=6, seed=7, weighted=True)

    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(s, {}).setdefault(d, 0)
        adj[s][d] += 1
    expect = []
    for w in [0, 1, 2]:
        cur = w
        expect.append((w, 0, w))
        for t in range(1, 7):
            nbrs = sorted(adj.get(cur, {}).items())
            tot = sum(c for _, c in nbrs)
            if tot == 0:
                break
            h = _mix64(np.array([np.uint64(w) * _GOLD ^ np.uint64(t) ^ np.uint64(7)]))[0]
            r = int(h % np.uint64(tot))
            acc = 0
            for d, c in nbrs:
                acc += c
                if r < acc:
                    cur = d
                    break
            expect.append((w, t, cur))
    assert _table_rows(out) == sorted(expect)


def test_weighted_walks_reject_fractional_weights():
    ds = edges_ds([0, 1], [1, 0]).map_batches(
        lambda t: t.append_column("weight", pa.array([0.5, 1.5])),
        batch_format="pyarrow",
    )
    g = build_graph(dedup_edges(ds, weights="sum"))
    with pytest.raises(Exception, match="integral"):
        random_walks(g, np.array([0]), num_steps=2, weighted=True)


def sample_np(src, dst, k, seed):
    """Hash-min k-subset per src, row-at-a-time."""
    adj = {}
    for s, d in set(zip(src, dst)):
        h = _mix64(np.array([np.uint64(s) * _GOLD ^ np.uint64(d) ^ np.uint64(seed)]))[0]
        adj.setdefault(s, []).append((h, d))
    out = []
    for s, hs in adj.items():
        for _, d in sorted(hs)[:k]:
            out.append((s, d))
    return sorted(out)


def test_sample_neighbors_matches_reference_and_layout():
    from llama_ray.algos.walks import sample_neighbors

    es = rmat(scale=7, avg_degree=8, seed=3)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    expect = sample_np(src, dst, 3, seed=17)
    got = []
    for blocks in (1, 8):
        g = build_graph(dedup_edges(edges_ds(src, dst, blocks)))
        out = sample_neighbors(g, 3, seed=17)
        got.append(
            sorted(zip(out.column("src").to_pylist(), out.column("dst").to_pylist()))
        )
    assert got[0] == expect  # uniform hash-min subset, exact
    assert got[0] == got[1]  # independent of block layout
    # every vertex keeps min(k, degree) neighbors, all real edges
    deg = {}
    edge_set = set(zip(src, dst))
    for s, d in got[0]:
        assert (s, d) in edge_set
        deg[s] = deg.get(s, 0) + 1
    full = {}
    for s, d in set(zip(src, dst)):
        full[s] = full.get(s, 0) + 1
    assert all(deg[s] == min(3, full[s]) for s in deg)


def test_feature_propagation_matches_dense_matmul():
    from llama_ray.algos.featprop import feature_propagation, hash_features

    es = rmat(scale=7, avg_degree=5, seed=9)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    g = build_graph(dedup_edges(edges_ds(src, dst, 4)))
    out = feature_propagation(g, k=3, rounds=2, seed=21)

    # dense oracle: X2 = A^T (A^T X0) with A the 0/1 adjacency
    n = g.num_vertices
    pos = {v: i for i, v in enumerate(g.ids)}
    A = np.zeros((n, n))
    for s, d in set(zip(src, dst)):
        A[pos[s], pos[d]] = 1.0
    X = hash_features(g.ids, 3, seed=21)
    for _ in range(2):
        X = A.T @ X
    got = (
        out.to_pandas()
        .sort_values(["vertex", "feat"])
        .reset_index(drop=True)["value"]
        .to_numpy()
        .reshape(n, 3)
    )
    assert np.array_equal(got, X)  # integer-valued doubles: exact


def luby_np(src, dst, seed):
    """Row-at-a-time Luby with the same unique priorities."""
    nbrs = {}
    verts = sorted(set(src) | set(dst))
    for s, d in set(zip(src, dst)):
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    und, mis, rnd = set(verts), set(), 0
    while und:
        rnd += 1
        p = {}
        for v in und:
            h = _mix64(np.array([np.uint64(v) * _GOLD ^ np.uint64(rnd) ^ np.uint64(seed)]))[0]
            p[v] = (int(h >> np.uint64(38)) << 26) + v
        w = {v for v in und if all(p[v] > p[u] for u in nbrs.get(v, set()) & und)}
        mis |= w
        und -= w | {u for v in w for u in nbrs.get(v, set())}
    return mis


def test_mis_matches_luby_reference_and_is_valid():
    from llama_ray.algos.mis import maximal_independent_set

    es = rmat(scale=8, avg_degree=4, seed=13)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    g = build_graph(dedup_edges(edges_ds(src, dst, 4)))
    out = maximal_independent_set(g, seed=77)
    got = {
        v for v, m in zip(out.column("vertex").to_pylist(), out.column("in_mis").to_pylist()) if m
    }
    assert got == luby_np(src, dst, 77)
    # validity: independent + maximal
    nbrs = {}
    for s, d in set(zip(src, dst)):
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    for v in got:
        assert not (nbrs.get(v, set()) & got), "two adjacent MIS members"
    for v in set(out.column("vertex").to_pylist()) - got:
        assert nbrs.get(v, set()) & got, f"non-member {v} has no MIS neighbor"


def test_hyperanf_estimates_reachability_and_diameter():
    from llama_ray.algos.hyperanf import hyperanf

    es = rmat(scale=9, avg_degree=6, seed=4)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    g = build_graph(dedup_edges(edges_ds(src, dst, 4)))
    res = hyperanf(g)

    # exact neighborhood function by BFS over the out-adjacency
    adj = {}
    for s, d in set(zip(src, dst)):
        adj.setdefault(s, set()).add(d)
    exact = []
    balls = {v: {v} for v in g.ids}
    exact.append(sum(len(b) for b in balls.values()))
    for _ in range(res.rounds):
        balls = {
            v: b | set().union(*(balls[w] for w in adj.get(v, set()))) if adj.get(v) else b
            for v, b in balls.items()
        }
        exact.append(sum(len(b) for b in balls.values()))
    # HLL with m=64 has ~13% per-vertex RSE and ball overlaps
    # correlate the errors (the same vertex hash feeds many balls),
    # so the V-sum doesn't average them away — accept 20%
    # (deterministic seed: this is a fixed value, not a flaky bound)
    for est, ex in zip(res.neighborhood_function, exact):
        assert abs(est - ex) / ex < 0.20, (est, ex)
    # monotone, saturating
    nf = res.neighborhood_function
    assert all(b >= a - 1e-9 for a, b in zip(nf, nf[1:]))
    assert 0 < res.effective_diameter <= res.rounds


def test_edge_support_matches_brute_force_and_tc():
    from llama_ray.algos.triangles import triangle_count
    from llama_ray.algos.truss import edge_support

    es = rmat(scale=8, avg_degree=8, seed=2)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    und = set((min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d)
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    exp = {(a, b): len(nbr[a] & nbr[b]) for a, b in und}

    outs = []
    for blocks in (1, 6):
        g = build_graph(dedup_edges(edges_ds(src, dst, blocks)))
        out = edge_support(g)
        outs.append(
            dict(
                zip(
                    zip(out.column("src").to_pylist(), out.column("dst").to_pylist()),
                    out.column("support").to_pylist(),
                )
            )
        )
    assert outs[0] == exp
    assert outs[0] == outs[1]  # block-layout independent
    # Σ support = 3 · triangle count (each triangle has 3 edges)
    g = build_graph(dedup_edges(edges_ds(src, dst, 6)))
    assert sum(outs[0].values()) == 3 * triangle_count(g)


def test_harmonic_centrality_tracks_exact_bfs():
    from llama_ray.algos.hyperanf import harmonic_centrality

    es = rmat(scale=8, avg_degree=6, seed=6)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    g = build_graph(dedup_edges(edges_ds(src, dst, 4)))
    out = harmonic_centrality(g)
    got = dict(zip(out.column("vertex").to_pylist(), out.column("harmonic").to_pylist()))

    # exact H(v) = sum over u of 1/d(u->v) by forward BFS from every u
    adj = {}
    for s, d in set(zip(src, dst)):
        if s != d:
            adj.setdefault(s, set()).add(d)
    import collections
    H = collections.defaultdict(float)
    for u in g.ids:
        dist = {u: 0}
        q = collections.deque([u])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):  # noqa
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, dd in dist.items():
            if dd > 0:
                H[v] += 1.0 / dd
    exact = np.array([H[v] for v in g.ids])
    est = np.array([got[v] for v in g.ids])
    nz = exact > 5  # vertices with meaningful centrality
    rel = np.abs(est[nz] - exact[nz]) / exact[nz]
    assert rel.mean() < 0.15, rel.mean()
    # rank agreement on the head: top-10 exact vertices all sit in the
    # estimated top-25
    top_exact = set(np.array(g.ids)[np.argsort(-exact)[:10]])
    top_est = set(np.array(g.ids)[np.argsort(-est)[:25]])
    assert top_exact <= top_est


def test_local_clustering_matches_brute_force():
    """coeff vs an O(V^3) dense-matrix oracle on the cyclic fixture
    family (incl. self-loops + duplicate directions)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.truss import local_clustering
    from llama_ray.graph import build_graph

    rng = np.random.default_rng(7)
    n = 40
    src, dst = [], []
    for _ in range(250):
        a, b = rng.integers(0, n, 2)
        src.append(int(a)); dst.append(int(b))
    g = build_graph(rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})))
    out = local_clustering(g)
    # dense oracle over the undirected simple graph
    A = np.zeros((n, n), bool)
    for a, b in zip(src, dst):
        if a != b:
            A[a, b] = A[b, a] = True
    Ai = A.astype(np.int64)
    deg = Ai.sum(1)
    tri = np.array([int(Ai[v] @ Ai @ Ai[:, v]) // 2 for v in range(n)])
    coeff = np.where(deg >= 2, 2.0 * tri / np.maximum(deg * (deg - 1), 1), 0.0)
    pos = {int(v): i for i, v in enumerate(g.ids)}
    got_tri = out.column("triangles").to_numpy()
    got_deg = out.column("degree").to_numpy()
    got_cf = out.column("coeff").to_numpy()
    for v in range(n):
        if v in pos:
            i = pos[v]
            assert got_tri[i] == tri[v], v
            assert got_deg[i] == deg[v], v
            assert abs(got_cf[i] - coeff[v]) < 1e-12, v


def test_ktruss_matches_brute_force_peel():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.truss import ktruss
    from llama_ray.graph import build_graph

    rng = np.random.default_rng(11)
    n = 30
    pairs = set()
    for _ in range(180):
        a, b = sorted(rng.integers(0, n, 2).tolist())
        if a != b:
            pairs.add((a, b))
    # plant a K5 so the 4-truss is non-empty
    for i in range(5):
        for j in range(i + 1, 5):
            pairs.add((i, j))
    src = [a for a, b in pairs] + [b for a, b in pairs]  # mixed directions
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    g = build_graph(rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})))

    def peel(edges, k):
        edges = set(edges)
        while True:
            adj = {}
            for a, b in edges:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {e: len(adj[e[0]] & adj[e[1]]) for e in edges}
            drop = {e for e, s in sup.items() if s < k - 2}
            if not drop:
                return {e: s for e, s in sup.items()}
            edges -= drop

    for k in (3, 4, 5):
        t, _ = ktruss(g, k)
        got = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(
                t.column("src").to_pylist(), t.column("dst").to_pylist(),
                t.column("support").to_pylist())
        }
        assert got == peel(pairs, k), k
    # K5's 4-truss (k=5 needs support>=3: exactly the planted clique
    # unless the random graph adds more)
    t5, _ = ktruss(g, 5)
    clique = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    assert clique <= set(zip(t5.column("src").to_pylist(), t5.column("dst").to_pylist())) or peel(pairs, 5) == {}


def test_stats_trio_match_brute_force():
    """assortativity / reciprocity / modularity vs row-at-a-time
    oracles on a random directed graph WITH mutual edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.stats import degree_assortativity, modularity, reciprocity
    from llama_ray.graph import build_graph, canonical_undirected
    from llama_ray.ingest.canonicalize import dedup_edges

    rng = np.random.default_rng(23)
    n = 25
    es = set()
    for _ in range(120):
        a, b = rng.integers(0, n, 2)
        es.add((int(a), int(b)))
        if rng.random() < 0.4:
            es.add((int(b), int(a)))  # plant mutual pairs
    src = [a for a, b in es]
    dst = [b for a, b in es]
    ds = dedup_edges(rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})))
    g = build_graph(ds)
    cg = canonical_undirected(g)

    # --- reciprocity oracle (over dense graph edges ≡ original pairs)
    nonself = {(a, b) for a, b in es if a != b}
    mutual = sum(1 for a, b in nonself if (b, a) in nonself)
    rt = reciprocity(g.edges)
    assert rt.column("total_edges")[0].as_py() == len(nonself)
    assert rt.column("mutual_edges")[0].as_py() == mutual
    assert mutual > 0  # the planted pairs actually exercise the path
    assert abs(rt.column("reciprocity")[0].as_py() - mutual / len(nonself)) < 1e-12

    # --- undirected simple view for the other two
    und = {(min(a, b), max(a, b)) for a, b in nonself}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1

    at = degree_assortativity(cg)
    xs = [deg[a] for a, b in und] + [deg[b] for a, b in und]
    ys = [deg[b] for a, b in und] + [deg[a] for a, b in und]
    r_oracle = np.corrcoef(xs, ys)[0, 1]
    assert at.column("n_pairs")[0].as_py() == 2 * len(und)
    assert abs(at.column("assortativity")[0].as_py() - r_oracle) < 1e-9

    # --- modularity of an arbitrary 3-way partition
    labels = np.array([int(v) % 3 for v in cg.ids])
    mt = modularity(cg, labels)
    m = len(und)
    intra = sum(1 for a, b in und if a % 3 == b % 3)
    a_c = {}
    for v, d in deg.items():
        a_c[v % 3] = a_c.get(v % 3, 0) + d
    q_oracle = intra / m - sum(s * s for s in a_c.values()) / (4 * m * m)
    assert mt.column("intra_edges")[0].as_py() == intra
    assert abs(mt.column("modularity")[0].as_py() - q_oracle) < 1e-12


def test_greedy_coloring_proper_and_matches_sequential():
    """JP coloring == sequential greedy in decreasing priority order,
    and is a proper coloring; layout-independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.coloring import _priorities, greedy_coloring
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=8, avg_degree=6, seed=13)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())})).repartition(blocks)
        )
        g = build_graph(ds)
        t = greedy_coloring(g)
        outs.append(sorted(zip(t.column("vertex").to_pylist(), t.column("color").to_pylist())))
    assert outs[0] == outs[1]
    got = dict(outs[0])

    # adjacency (undirected simple, no self-loops)
    nbrs = {}
    for a, b in set(zip(src.tolist(), dst.tolist())):
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    # proper coloring
    for v, ns in nbrs.items():
        for w in ns:
            assert got[v] != got[w]
    # sequential-greedy equivalence
    verts = np.array(sorted(got))
    p = _priorities(verts, 20260818)
    order = verts[np.argsort(-p)]
    ref = {}
    for v in order:
        used = {ref[w] for w in nbrs.get(v, ()) if w in ref}
        c = 0
        while c in used:
            c += 1
        ref[v] = c
    assert got == ref


def test_link_prediction_matches_brute_force():
    """CN/AA/Jaccard over capped wedges == dict-based brute force;
    layout-independent; already-adjacent pairs excluded."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.linkpred import link_prediction
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=8, avg_degree=8, seed=29)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    cap, k = 16, 60

    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())})).repartition(blocks)
        )
        g = build_graph(ds)
        t = link_prediction(g, k=k, max_center_degree=cap)
        outs.append(t.to_pandas())
    assert outs[0].equals(outs[1])
    got = outs[0]

    # brute force
    nbrs: dict[int, set] = {}
    for a, b in set(zip(src.tolist(), dst.tolist())):
        if a != b:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    scores: dict[tuple, list] = {}
    for c, ns in nbrs.items():
        if len(ns) > cap:
            continue
        sn = sorted(ns)
        for i in range(len(sn)):
            for j in range(i + 1, len(sn)):
                x, y = sn[i], sn[j]
                if y in nbrs[x]:
                    continue
                e = scores.setdefault((x, y), [0, 0.0])
                e[0] += 1
                e[1] += 1.0 / math.log(len(ns))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    assert len(got) == min(k, len(ranked))
    for row, ((x, y), (cn, aa)) in zip(got.itertuples(index=False), ranked):
        assert (row.u, row.w, row.cn) == (x, y, cn)
        assert abs(row.aa - aa) < 1e-6
        jac = cn / (len(nbrs[x]) + len(nbrs[y]) - cn)
        assert abs(row.jaccard - jac) < 1e-6


def test_closeness_sampled_matches_brute_force():
    """Directed-BFS closeness from the 8 smallest ids == dict-BFS
    oracle, layout-independent."""
    from collections import deque

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.traversal import closeness_sampled
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=7, avg_degree=3, seed=23)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()

    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())})).repartition(blocks)
        )
        outs.append(closeness_sampled(build_graph(ds)).to_pandas())
    assert outs[0].equals(outs[1])

    nbrs: dict[int, set] = {}
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    for v in verts:
        nbrs[v] = set()
    for a, b in set(zip(src.tolist(), dst.tolist())):
        if a != b:
            nbrs[a].add(b)

    for row, s in zip(outs[0].itertuples(), verts[:8]):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        r, sd = len(dist), sum(dist.values())
        assert (row.source, row.reached, row.sum_dist) == (s, r, sd)
        assert row.closeness == (round((r - 1) / sd, 6) if sd else 0.0)


def test_harmonic_sampled_matches_brute_force():
    """Directed-BFS harmonic centrality from the 8 smallest ids ==
    dict-BFS oracle, layout-independent; unreachable targets
    contribute 0 (disconnected-graph well-definedness)."""
    from collections import deque

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.traversal import harmonic_sampled
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=7, avg_degree=3, seed=31)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()

    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())})).repartition(blocks)
        )
        outs.append(harmonic_sampled(build_graph(ds)).to_pandas())
    assert outs[0].equals(outs[1])

    nbrs: dict[int, set] = {}
    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    for v in verts:
        nbrs[v] = set()
    for a, b in set(zip(src.tolist(), dst.tolist())):
        if a != b:
            nbrs[a].add(b)

    for row, s in zip(outs[0].itertuples(), verts[:8]):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        # per-distance-level ascending accumulation — the exact order
        # the engine and the SQL oracle both use
        cnt: dict[int, int] = {}
        for d in dist.values():
            if d > 0:
                cnt[d] = cnt.get(d, 0) + 1
        h = 0.0
        for d in sorted(cnt):
            h += cnt[d] / d
        assert (row.source, row.reached) == (s, len(dist))
        assert row.harmonic == round(h, 6)


def test_maximal_matching_matches_sequential_greedy():
    """Local-max matching == sequential greedy over edges sorted by
    decreasing priority; output is a valid maximal matching;
    layout-independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.matching import _edge_priority, maximal_matching
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=7, avg_degree=4, seed=5)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()

    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(
                pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
            ).repartition(blocks)
        )
        outs.append(maximal_matching(build_graph(ds)).to_pandas())
    assert outs[0].equals(outs[1])
    got = set(zip(outs[0]["a"], outs[0]["b"]))

    # sequential greedy oracle over the canonical simple edge set
    pairs = sorted({(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b})
    a_arr = np.array([p[0] for p in pairs], np.int64)
    b_arr = np.array([p[1] for p in pairs], np.int64)
    pri = _edge_priority(a_arr, b_arr, 20260818)
    assert len(np.unique(pri)) == len(pri)  # priorities unique on this input
    order = np.argsort(-pri, kind="stable")
    taken = set()
    want = set()
    for i in order:
        a, b = int(a_arr[i]), int(b_arr[i])
        if a not in taken and b not in taken:
            want.add((a, b))
            taken.add(a)
            taken.add(b)
    assert got == want
    # maximality: every canonical edge touches a matched vertex
    mv = {v for ab in got for v in ab}
    assert all(a in mv or b in mv for a, b in pairs)


def test_pseudo_diameter_matches_brute_force():
    """Double-sweep result == dict-BFS oracle (start, ecc, far choice
    with min-id tie-break, second ecc); layout-independent."""
    from collections import deque

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llama_ray.algos.traversal import pseudo_diameter
    from llama_ray.graph import build_graph
    from llama_ray.ingest.canonicalize import dedup_edges
    from llama_ray.sources.generators import rmat

    es = rmat(scale=7, avg_degree=3, seed=11)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()

    outs = []
    for blocks in (1, 8):
        ds = dedup_edges(
            rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())})).repartition(blocks)
        )
        outs.append(pseudo_diameter(build_graph(ds)).to_pandas())
    assert outs[0].equals(outs[1])
    got = outs[0].iloc[0]

    nbrs: dict[int, set] = {}
    verts = set(src.tolist()) | set(dst.tolist())
    for v in verts:
        nbrs[v] = set()
    for a, b in set(zip(src.tolist(), dst.tolist())):
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)

    def bfs(s):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in nbrs[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        return dist

    start = min(verts)
    d1 = bfs(start)
    ecc1 = max(d1.values())
    far = min(v for v, d in d1.items() if d == ecc1)
    ecc2 = max(bfs(far).values())
    assert (got.start, got.ecc_start, got.far, got.ecc_far) == (start, ecc1, far, ecc2)


def partition_np(src, dst, k, rounds):
    """Row-at-a-time reference of algos.partition.balanced_partition
    over the canonical undirected simple graph."""
    es = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    ids = sorted({v for e in es for v in e})
    adj = {v: [] for v in ids}
    for a, b in es:
        adj[a].append(b)
        adj[b].append(a)
    n = len(ids)
    cap = (n + k - 1) // k
    part = {v: v % k for v in ids}
    for r in range(1, rounds + 1):
        loads = [0] * k
        for v in ids:
            loads[part[v]] += 1
        new = dict(part)
        movers = []
        for v in ids:
            cnt = [0] * k
            for u in adj[v]:
                cnt[part[u]] += 1
            d = max(len(adj[v]), 1)
            scores = [cnt[p] * cap - loads[p] * d for p in range(k)]
            best = max(range(k), key=lambda p: (scores[p], -p))
            if (v + r) % 2 == 0 and scores[best] > scores[part[v]]:
                movers.append((v, best, scores[best] - scores[part[v]]))
        # ranked capacity admission per target part
        by_part = {}
        for v, b, gain in movers:
            by_part.setdefault(b, []).append((v, gain))
        for b, cands in by_part.items():
            cands.sort(key=lambda t: (-t[1], t[0]))
            for v, _ in cands[: max(cap - loads[b], 0)]:
                new[v] = b
        part = new
    return ids, part


def test_balanced_partition_matches_reference_and_balances():
    from llama_ray.algos.partition import balanced_partition
    from llama_ray.graph import canonical_undirected

    es = rmat(8, 6, seed=17)
    tbl = es.materialize().to_pandas()
    src, dst = tbl["src"].to_numpy(), tbl["dst"].to_numpy()
    ids, ref = partition_np(src, dst, 4, 3)
    for blocks in (1, 6):
        g = canonical_undirected(build_graph(dedup_edges(edges_ds(src, dst, blocks))))
        labels, stats = balanced_partition(g, k=4, rounds=3)
        assert np.array_equal(g.ids, np.array(ids))
        assert labels.tolist() == [ref[v] for v in ids]
        # capacity admission keeps every part within ~cap
        assert stats["loads"].max() <= (len(ids) // 4 + 1) + 3
        assert stats["loads"].sum() == len(ids)
        # cut metric consistent with the labels
        lab = {v: ref[v] for v in ids}
        cut = sum(1 for a, b in {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
                  if lab[a] != lab[b])
        assert stats["edge_cut"] == cut


def test_walk_context_pairs_matches_brute_force(ray_session):
    """r5 skip-gram pairs: exact counts vs a brute-force window scan,
    bit-identical across block layouts (walks split mid-walk)."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from llama_ray.algos.walks import walk_context_pairs

    rng = np.random.default_rng(37)
    rows = []
    for w in range(30):
        L = int(rng.integers(1, 6))
        verts = rng.integers(0, 50, L)
        for s in range(L):
            rows.append({"walk_id": w, "step": s, "vertex": int(verts[s])})
    window = 2
    exp: dict = {}
    by_walk: dict = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], []).append(r)
    for w, rs in by_walk.items():
        rs = sorted(rs, key=lambda r: r["step"])
        for a, b in itertools.permutations(rs, 2):
            if 0 < abs(a["step"] - b["step"]) <= window:
                key = (a["vertex"], b["vertex"])
                exp[key] = exp.get(key, 0) + 1
    outs = []
    for nb in (1, 7):
        out = (
            walk_context_pairs(rd.from_items(rows).repartition(nb), window=window)
            .to_pandas()
            .sort_values(["center", "context"])
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])
    got = {
        (int(r.center), int(r.context)): int(r.cnt) for r in outs[0].itertuples()
    }
    assert got == exp


def test_khop_subgraph_matches_brute_force(ray_session):
    """r5 GNN expansion: hop-tagged distinct edge union equals a dense
    BFS recomputation, layout-independent."""
    import ray.data as rd

    from llama_ray.algos.walks import khop_subgraph
    from llama_ray.graph import build_graph

    rng = np.random.default_rng(41)
    src = rng.integers(0, 60, 400).astype(np.int64)
    dst = rng.integers(0, 60, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    seeds = np.array([0, 1, 2, 3, 4], np.int64)
    outs = []
    for nb in (1, 6):
        g = build_graph(ds.repartition(nb))
        out = (
            khop_subgraph(g, seeds, hops=3)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]

    edges = set(zip(src.tolist(), dst.tolist()))
    exp = {}
    visited = set(seeds.tolist())
    frontier = set(seeds.tolist())
    for h in (1, 2, 3):
        hop_edges = {(a, b) for (a, b) in edges if a in frontier}
        for e_ in hop_edges:
            exp[e_] = h
        reach = {b for (_a, b) in hop_edges}
        frontier = reach - visited
        visited |= frontier
    got = {(int(r.src), int(r.dst)): int(r.hop) for r in out.itertuples()}
    assert got == exp
