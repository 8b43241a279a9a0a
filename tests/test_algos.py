"""Algorithm correctness vs numpy oracles on tiny fixtures + seeded
generator graphs (FIXTURES.md §3-4)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from llama_ray.algos.components import label_propagation, weakly_connected_components
from llama_ray.algos.pagerank import pagerank, pagerank_top_k
from llama_ray.algos.traversal import bfs, sssp
from llama_ray.algos.triangles import triangle_count
from llama_ray.graph import build_graph
from llama_ray.ingest.canonicalize import dedup_edges, undirected_ordered
from llama_ray.sources.generators import rmat

from np_oracles import bellman_ford_np, bfs_np, lp_np, pagerank_np, triangles_np, wcc_np

FIXTURES = {
    "chain5": ([0, 1, 2, 3], [1, 2, 3, 4]),
    "cycle4": ([0, 1, 2, 3], [1, 2, 3, 0]),
    "k4": ([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3]),
    "two_triangles": ([0, 1, 2, 3, 4, 5], [1, 2, 0, 4, 5, 3]),
    "star_hub": (list(range(1, 100)), [0] * 99),
    "dup_selfloop": ([0, 0, 0, 1, 2, 2], [1, 1, 0, 2, 2, 0]),
}
TRIANGLES = {"chain5": 0, "cycle4": 0, "k4": 4, "two_triangles": 2, "star_hub": 0, "dup_selfloop": 1}


def edges_ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def dense(src, dst):
    """(dense_src, dense_dst, ids) for the oracle side."""
    ids = np.unique(np.concatenate([src, dst]))
    return np.searchsorted(ids, src), np.searchsorted(ids, dst), ids


def test_dense_graph_int32_storage():
    """Dense graphs store int32 src/dst when V <= 2^31 (halves the
    pinned table and every downstream read), and canonical graphs
    keep the compact dtype through the packed-key sort."""
    import pyarrow as _pa
    from llama_ray.graph import canonical_undirected

    g = build_graph(edges_ds([5, 7, 9, 5], [7, 9, 5, 5]))
    sch = g.edges.schema()
    assert sch.base_schema.field("src").type == _pa.int32()
    assert sch.base_schema.field("dst").type == _pa.int32()
    c = canonical_undirected(g)
    csch = c.edges.schema()
    assert csch.base_schema.field("src").type == _pa.int32()
    # original-id mapping stays int64
    assert g.ids.dtype == np.int64


@pytest.mark.parametrize("name", list(FIXTURES))
def test_pagerank_matches_oracle(name):
    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    res = pagerank(g, max_iters=10)
    ds_, dd_, ids = dense(src, dst)
    expect = pagerank_np(ds_, dd_, len(ids))
    assert np.allclose(res.state["rank"], expect, atol=1e-6)


def test_pagerank_uniform_on_cycle():
    src, dst = map(np.array, FIXTURES["cycle4"])
    g = build_graph(edges_ds(src, dst))
    res = pagerank(g, max_iters=30, tol=1e-12)
    assert np.allclose(res.state["rank"], 0.25, atol=1e-9)
    assert res.converged


def test_pagerank_convergence_mode():
    src, dst = map(np.array, FIXTURES["star_hub"])
    g = build_graph(edges_ds(src, dst))
    res = pagerank(g, max_iters=50, tol=1e-6)
    assert res.converged
    assert res.iterations < 50
    top = pagerank_top_k(g, res, 3)
    assert top[0][0] == 0  # hub


def test_pagerank_push_equals_pull():
    src, dst = map(np.array, FIXTURES["k4"])
    g = build_graph(edges_ds(src, dst))
    a = pagerank(g, max_iters=10, mode="pull")
    b = pagerank(g, max_iters=10, mode="push")
    assert np.allclose(a.state["rank"], b.state["rank"], atol=1e-12)


def test_pagerank_warm_start_all_engines():
    """init_rank warm start (snapshot-delta recompute): all three
    engines honor it bit-identically, k warm iterations equal k cold
    iterations applied to the same vector, and warm-starting from the
    converged fixpoint stays at the fixpoint."""
    g = build_graph(rmat(7, 5, seed=21))
    n = g.num_vertices
    rng = np.random.default_rng(3)
    init = rng.random(n)
    init /= init.sum()
    outs = [
        pagerank(g, max_iters=3, engine=e, init_rank=init).state["rank"]
        for e in ("dataset", "bsp", "bsp_sharded")
    ]
    # dataset vs bsp agree up to in-run float addition order; the two
    # bsp engines are bit-identical (same gather kernel)
    assert np.allclose(outs[0], outs[1], rtol=0, atol=1e-14)
    assert np.array_equal(outs[1], outs[2])
    # warm(3) == manual: 3 cold steps seeded with init (engine math
    # identical, only the start vector differs from the default)
    two = pagerank(g, max_iters=2, init_rank=init).state["rank"]
    three = pagerank(g, max_iters=1, init_rank=two).state["rank"]
    assert np.array_equal(outs[0], three)
    # near-fixpoint: warm-started iteration barely moves
    cold = pagerank(g, max_iters=400, tol=1e-13)
    assert cold.converged
    warm = pagerank(g, max_iters=1, init_rank=cold.state["rank"])
    assert np.abs(warm.state["rank"] - cold.state["rank"]).sum() < 1e-12


def test_wcc_warm_start_incremental():
    """init_labels warm start: WCC on a base edge subset, then the
    full graph warm-started from those labels — exact (same labels as
    cold) in every engine, and the warm fixpoint needs fewer
    supersteps than cold on a long path whose base is pre-merged."""
    # path 0-1-2-...-19 plus a separate clique; base = all but one edge
    src = list(range(19)) + [100, 100, 101]
    dst = list(range(1, 20)) + [101, 102, 102]
    full = edges_ds(np.array(src), np.array(dst))
    base = edges_ds(np.array(src[:9] + src[10:]), np.array(dst[:9] + dst[10:]))
    g0 = build_graph(base)
    g1 = build_graph(full)
    cold = weakly_connected_components(g1)
    w0 = weakly_connected_components(g0)
    init = g1.ids.copy()
    pos = np.searchsorted(g1.ids, g0.ids)
    init[pos] = w0.state["label"]
    for engine in ("dataset", "bsp", "bsp_sharded"):
        warm = weakly_connected_components(g1, engine=engine, init_labels=init)
        assert np.array_equal(warm.state["label"], cold.state["label"])
        assert warm.iterations < cold.iterations
    with pytest.raises(ValueError):
        weakly_connected_components(g1, init_labels=np.full(g1.num_vertices, -5))


@pytest.mark.parametrize("name", list(FIXTURES))
def test_wcc_matches_oracle(name):
    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    res = weakly_connected_components(g)
    ds_, dd_, ids = dense(src, dst)
    expect = wcc_np(ds_, dd_, ids)
    assert np.array_equal(res.state["label"], expect)


def test_wcc_two_components():
    src, dst = map(np.array, FIXTURES["two_triangles"])
    g = build_graph(edges_ds(src, dst))
    res = weakly_connected_components(g)
    assert set(res.state["label"]) == {0, 3}


@pytest.mark.parametrize("name", list(FIXTURES))
def test_triangle_count_matches_oracle(name):
    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    ds_, dd_, ids = dense(src, dst)
    assert triangle_count(g) == TRIANGLES[name] == triangles_np(ds_, dd_, len(ids))


@pytest.mark.parametrize("name", list(FIXTURES))
def test_label_propagation_matches_oracle(name):
    src, dst = map(np.array, FIXTURES[name])
    canonical = dedup_edges(undirected_ordered(edges_ds(src, dst), drop_self_loops=True))
    g = build_graph(canonical)
    res = label_propagation(g, iterations=4)
    cs = canonical.to_pandas()
    ids = np.unique(np.concatenate([cs["src"], cs["dst"]]))
    s = np.searchsorted(ids, cs["src"].to_numpy())
    d = np.searchsorted(ids, cs["dst"].to_numpy())
    expect = ids[lp_np(s, d, len(ids), iterations=4)]
    assert np.array_equal(res.state["label"], expect)
    # BSP mode-gather engine: bit-identical to the dataset engine
    res_bsp = label_propagation(g, iterations=4, engine="bsp")
    assert np.array_equal(res_bsp.state["label"], expect)


def test_canonical_undirected_matches_generic():
    """canonical_undirected (packed single-sort fast path) must equal
    the generic undirected_ordered + dedup + rebuild, including the
    self-loop-only vertex drop."""
    from llama_ray.graph import canonical_undirected

    src = np.array([0, 1, 2, 2, 3, 5, 5, 7])
    dst = np.array([1, 0, 3, 3, 2, 5, 5, 7])  # 5,7: self-loop-only
    parent = build_graph(edges_ds(src, dst))
    fast = canonical_undirected(parent)
    generic = build_graph(dedup_edges(undirected_ordered(parent.edges, drop_self_loops=True)))
    generic_ids = parent.ids[generic.ids]
    assert np.array_equal(fast.ids, generic_ids)
    fe = fast.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    ge = generic.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert fe.equals(ge)
    assert fast.num_edges == generic.num_edges
    assert np.array_equal(fast.out_degrees, generic.out_degrees)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_bfs_matches_oracle(name):
    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    root = int(g.ids[0])
    res = bfs(g, root)
    ds_, dd_, ids = dense(src, dst)
    expect = bfs_np(ds_, dd_, len(ids), 0)
    assert np.array_equal(res.state["dist"], expect)


def test_sssp_weighted_matches_bellman_ford():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 30, 120)
    dst = rng.integers(0, 30, 120)
    w = rng.integers(1, 10, 120).astype(np.float64)
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)})
    )
    g = build_graph(ds)
    root = int(g.ids[0])
    res = sssp(g, root, weighted=True)
    di, dj, ids = dense(src, dst)
    expect = bellman_ford_np(di, dj, w, len(ids), int(np.searchsorted(ids, root)))
    assert np.allclose(res.state["dist"], expect, equal_nan=True)


def test_rmat_graph_against_oracles():
    edges = rmat(7, 4, seed=11).materialize()
    df = edges.to_pandas()
    g = build_graph(edges)
    di, dj, ids = dense(df["src"].to_numpy(), df["dst"].to_numpy())
    n = len(ids)

    pr = pagerank(g, max_iters=10)
    assert np.allclose(pr.state["rank"], pagerank_np(di, dj, n), atol=1e-6)

    wcc = weakly_connected_components(g)
    assert np.array_equal(wcc.state["label"], wcc_np(di, dj, ids))

    assert triangle_count(g) == triangles_np(di, dj, n)


def test_rmat_deterministic():
    a = rmat(6, 4, seed=3).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = rmat(6, 4, seed=3).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)


# ------------------------------------------------------------------ SCC

SCC_FIXTURES = {
    # cycle + tail: SCC {0,1,2} differs from WCC {0..4}
    "cycle_tail": ([0, 1, 2, 2, 3], [1, 2, 0, 3, 4]),
    # two 2-cycles bridged one-way: SCCs {0,1},{2,3} but one WCC
    "two_cycles_bridge": ([0, 1, 1, 2, 3], [1, 0, 2, 3, 2]),
    "dag_chain": ([0, 1, 2, 3], [1, 2, 3, 4]),
    "self_loops": ([0, 1, 1, 2], [0, 1, 2, 1]),
}


@pytest.mark.parametrize("name", sorted(SCC_FIXTURES))
def test_scc_matches_tarjan(name):
    from llama_ray.algos.components import strongly_connected_components
    from np_oracles import tarjan_scc_np

    src, dst = map(np.array, SCC_FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    res = strongly_connected_components(g)
    # oracle over the same dense index space
    s = np.searchsorted(g.ids, src)
    d = np.searchsorted(g.ids, dst)
    expect = g.ids[tarjan_scc_np(s, d, g.num_vertices)]
    assert np.array_equal(res.state["label"], expect)


def test_scc_differs_from_wcc():
    from llama_ray.algos.components import strongly_connected_components

    src, dst = map(np.array, SCC_FIXTURES["cycle_tail"])
    g = build_graph(edges_ds(src, dst))
    scc = strongly_connected_components(g).state["label"]
    wcc = weakly_connected_components(g).state["label"]
    assert len(np.unique(scc)) == 3  # {0,1,2},{3},{4}
    assert len(np.unique(wcc)) == 1
    assert not np.array_equal(scc, wcc)


def test_scc_random_directed():
    from llama_ray.algos.components import strongly_connected_components
    from np_oracles import tarjan_scc_np

    rng = np.random.default_rng(3)
    n, m = 200, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = build_graph(edges_ds(src, dst))
    res = strongly_connected_components(g)
    s = np.searchsorted(g.ids, src)
    d = np.searchsorted(g.ids, dst)
    expect = g.ids[tarjan_scc_np(s, d, g.num_vertices)]
    assert np.array_equal(res.state["label"], expect)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_triangle_count_shuffle_probe(name):
    """Wedge-shuffle probe mode (the multi-node path) equals the
    broadcast-probe default."""
    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    assert triangle_count(g, probe="shuffle") == TRIANGLES[name]


def test_triangle_count_shuffle_probe_rmat():
    g = build_graph(rmat(9, 8, seed=4))
    assert triangle_count(g, probe="shuffle") == triangle_count(g)


def k4_np(src, dst):
    """Brute-force K4 count over the canonical undirected simple graph."""
    from itertools import combinations

    es = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    ids = sorted({v for e in es for v in e})
    adj = {v: set() for v in ids}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    cnt = 0
    for quad in combinations(ids, 4):
        if all((min(x, y), max(x, y)) in es for x, y in combinations(quad, 2)):
            cnt += 1
    return cnt


@pytest.mark.parametrize("name", list(FIXTURES))
def test_four_cliques_match_brute_force(name):
    from llama_ray.algos.cliques import four_clique_count

    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    assert four_clique_count(g) == k4_np(src, dst)


def test_four_cliques_rmat_and_planted_k6():
    """R-MAT background + a planted K6 (adds C(6,4)=15 cliques on
    fresh vertices) vs brute force; layout-independent."""
    from itertools import combinations

    from llama_ray.algos.cliques import four_clique_count

    tbl = rmat(7, 6, seed=13).materialize().to_pandas()
    src = tbl["src"].to_numpy().tolist()
    dst = tbl["dst"].to_numpy().tolist()
    k6 = [1000 + i for i in range(6)]
    for a, b in combinations(k6, 2):
        src.append(a)
        dst.append(b)
    expect = k4_np(src, dst)
    assert expect >= 15
    for blocks in (1, 7):
        ds_ = edges_ds(src, dst).repartition(blocks)
        g = build_graph(ds_)
        assert four_clique_count(g) == expect


def test_core_numbers_matches_peeling_oracle():
    from llama_ray.algos.kcore import core_numbers
    from llama_ray.graph import canonical_undirected
    from np_oracles import core_numbers_np

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 60
        m = 240
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        g = canonical_undirected(build_graph(edges_ds(src, dst)))
        res = core_numbers(g)
        assert res.converged
        cs = g.edges.to_pandas()
        ids = g.ids
        s = np.searchsorted(ids, ids[cs["src"].to_numpy()])
        d = np.searchsorted(ids, ids[cs["dst"].to_numpy()])
        expect = core_numbers_np(s, d, g.num_vertices)
        assert np.array_equal(res.state["core"], expect)


def test_core_numbers_engines_bit_identical():
    from llama_ray.algos.kcore import core_numbers
    from llama_ray.graph import canonical_undirected

    rng = np.random.default_rng(23)
    src = rng.integers(0, 200, 900)
    dst = rng.integers(0, 200, 900)
    g = canonical_undirected(build_graph(edges_ds(src, dst)))
    a = core_numbers(g, engine="bsp")
    b = core_numbers(g, engine="bsp_sharded")
    assert np.array_equal(a.state["core"], b.state["core"])
    assert a.iterations == b.iterations


def test_core_numbers_fixture():
    from llama_ray.algos.kcore import core_numbers
    from llama_ray.graph import canonical_undirected

    # triangle 0-1-2 with pendant 3 and isolated-ish chain 4-5
    g = canonical_undirected(
        build_graph(edges_ds([0, 1, 2, 2, 4], [1, 2, 0, 3, 5]))
    )
    res = core_numbers(g)
    got = dict(zip(g.ids.tolist(), res.state["core"].tolist()))
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 1}


@pytest.mark.slow
def test_scc_long_cycle_in_rmat_background():
    """A diameter-10^4+ cycle embedded in an R-MAT background must
    CONVERGE through the FB-coloring inner loops (the r2 fix raises on
    cap exhaustion instead of truncating — this proves realistic-depth
    inputs never hit the caps), and the labels must match Tarjan."""
    from llama_ray.algos.components import strongly_connected_components
    from llama_ray.sources.generators import rmat
    from np_oracles import tarjan_scc_np

    bg = rmat(12, 4, seed=7).to_pandas()  # 4096-vertex background
    L = 12_000  # cycle diameter >> any R-MAT path length
    base = 1 << 20  # disjoint id range
    cyc_src = np.arange(L, dtype=np.int64) + base
    cyc_dst = np.concatenate([cyc_src[1:], cyc_src[:1]])
    # a few bridges background -> cycle (keeps it one weak component,
    # still exactly one giant SCC = the cycle)
    bridge_src = np.array([0, 1, 2], np.int64)
    bridge_dst = np.array([base, base + 5, base + 11_000], np.int64)
    src = np.concatenate([bg["src"].to_numpy(), cyc_src, bridge_src])
    dst = np.concatenate([bg["dst"].to_numpy(), cyc_dst, bridge_dst])
    g = build_graph(edges_ds(src, dst))
    res = strongly_connected_components(g)  # raises if any cap is hit
    s = np.searchsorted(g.ids, src)
    d = np.searchsorted(g.ids, dst)
    expect = g.ids[tarjan_scc_np(s, d, g.num_vertices)]
    assert np.array_equal(res.state["label"], expect)
    # the cycle is one SCC labeled by its min id
    cyc_pos = np.searchsorted(g.ids, cyc_src)
    assert (res.state["label"][cyc_pos] == base).all()


def hits_np(src, dst, n, iters=5):
    """Dense-matrix HITS with L1 normalization (independent oracle)."""
    A = np.zeros((n, n))
    np.add.at(A, (np.asarray(src), np.asarray(dst)), 1.0)
    # duplicates each contribute — but the engine runs on deduped
    # fixtures here, so A is 0/1 for the graphs used below
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        if a.sum() > 0:
            a /= a.sum()
        h = A @ a
        if h.sum() > 0:
            h /= h.sum()
    return h, a


@pytest.mark.parametrize("name", ["chain5", "cycle4", "k4", "two_triangles", "star_hub"])
def test_hits_matches_dense_oracle(name):
    from llama_ray.algos.hits import hits

    src, dst = FIXTURES[name]
    g = build_graph(edges_ds(src, dst))
    h, a, iters = hits(g, max_iters=5)
    ds, dd, ids = dense(src, dst)
    eh, ea = hits_np(ds, dd, len(ids), iters=5)
    order = np.searchsorted(ids, g.ids)
    np.testing.assert_allclose(h, eh[order], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a, ea[order], rtol=1e-12, atol=1e-15)
    assert iters == 5
    # hub/authority intuition: in star_hub every leaf points at 0, so
    # vertex 0 is the sole authority and every leaf an equal hub
    if name == "star_hub":
        assert np.argmax(a) == int(np.searchsorted(g.ids, 0))
        assert a.max() == pytest.approx(1.0)


# ---------------------------------------------------------------- Katz


@pytest.mark.parametrize("name", list(FIXTURES))
def test_katz_matches_oracle(name):
    from np_oracles import katz_np

    from llama_ray.algos.katz import katz_centrality

    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    ds_, dd_, ids = dense(src, dst)
    expect = katz_np(ds_, dd_, len(ids))
    a = katz_centrality(g, iterations=8, engine="dataset")
    b = katz_centrality(g, iterations=8, engine="bsp")
    # bit-exact, not just close: the dyadic default alpha (2^-4) makes
    # every partial sum exact, so reduction order cannot matter
    assert np.array_equal(a.state["katz"], expect)
    assert np.array_equal(b.state["katz"], expect)


def test_katz_star_orders_hub_first():
    from llama_ray.algos.katz import katz_centrality

    src, dst = map(np.array, FIXTURES["star_hub"])
    g = build_graph(edges_ds(src, dst))
    x = katz_centrality(g).state["katz"]
    assert np.argmax(x) == 0  # all 99 spokes point at the hub


# ------------------------------------------------------ weighted PageRank


def test_pagerank_weighted_matches_oracle():
    from np_oracles import pagerank_weighted_np

    src = np.array([0, 0, 1, 2, 3, 3])
    dst = np.array([1, 2, 2, 3, 0, 1])
    w = np.array([3.0, 1.0, 2.0, 5.0, 1.0, 4.0])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    g = build_graph(ds)
    res = pagerank(g, max_iters=10, weight_col="weight")
    expect = pagerank_weighted_np(src, dst, w, 4)
    assert np.allclose(res.state["rank"], expect, atol=1e-12)


def test_pagerank_weighted_unit_weights_equal_unweighted():
    src, dst = map(np.array, FIXTURES["k4"])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(np.ones(len(src)), pa.float64()),
            }
        )
    )
    g = build_graph(ds)
    a = pagerank(g, max_iters=10, weight_col="weight")
    b = pagerank(g, max_iters=10)
    assert np.allclose(a.state["rank"], b.state["rank"], atol=1e-12)


def test_pagerank_weighted_bsp_matches_dataset():
    src = np.array([0, 0, 1, 2, 3, 3])
    dst = np.array([1, 2, 2, 3, 0, 1])
    w = np.array([3.0, 1.0, 2.0, 5.0, 1.0, 4.0])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    g = build_graph(ds)
    a = pagerank(g, max_iters=10, weight_col="weight", engine="dataset")
    b = pagerank(g, max_iters=10, weight_col="weight", engine="bsp")
    assert np.allclose(a.state["rank"], b.state["rank"], atol=1e-15)
    with pytest.raises(ValueError, match="dataset.*bsp"):
        pagerank(g, weight_col="weight", engine="bsp_sharded")


# ---------------------------------------------------------------- Louvain


@pytest.mark.parametrize("name", list(FIXTURES))
def test_louvain_matches_oracle(name):
    from np_oracles import louvain_np

    from llama_ray.algos.louvain import louvain_communities

    src, dst = map(np.array, FIXTURES[name])
    canonical = dedup_edges(undirected_ordered(edges_ds(src, dst), drop_self_loops=True))
    g = build_graph(canonical)
    cs = canonical.to_pandas()
    ids = np.unique(np.concatenate([cs["src"], cs["dst"]]))
    s = np.searchsorted(ids, cs["src"].to_numpy())
    d = np.searchsorted(ids, cs["dst"].to_numpy())
    expect = ids[louvain_np(s, d, len(ids), rounds=6, ids=ids)]
    a = louvain_communities(g, rounds=6, engine="dataset")
    b = louvain_communities(g, rounds=6, engine="bsp")
    # integer scores: bit-identical across engines and the oracle
    assert np.array_equal(a.state["label"], expect)
    assert np.array_equal(b.state["label"], expect)


def test_louvain_two_cliques_with_bridge():
    """Two K5s joined by one bridge edge must resolve to exactly two
    communities (one per clique) — the canonical Louvain sanity case
    LP famously fails when labels flood across the bridge."""
    from llama_ray.algos.louvain import louvain_communities

    e = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j))
    e.append((0, 5))
    src = np.array([a for a, _ in e])
    dst = np.array([b for _, b in e])
    g = build_graph(dedup_edges(undirected_ordered(edges_ds(src, dst), drop_self_loops=True)))
    res = louvain_communities(g, rounds=6)
    lab = res.state["label"]
    pos = np.searchsorted(g.ids, np.arange(10))
    left = set(lab[pos[:5]].tolist())
    right = set(lab[pos[5:]].tolist())
    assert len(left) == 1 and len(right) == 1 and left != right


def test_louvain_improves_modularity_over_singletons():
    from llama_ray.algos.louvain import louvain_communities
    from llama_ray.algos.stats import modularity
    from llama_ray.sources.generators import rmat

    g = build_graph(
        dedup_edges(undirected_ordered(rmat(9, 12, seed=7), drop_self_loops=True))
    )
    res = louvain_communities(g, rounds=6)
    q = modularity(g, res.state["dense_label"])["modularity"][0].as_py()
    assert q > 0.05  # singleton partition scores ~0


# -------------------------------------------------------------- DAG layers


def test_dag_layers_matches_topo_dp():
    """Longest-path levels over the canonical a<b orientation vs a
    sequential topological DP (ids ascending IS a topo order)."""
    from llama_ray.algos.dag import dag_layers
    from llama_ray.graph import canonical_undirected

    edges = rmat(8, 6, seed=13).materialize()
    g = canonical_undirected(build_graph(edges))
    res = dag_layers(g)
    t = g.edges.to_pandas()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    expect = np.zeros(g.num_vertices, np.int64)
    order = np.lexsort((src, dst))  # process edges by dst ascending
    for s, d in zip(src[order], dst[order]):
        expect[d] = max(expect[d], expect[s] + 1)
    assert np.array_equal(res.state["layer"], expect)
    assert res.state["layer"].max() > 1  # non-trivial depth


def test_dag_layers_raises_on_cycle():
    from llama_ray.algos.dag import dag_layers

    # a directed 3-cycle straight into the layering (no canonical
    # orientation): must raise, not return wrong levels
    g = build_graph(edges_ds([0, 1, 2], [1, 2, 0]))
    with pytest.raises(RuntimeError, match="cycle"):
        dag_layers(g)


def test_dag_layers_chain_and_star():
    from llama_ray.algos.dag import dag_layers
    from llama_ray.graph import canonical_undirected

    src, dst = map(np.array, FIXTURES["chain5"])
    g = canonical_undirected(build_graph(edges_ds(src, dst)))
    assert np.array_equal(dag_layers(g).state["layer"], [0, 1, 2, 3, 4])
    src, dst = map(np.array, FIXTURES["star_hub"])
    g2 = canonical_undirected(build_graph(edges_ds(src, dst)))
    lay = dag_layers(g2).state["layer"]
    pos0 = int(np.searchsorted(g2.ids, 0))
    assert lay[pos0] == 0 and set(np.delete(lay, pos0)) == {1}


def test_louvain_weighted_unit_weights_equal_unweighted():
    from llama_ray.algos.louvain import louvain_communities

    src, dst = map(np.array, FIXTURES["k4"])
    canonical = dedup_edges(undirected_ordered(edges_ds(src, dst), drop_self_loops=True))
    g_plain = build_graph(canonical)
    gw = build_graph(
        dedup_edges(
            undirected_ordered(edges_ds(src, dst), drop_self_loops=True),
            weights="count",
        )
    )
    a = louvain_communities(g_plain, rounds=6)
    b = louvain_communities(gw, rounds=6, weight_col="weight")
    c = louvain_communities(gw, rounds=6, engine="dataset", weight_col="weight")
    assert np.array_equal(a.state["label"], b.state["label"])
    assert np.array_equal(b.state["label"], c.state["label"])


def test_louvain_weighted_multiplicity_changes_partition():
    """Two triangles joined by a bridge; the bridge carries weight 10.
    Unweighted Louvain separates the triangles; the heavy bridge pulls
    its endpoints into one community."""
    import ray.data as rd

    from llama_ray.algos.louvain import louvain_communities

    base = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)] * 10
    src = np.array([a for a, _ in base + bridge])
    dst = np.array([b for _, b in base + bridge])
    gw = build_graph(
        dedup_edges(
            undirected_ordered(edges_ds(src, dst), drop_self_loops=True),
            weights="count",
        )
    )
    resw = louvain_communities(gw, rounds=6, weight_col="weight")
    lab = resw.state["label"]
    pos = np.searchsorted(gw.ids, np.arange(6))
    assert lab[pos[2]] == lab[pos[3]]  # heavy bridge merges its endpoints
    res_plain = louvain_communities(build_graph(dedup_edges(
        undirected_ordered(edges_ds(src, dst), drop_self_loops=True))), rounds=6)
    lp = res_plain.state["label"]
    assert lp[pos[2]] != lp[pos[3]]  # unweighted: triangles stay apart


def test_louvain_multilevel_improves_modularity_and_engines_agree():
    from llama_ray.algos.louvain import louvain_communities, louvain_multilevel
    from llama_ray.algos.stats import modularity
    from llama_ray.graph import canonical_undirected

    g = canonical_undirected(build_graph(rmat(10, 10, seed=7)))
    r1 = louvain_communities(g, rounds=6)
    q1 = modularity(g, r1.state["dense_label"])["modularity"][0].as_py()
    r2 = louvain_multilevel(g, rounds1=4, rounds2=4)
    q2 = modularity(g, r2.state["dense_label"])["modularity"][0].as_py()
    assert q2 > q1  # coarsening finds structure local moving cannot
    r2d = louvain_multilevel(g, rounds1=4, rounds2=4, engine="dataset")
    assert np.array_equal(r2d.state["label"], r2.state["label"])


def test_louvain_multilevel_two_cliques_stay_separate():
    from llama_ray.algos.louvain import louvain_multilevel

    e = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                e.append((base + i, base + j))
    e.append((0, 5))
    src = np.array([a for a, _ in e])
    dst = np.array([b for _, b in e])
    g = build_graph(dedup_edges(undirected_ordered(edges_ds(src, dst), drop_self_loops=True)))
    lab = louvain_multilevel(g, rounds1=4, rounds2=4).state["label"]
    pos = np.searchsorted(g.ids, np.arange(10))
    assert len(set(lab[pos[:5]])) == 1 and len(set(lab[pos[5:]])) == 1
    assert lab[pos[0]] != lab[pos[9]]  # coarsening must not merge across the bridge


# ------------------------------------------------------------------ MSF


def _kruskal_np(a, b, w):
    """Sequential Kruskal with union-find under the (w, a, b) total
    order — the classical-oracle twin of the distributed Borůvka."""
    order = np.lexsort((b, a, w))
    ids = np.unique(np.concatenate([a, b]))
    parent = dict(zip(ids.tolist(), ids.tolist()))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[ra] = rb
            out.append((int(a[i]), int(b[i]), float(w[i])))
    return sorted(out)


def _msf_pairs(sf_src, sf_dst, sf_w):
    """Build the canonical weighted pair graph and run Borůvka."""
    from llama_ray.algos.msf import minimum_spanning_forest

    tbl = pa.table(
        {
            "src": pa.array(sf_src, pa.int64()),
            "dst": pa.array(sf_dst, pa.int64()),
            "weight": pa.array(np.asarray(sf_w, np.float64), pa.float64()),
        }
    )
    g = build_graph(dedup_edges(rd.from_arrow(tbl), weights="sum"))
    res = minimum_spanning_forest(g)
    return sorted(
        zip(
            res.column("src").to_pylist(),
            res.column("dst").to_pylist(),
            res.column("weight").to_pylist(),
        )
    )


def test_msf_fixture():
    # two components + duplicate weights exercising the (w, a, b) tie-break
    a = np.array([0, 0, 1, 2, 5, 5, 6])
    b = np.array([1, 2, 2, 3, 6, 7, 7])
    w = np.array([1.0, 1.0, 1.0, 2.0, 3.0, 3.0, 3.0])
    got = _msf_pairs(a, b, w)
    want = _kruskal_np(a, b, w)
    assert got == want
    assert len(got) == 5  # V=8, two components -> 8 - 2 edges


def test_msf_random_matches_kruskal():
    rng = np.random.default_rng(20260819)
    for trial in range(4):
        n = 120
        m = 300
        aa = rng.integers(0, n, m)
        bb = rng.integers(0, n, m)
        keep = aa != bb
        a = np.minimum(aa[keep], bb[keep])
        b = np.maximum(aa[keep], bb[keep])
        # integer-valued weights with many duplicates (tie-break stress)
        w = rng.integers(1, 8, len(a)).astype(np.float64)
        # collapse duplicate pairs by summing weights (the query semantics)
        key = a * n + b
        order = np.argsort(key, kind="stable")
        a, b, w, key = a[order], b[order], w[order], key[order]
        first = np.ones(len(a), bool)
        first[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(first)
        ws = np.add.reduceat(w, starts)
        got = _msf_pairs(a, b, w)  # dedup_edges(sum) folds duplicates
        want = _kruskal_np(a[first], b[first], ws)
        assert got == want, f"trial {trial}"


def test_msf_empty_and_selfloop_only():
    from llama_ray.algos.msf import minimum_spanning_forest

    tbl = pa.table(
        {
            "src": pa.array([4, 4], pa.int64()),
            "dst": pa.array([4, 4], pa.int64()),
            "weight": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    # self-loops survive as vertices but contribute no forest edges:
    # the query drops them before dedup; here feed a loop-free empty set
    g = build_graph(dedup_edges(rd.from_arrow(tbl.slice(0, 0)), weights="sum"))
    res = minimum_spanning_forest(g)
    assert res.num_rows == 0
    assert res.schema.names == ["src", "dst", "weight"]


# ------------------------------------------------------------- bipartite


def _bipartite_np(a, b):
    """Python BFS 2-coloring oracle: per component (root = min id),
    (component, n_vertices, n_conflicts, is_bipartite)."""
    import collections

    pairs = sorted({(min(x, y), max(x, y)) for x, y in zip(a.tolist(), b.tolist())})
    a = np.array([x for x, _ in pairs])
    b = np.array([y for _, y in pairs])
    ids = np.unique(np.concatenate([a, b]))
    adj = collections.defaultdict(list)
    for x, y in zip(a.tolist(), b.tolist()):
        adj[x].append(y)
        adj[y].append(x)
    dist = {}
    comp = {}
    for r in ids.tolist():
        if r in dist:
            continue
        dist[r] = 0
        comp[r] = r
        q = collections.deque([r])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    comp[v] = r
                    q.append(v)
    out = {}
    for v in ids.tolist():
        c = comp[v]
        out.setdefault(c, [0, 0])[0] += 1
    for x, y in zip(a.tolist(), b.tolist()):
        if dist[x] % 2 == dist[y] % 2:
            out[comp[x]][1] += 1
    return sorted(
        (c, nv, nc, int(nc == 0)) for c, (nv, nc) in out.items()
    )


def _bipartite_ray(a, b):
    from llama_ray.algos.bipartite import bipartite_check

    g = build_graph(
        dedup_edges(undirected_ordered(edges_ds(a, b), drop_self_loops=True))
    )
    res = bipartite_check(g)
    return sorted(
        zip(
            res.column("component").to_pylist(),
            res.column("n_vertices").to_pylist(),
            res.column("n_conflicts").to_pylist(),
            res.column("is_bipartite").to_pylist(),
        )
    )


def test_bipartite_fixtures():
    # even cycle (bipartite) + odd cycle (not) + star (bipartite)
    a = np.array([0, 1, 2, 3, 10, 11, 12, 20, 20, 20])
    b = np.array([1, 2, 3, 0, 11, 12, 10, 21, 22, 23])
    got = _bipartite_ray(a, b)
    want = _bipartite_np(a, b)
    assert got == want
    flags = {c: f for c, _, _, f in got}
    assert flags[0] == 1 and flags[10] == 0 and flags[20] == 1


def test_bipartite_random_matches_bfs():
    rng = np.random.default_rng(48104)
    for trial in range(3):
        n = 150
        aa = rng.integers(0, n, 220)
        bb = rng.integers(0, n, 220)
        keep = aa != bb
        a, b = np.minimum(aa[keep], bb[keep]), np.maximum(aa[keep], bb[keep])
        assert _bipartite_ray(a, b) == _bipartite_np(a, b), f"trial {trial}"


# ------------------------------------------------------------- rich club


def test_rich_club_matches_bruteforce():
    from llama_ray.algos.stats import rich_club

    rng = np.random.default_rng(777)
    aa = rng.integers(0, 60, 200)
    bb = rng.integers(0, 60, 200)
    keep = aa != bb
    a, b = np.minimum(aa[keep], bb[keep]), np.maximum(aa[keep], bb[keep])
    pairs = sorted({(x, y) for x, y in zip(a.tolist(), b.tolist())})
    a = np.array([x for x, _ in pairs])
    b = np.array([y for _, y in pairs])
    g = build_graph(
        dedup_edges(undirected_ordered(edges_ds(a, b), drop_self_loops=True))
    )
    res = rich_club(g)

    ids = np.unique(np.concatenate([a, b]))
    deg = {int(v): 0 for v in ids}
    for x, y in pairs:
        deg[x] += 1
        deg[y] += 1
    want = []
    for k in sorted(set(deg.values())):
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        ek = sum(1 for x, y in pairs if x in club and y in club)
        want.append(
            (k, len(club), ek, round(2 * ek / (len(club) * (len(club) - 1.0)), 6))
        )
    got = sorted(
        zip(
            res.column("k").to_pylist(),
            res.column("n_vertices").to_pylist(),
            res.column("n_edges").to_pylist(),
            res.column("phi").to_pylist(),
        )
    )
    assert got == sorted(want)


# ------------------------------------------------------------- squares


def _squares_np(a, b, n):
    A = np.zeros((n, n), np.int64)
    A[a, b] = 1
    A[b, a] = 1
    cn = A @ A
    iu = np.triu_indices(n, 1)
    c = cn[iu]
    s = int((c * (c - 1) // 2).sum())
    return s // 2, int((c >= 2).sum())


def test_squares_fixture():
    from llama_ray.algos.squares import square_count

    # one 4-cycle + one chord (the chord adds two triangles, no new square)
    a = np.array([0, 1, 2, 0, 0])
    b = np.array([1, 2, 3, 3, 2])
    g = build_graph(dedup_edges(undirected_ordered(edges_ds(a, b), drop_self_loops=True)))
    res = square_count(g)
    sq, cp = _squares_np(a, b, 4)
    assert res.column("squares")[0].as_py() == sq == 1
    assert res.column("closed_pairs")[0].as_py() == cp


def test_squares_random_matches_dense():
    from llama_ray.algos.squares import square_count

    rng = np.random.default_rng(424242)
    for trial in range(3):
        nv = 40
        aa = rng.integers(0, nv, 160)
        bb = rng.integers(0, nv, 160)
        keep = aa != bb
        a, b = np.minimum(aa[keep], bb[keep]), np.maximum(aa[keep], bb[keep])
        g = build_graph(
            dedup_edges(undirected_ordered(edges_ds(a, b), drop_self_loops=True))
        )
        res = square_count(g)
        pairs = sorted({(x, y) for x, y in zip(a.tolist(), b.tolist())})
        pa_ = np.array([x for x, _ in pairs])
        pb_ = np.array([y for _, y in pairs])
        # dense ids 0..nv-1 may miss isolated ids; matrix over full range is fine
        sq, cp = _squares_np(pa_, pb_, nv)
        assert res.column("squares")[0].as_py() == sq, f"trial {trial}"
        assert res.column("closed_pairs")[0].as_py() == cp, f"trial {trial}"


def test_eccentricity_sampled_matches_bfs():
    from llama_ray.algos.traversal import eccentricity_sampled

    rng = np.random.default_rng(31337)
    src = rng.integers(0, 40, 160)
    dst = rng.integers(0, 40, 160)
    g = build_graph(edges_ds(src, dst))
    res = eccentricity_sampled(g, num_sources=5)
    di, dj, ids = dense(src, dst)
    for row in range(res.num_rows):
        s = res.column("source")[row].as_py()
        d = bfs_np(di, dj, len(ids), int(np.searchsorted(ids, s)))
        fin = np.isfinite(d)
        assert res.column("reached")[row].as_py() == int(fin.sum())
        assert res.column("eccentricity")[row].as_py() == int(d[fin].max())


def triad_census_np(src, dst):
    """Brute-force census over all C(V,3) triples."""
    from itertools import combinations

    from llama_ray.algos.triads import _BY_SIG, _canon

    es = {(s, d) for s, d in zip(src, dst) if s != d}
    ids = sorted({v for e in es for v in e})
    from collections import Counter

    out = Counter()
    for a, b, c in combinations(ids, 3):
        sub = {(x, y) for x, y in es if {x, y} <= {a, b, c}}
        und = {frozenset(e) for e in sub}
        if len(und) < 2:
            continue  # disconnected triple
        idx = {a: 0, b: 1, c: 2}
        sig = _canon({(idx[x], idx[y]) for x, y in sub})
        out[_BY_SIG[sig]] += 1
    return dict(out)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_triad_census_fixtures(name):
    from llama_ray.algos.triads import triad_census

    src, dst = map(np.array, FIXTURES[name])
    g = build_graph(edges_ds(src, dst))
    out = triad_census(g)
    got = dict(zip(out.column("triad_type").to_pylist(), out.column("cnt").to_pylist()))
    assert got == triad_census_np(src, dst)


def test_triad_census_rmat_with_mutuals_and_layouts():
    """R-MAT (asym-heavy) + planted mutual pairs and a mutual triangle
    so 201/300/210/120* classes appear; equals brute force at any
    block layout and the closed classes sum to the triangle count."""
    tbl = rmat(7, 4, seed=29).materialize().to_pandas()
    src = tbl["src"].to_numpy().tolist()
    dst = tbl["dst"].to_numpy().tolist()
    for a, b in [(500, 501), (501, 502), (502, 500), (500, 502)]:
        src += [a, b]
        dst += [b, a]
    src += [1, 2, 3]
    dst += [2, 3, 1]
    expect = triad_census_np(src, dst)
    from llama_ray.algos.triads import triad_census

    for blocks in (1, 9):
        g = build_graph(edges_ds(src, dst).repartition(blocks))
        out = triad_census(g)
        got = dict(zip(out.column("triad_type").to_pylist(), out.column("cnt").to_pylist()))
        assert got == expect
    assert {"300", "201", "030C"} <= set(expect)
    closed = {"030T", "030C", "120D", "120U", "120C", "210", "300", "201"}
    # closed classes are exactly the undirected triangles
    tri = triangle_count(build_graph(edges_ds(src, dst)))
    closed_classes = {"030T", "030C", "120D", "120U", "120C", "210", "300"}
    assert sum(v for k, v in expect.items() if k in closed_classes) == tri


def test_triangle_count_delta_matches_recount():
    """Incremental TC: for random base/delta splits of an R-MAT graph
    (plus a planted triangle fully inside the delta — the ordering
    rule must count it once), TC(base) + delta == TC(full)."""
    from llama_ray.algos.triangles import triangle_count_delta
    from llama_ray.graph import canonical_undirected

    tbl = rmat(7, 6, seed=23).materialize().to_pandas()
    src = tbl["src"].to_numpy().tolist() + [900, 901, 902]
    dst = tbl["dst"].to_numpy().tolist() + [901, 902, 900]
    g1 = canonical_undirected(build_graph(edges_ds(src, dst)))
    rng = np.random.default_rng(5)
    full = g1.edges.to_pandas()
    lo = full["src"].to_numpy()
    hi = full["dst"].to_numpy()
    tc_full = triangle_count(g1)
    for frac in (0.1, 0.5, 1.0):
        mask = rng.random(len(lo)) < frac
        # delta in g1's dense space; base graph from the complement
        base_ids = g1.ids  # same vertex universe for the recount
        gb = build_graph(
            edges_ds(g1.ids[lo[~mask]].tolist(), g1.ids[hi[~mask]].tolist())
        )
        delta = triangle_count_delta(g1, lo[mask].astype(np.int64), hi[mask].astype(np.int64))
        assert triangle_count(gb) + delta == tc_full, frac
    # empty delta
    assert triangle_count_delta(g1, np.empty(0, np.int64), np.empty(0, np.int64)) == 0


def test_bfs_path_counts_matches_reference():
    """σ from the distributed forward pass equals a per-level python
    reference (deduped edges; diamond multiplicities compound)."""
    from collections import defaultdict

    from llama_ray.algos.traversal import bfs_path_counts

    rng = np.random.default_rng(23)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    # planted double-diamond: 50→{51,52}→53→{54,55}→56 gives σ(56)=4
    src = np.concatenate([src, [50, 50, 51, 52, 53, 53, 54, 55]])
    dst = np.concatenate([dst, [51, 52, 53, 53, 54, 55, 56, 56]])
    g = build_graph(dedup_edges(edges_ds(src, dst)))
    ids = np.asarray(g.ids)
    root = int(ids[0])
    dist, sigma = bfs_path_counts(g, root)

    adj = defaultdict(set)
    for a, b in zip(src, dst):
        adj[int(a)].add(int(b))
    rd_, rs = {root: 0}, {root: 1}
    frontier = [root]
    lvl = 0
    while frontier:
        lvl += 1
        nxt = defaultdict(int)
        for u in frontier:
            for w in adj[u]:
                if w not in rd_:
                    nxt[w] += rs[u]
        for w, c in nxt.items():
            rd_[w], rs[w] = lvl, c
        frontier = list(nxt)
    exp_d = np.array([rd_.get(int(i), -1) for i in ids])
    exp_s = np.array([rs.get(int(i), 0) for i in ids])
    assert np.array_equal(dist, exp_d)
    assert np.array_equal(sigma, exp_s)


def test_onion_layers_matches_peeling_reference():
    """Onion layers vs a python wave-peel; core must equal the
    H-index core_numbers fixpoint on every fixture."""
    from llama_ray.algos.kcore import core_numbers, onion_layers
    from llama_ray.graph import canonical_undirected

    def ref_onion(src, dst, ids):
        import collections

        nbr = collections.defaultdict(set)
        for a, b in zip(src, dst):
            if a != b:
                nbr[a].add(b)
                nbr[b].add(a)
        alive = set(int(i) for i in ids)
        layer, core = {}, {}
        k, rnd = 0, 0
        while alive:
            rnd += 1
            deg = {v: len(nbr[v] & alive) for v in alive}
            k = max(k, min(deg.values()))
            peel = {v for v in alive if deg[v] <= k}
            for v in peel:
                layer[v], core[v] = rnd, k
            alive -= peel
        return layer, core

    rng = np.random.default_rng(31)
    cases = list(FIXTURES.values()) + [
        (rng.integers(0, 50, 300).tolist(), rng.integers(0, 50, 300).tolist())
    ]
    for src, dst in cases:
        src, dst = np.array(src), np.array(dst)
        g = canonical_undirected(build_graph(dedup_edges(edges_ds(src, dst))))
        layer, core = onion_layers(g)
        ref_l, ref_c = ref_onion(src, dst, np.asarray(g.ids))
        ids = np.asarray(g.ids)
        assert np.array_equal(layer, np.array([ref_l[int(i)] for i in ids]))
        assert np.array_equal(core, np.array([ref_c[int(i)] for i in ids]))
        assert np.array_equal(core, core_numbers(g).state["core"])
        # push (incremental fan-out) ≡ gather (per-wave recompute)
        gl, gc = onion_layers(g, mode="gather")
        assert np.array_equal(layer, gl) and np.array_equal(core, gc)


def test_lp_warm_start_all_engines():
    """init_labels warm start: all three engines agree; invalid labels
    (not vertex ids of the graph) are rejected loudly."""
    rng = np.random.default_rng(19)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    from llama_ray.graph import canonical_undirected

    g = canonical_undirected(build_graph(dedup_edges(edges_ds(src, dst))))
    base = label_propagation(g, iterations=2, engine="dataset")
    init = base.state["label"]
    outs = [
        label_propagation(g, iterations=2, engine=e, init_labels=init).state["label"]
        for e in ("dataset", "bsp", "bsp_sharded")
    ]
    assert np.array_equal(outs[0], outs[1]) and np.array_equal(outs[1], outs[2])
    # 2+2 warm rounds == 4 straight rounds (fixed-round pipeline)
    straight = label_propagation(g, iterations=4, engine="dataset").state["label"]
    assert np.array_equal(outs[0], straight)
    bad = init.copy()
    bad[0] = 10**12  # not a vertex id
    with pytest.raises(ValueError):
        label_propagation(g, iterations=1, engine="dataset", init_labels=bad)


def test_label_propagation_init_labels_wrong_length_raises():
    """ADVICE r4: a wrong-sized init_labels array must fail at the API
    boundary, not deep inside the BSP engine."""
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    g = build_graph(edges_ds(src, dst))
    with pytest.raises(ValueError, match="entries"):
        label_propagation(g, iterations=2, init_labels=np.array([0, 1], np.int64))


def test_wl_colors_refinement_properties():
    """r5 1-WL: colors refine (classes only split, never merge),
    distinguish the triangle-vs-path classic, stay layout-independent,
    and isomorphic placements share colors."""
    from llama_ray.algos.stats import wl_colors

    # two components: a directed 3-cycle and a directed 3-path —
    # after 2+ rounds cycle vertices (all alike) differ from path ones
    src = np.array([0, 1, 2, 10, 11], np.int64)
    dst = np.array([1, 2, 0, 11, 12], np.int64)
    outs = []
    for nb in (1, 3):
        g = build_graph(edges_ds(src, dst).repartition(nb))
        t = wl_colors(g, rounds=3).to_pandas().sort_values("vertex").reset_index(drop=True)
        outs.append(t)
    assert outs[0].equals(outs[1])
    col = dict(zip(outs[0]["vertex"], outs[0]["color"]))
    # cycle vertices are mutually indistinguishable under 1-WL
    assert col[0] == col[1] == col[2]
    # path endpoints/middle/tail all differ from the cycle class
    assert col[10] != col[0] and col[12] != col[0]
    # refinement is monotone: classes never merge round over round
    g = build_graph(edges_ds(src, dst))
    prev = None
    for r in (1, 2, 3):
        t = wl_colors(g, rounds=r).to_pandas().sort_values("vertex")
        part = {}
        for v, c in zip(t["vertex"], t["color"]):
            part.setdefault(c, set()).add(v)
        classes = sorted(map(frozenset, part.values()), key=min)
        if prev is not None:
            for cl in classes:
                assert any(cl <= p for p in prev), (r, cl)
        prev = classes
