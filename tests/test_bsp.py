"""BSP gather engine ≡ dataset engine (both must produce identical
per-vertex results; BSP is the partition-pinned-actor scaling path)."""

import numpy as np
import pytest

from llama_ray.algos.pagerank import pagerank
from llama_ray.algos.traversal import sssp
from llama_ray.engine.bsp import BSPGather
from llama_ray.graph import build_graph
from llama_ray.sources.generators import rmat


@pytest.fixture(scope="module")
def g():
    return build_graph(rmat(9, 8, seed=13))


def test_pagerank_engines_agree(g):
    a = pagerank(g, max_iters=10, engine="dataset")
    b = pagerank(g, max_iters=10, engine="bsp")
    assert np.allclose(a.state["rank"], b.state["rank"], atol=1e-14)


def test_sssp_engines_agree(g):
    root = int(g.ids[3])
    a = sssp(g, root, engine="dataset")
    b = sssp(g, root, engine="bsp")
    assert np.array_equal(a.state["dist"], b.state["dist"])


def test_wcc_engines_agree(g):
    from llama_ray.algos.components import weakly_connected_components

    a = weakly_connected_components(g, engine="dataset")
    b = weakly_connected_components(g, engine="bsp")
    assert np.array_equal(a.state["label"], b.state["label"])


def test_gather_sum_matches_numpy(g):
    gat = BSPGather(g, num_partitions=3)
    rng = np.random.default_rng(0)
    v = rng.random(g.num_vertices)
    got = gat.gather_sum(v)
    df = g.edges.to_pandas()
    expect = np.zeros(g.num_vertices)
    np.add.at(expect, df["dst"].to_numpy(), v[df["src"].to_numpy()])
    assert np.allclose(got, expect, atol=1e-12)
    gat.shutdown()


def test_sort_build_mode_matches(g):
    a = BSPGather(g, num_partitions=3, build="scan")
    b = BSPGather(g, num_partitions=3, build="sort")
    v = np.random.default_rng(1).random(g.num_vertices)
    assert np.allclose(a.gather_sum(v), b.gather_sum(v), atol=1e-12)
    a.shutdown()
    b.shutdown()


def test_pagerank_sharded_bit_identical():
    """bsp_sharded (actor-resident state, driver out of the loop) must
    be bit-identical to the driver-held bsp engine and the dataset
    engine at the same float64 arithmetic."""
    import numpy as np
    from llama_ray.algos.pagerank import pagerank
    from llama_ray.graph import build_graph
    from llama_ray.sources.generators import rmat

    g = build_graph(rmat(8, 8, seed=5))
    a = pagerank(g, max_iters=8, engine="bsp")
    b = pagerank(g, max_iters=8, engine="bsp_sharded")
    assert np.array_equal(a.state["rank"], b.state["rank"])  # exact


def test_ppr_sharded_bit_identical():
    import numpy as np
    from llama_ray.algos.ppr import personalized_pagerank
    from llama_ray.graph import build_graph
    from llama_ray.sources.generators import rmat

    g = build_graph(rmat(8, 8, seed=5))
    seeds = g.ids[:4]
    a = personalized_pagerank(g, seeds, max_iters=6, engine="bsp")
    b = personalized_pagerank(g, seeds, max_iters=6, engine="bsp_sharded")
    assert np.array_equal(a.state["rank"], b.state["rank"])


def test_salted_shuffle_aggregate_matches_driver():
    """Hub-salted two-stage shuffle aggregate (SURVEY §4 skew split)
    equals the driver merge exactly for sums and mins."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from llama_ray.engine.superstep import aggregate_messages

    rng = np.random.default_rng(0)
    # one hub key (0) with 5k messages + a long tail
    dst = np.concatenate([np.zeros(5000, np.int64), rng.integers(1, 200, 2000)])
    v = rng.integers(1, 10, len(dst)).astype(np.float64)
    msgs = rd.from_arrow(pa.table({"dst": pa.array(dst), "v": pa.array(v)})).repartition(8)

    kd, vd = aggregate_messages(msgs, "sum", mode="driver")
    ks, vs = aggregate_messages(msgs, "sum", mode="shuffle", salt=4)
    o = np.argsort(ks)
    assert np.array_equal(kd, ks[o]) and np.allclose(vd, vs[o])

    kd, vd = aggregate_messages(msgs, "min", mode="driver")
    ks, vs = aggregate_messages(msgs, "min", mode="shuffle", salt=4)
    o = np.argsort(ks)
    assert np.array_equal(kd, ks[o]) and np.array_equal(vd, vs[o])


def test_shared_pool_reused_across_algorithms():
    """Gather pools are cached on the graph (the reference builds its
    in-CSR once and every task iterates on it): repeated calls and
    sibling algorithms must reuse the same partition actors, and
    release_pools must actually free them."""
    from llama_ray.algos.components import label_propagation, weakly_connected_components
    from llama_ray.algos.pagerank import pagerank
    from llama_ray.engine.bsp import release_pools, shared_pool
    from llama_ray.graph import build_graph, canonical_undirected

    import pyarrow as pa
    import ray.data as rd

    src = np.array([0, 1, 2, 3, 4, 0])
    dst = np.array([1, 2, 3, 4, 0, 2])
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    g = canonical_undirected(build_graph(edges))

    r1 = pagerank(g, max_iters=5, engine="bsp")
    pool_after_first = shared_pool(g)
    actors_first = list(pool_after_first.actors)
    r2 = pagerank(g, max_iters=5, engine="bsp")
    assert list(shared_pool(g).actors) == actors_first  # reused, not rebuilt
    assert np.array_equal(r1.state["rank"], r2.state["rank"])

    und = shared_pool(g, view="undirected")
    wcc = weakly_connected_components(g, engine="bsp")
    lp = label_propagation(g, iterations=3, engine="bsp")
    assert list(shared_pool(g, view="undirected").actors) == list(und.actors)
    assert wcc.converged and lp.iterations == 3

    release_pools(g)
    assert not pool_after_first.actors and not und.actors
    # next call transparently rebuilds
    r3 = pagerank(g, max_iters=5, engine="bsp")
    assert np.array_equal(r3.state["rank"], r1.state["rank"])


def test_shared_pool_cache_gate_by_size(monkeypatch):
    """Above the estimated-heap cap, shared_pool returns UNCACHED
    pools whose shutdown() really frees the actors (an idle resident
    pool at 2^25 measurably slowed the next algorithm family)."""
    from llama_ray.engine import bsp as B
    from llama_ray.graph import build_graph

    import pyarrow as pa
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3], pa.int64()),
                "dst": pa.array([1, 2, 3, 0], pa.int64()),
            }
        )
    )
    g = build_graph(edges)
    monkeypatch.setattr(B, "POOL_CACHE_MAX_BYTES", 1)  # everything "too big"
    p1 = B.shared_pool(g)
    p2 = B.shared_pool(g)
    assert p1 is not p2  # not cached
    assert not getattr(p1, "shared", False)
    a1 = list(p1.actors)
    p1.shutdown()
    assert not p1.actors and a1  # shutdown really freed them
    p2.shutdown()
    monkeypatch.setattr(B, "POOL_CACHE_MAX_BYTES", 6 * 1024**3)
    c1 = B.shared_pool(g)
    assert B.shared_pool(g) is c1  # cached again below the cap
    B.release_pools(g)


def test_gather_mode_int32_span_exceeding_dtype():
    """int32 labels spanning ±2^30 make span > 2^31: the packed-key
    offset must be computed in int64 or runs interleave in the sorted
    order and counts fragment (ADVICE r3)."""
    import pyarrow as pa
    import ray

    from llama_ray.engine.bsp import _GatherPartition

    A, B = -(1 << 30), (1 << 30) + 7  # span = 2^31 + 8 > int32 range
    # dst 0 in-neighbors carry labels [B, B, A] -> mode B;
    # dst 1 carries [A, A, B] -> mode A; dst 2 single B.
    src = np.array([1, 2, 3, 1, 2, 3, 4], np.int64)
    dst = np.array([0, 0, 0, 1, 1, 1, 2], np.int64)
    value = np.zeros(5, np.int32)
    value[1], value[2], value[3], value[4] = B, B, A, B
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    gp = _GatherPartition([ray.put(t)], 0, 3, weighted=False, presorted=False)
    got = gp.gather_mode(value)
    # d0: [B,B,A] -> B ; d1: [B,B,A] -> B ; d2: [B] -> B
    assert got.dtype == np.int32 or got.dtype == np.int64
    assert got[0] == B and got[1] == B and got[2] == B
    # now a tie: smallest label wins
    value2 = np.zeros(5, np.int32)
    value2[1], value2[2], value2[3], value2[4] = B, A, 5, A
    got2 = gp.gather_mode(value2)
    # d0/d1: [B, A, 5] all count 1 -> tie -> smallest = A
    assert got2[0] == A and got2[1] == A and got2[2] == A
