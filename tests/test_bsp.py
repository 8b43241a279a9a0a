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
