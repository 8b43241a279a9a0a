"""Property-based checks (hypothesis) for the canonicalization and
dedup kernels — random edge multisets with duplicates, self-loops and
arbitrary (including negative, hash-like) int64 ids."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from llama_ray.graph import build_graph, undirect
from llama_ray.ingest.canonicalize import dedup_edges, max_node_id, undirected_ordered

ids = st.integers(min_value=-(2**40), max_value=2**40)
edge_lists = st.lists(st.tuples(ids, ids), min_size=1, max_size=60)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def ds_of(pairs, weights=None):
    cols = {
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }
    if weights is not None:
        cols["weight"] = pa.array(weights, pa.float64())
    return rd.from_arrow(pa.table(cols)).repartition(3)


@SLOW
@given(edge_lists)
def test_dedup_matches_pandas(pairs):
    got = dedup_edges(ds_of(pairs)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    expect = (
        pd.DataFrame(pairs, columns=["src", "dst"])
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert got.equals(expect)


@SLOW
@given(edge_lists)
def test_dedup_count_weights(pairs):
    got = dedup_edges(ds_of(pairs), weights="count").to_pandas()
    expect = pd.DataFrame(pairs, columns=["src", "dst"]).groupby(["src", "dst"]).size()
    for row in got.itertuples():
        assert row.weight == expect[(row.src, row.dst)]
    assert got["weight"].sum() == len(pairs)


@SLOW
@given(edge_lists)
def test_undirected_ordered_canonical(pairs):
    got = undirected_ordered(ds_of(pairs)).to_pandas()
    assert (got["src"] <= got["dst"]).all()
    assert len(got) == len(pairs)


@SLOW
@given(edge_lists)
def test_undirect_doubles_nonloops(pairs):
    got = undirect(ds_of(pairs)).to_pandas()
    loops = sum(1 for a, b in pairs if a == b)
    assert len(got) == 2 * len(pairs) - loops


@SLOW
@given(edge_lists)
def test_build_graph_invariants(pairs):
    g = build_graph(ds_of(pairs))
    assert g.num_edges == len(pairs)
    assert np.array_equal(g.ids, np.unique([x for p in pairs for x in p]))
    assert g.out_degrees.sum() == len(pairs)
    assert int(max_node_id(ds_of(pairs))) == int(g.ids.max())
