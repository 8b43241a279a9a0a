"""Property-graph reader, degree reorder, loader plugin."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from llama_ray.ingest.reorder import reorder_by_degree
from llama_ray.sources.property_graph import read_property_graph
from llama_ray.sources.registry import load_edges, register_loader


def test_property_graph_roundtrip(tmp_path):
    ep = str(tmp_path / "edges.parquet")
    np_ = str(tmp_path / "nodes.parquet")
    pq.write_table(
        pa.table(
            {
                "src": pa.array([1, 1, 2], pa.int64()),
                "dst": pa.array([2, 3, 3], pa.int64()),
                "weight": pa.array([0.5, 1.5, 2.5], pa.float64()),
            }
        ),
        ep,
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()), "age": pa.array([15.0, 30.0, 12.0])}),
        np_,
    )
    pg = read_property_graph(ep, np_)
    assert pg.graph.num_edges == 3
    assert "weight" in pg.edge_props.schema().names
    ages = pg.node_property("age")
    assert ages.tolist() == [15.0, 30.0, 12.0]  # dense order = sorted ids


def test_avg_teen_cnt_semantics(tmp_path):
    """The reference's avg_teen_cnt (avg_teen_cnt.h:55-141): per vertex
    with age > K, count in-neighbors with 10 <= age < 20; average."""
    ep = str(tmp_path / "e.parquet")
    np_ = str(tmp_path / "n.parquet")
    # teens 1,3 point at adult 2
    pq.write_table(
        pa.table({"src": pa.array([1, 3], pa.int64()), "dst": pa.array([2, 2], pa.int64())}), ep
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()), "age": pa.array([15.0, 30.0, 12.0])}), np_
    )
    pg = read_property_graph(ep, np_)
    ages = pg.node_property("age")
    indeg_teen = np.zeros(pg.graph.num_vertices)
    from llama_ray.common import batch_to_numpy

    for b in pg.graph.edges.iter_batches(batch_format="pyarrow"):
        s, d = batch_to_numpy(b, "src"), batch_to_numpy(b, "dst")
        teen = (ages[s] >= 10) & (ages[s] < 20)
        np.add.at(indeg_teen, d[teen], 1)
    sel = ages > 20
    assert indeg_teen[sel].mean() == 2.0


def test_reorder_by_degree():
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([5, 5, 5, 7, 9], pa.int64()),
                "dst": pa.array([7, 9, 11, 5, 5], pa.int64()),
            }
        )
    )
    out = reorder_by_degree(edges).to_pandas()
    # vertex 5 has degree 5 → new id 0; ids compact 0..3
    assert set(out["src"]) | set(out["dst"]) <= {0, 1, 2, 3}
    assert (out["src"] == 0).sum() == 3  # old 5 → 0 as src of 3 edges


def test_register_loader(tmp_path):
    calls = []

    def accepts(p):
        return p.endswith(".custom")

    def load(p):
        calls.append(p)
        return rd.from_arrow(pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())}))

    register_loader(accepts, load)
    assert load_edges("x.custom").count() == 1
    assert calls == ["x.custom"]