"""Source readers / generators (SURVEY §2.1)."""

import numpy as np
import pyarrow as pa
import pytest

from llama_ray.sources.generators import erdos_renyi, rmat
from llama_ray.sources.registry import load_edges
from llama_ray.sources.text import read_net
from llama_ray.sources.xs1 import read_xs1, write_xs1


def test_net_loader(tmp_path):
    p = tmp_path / "g.net"
    p.write_text("# comment\n1 2\n2 3\n\nbad line here\n3 1\n")
    df = read_net(str(p)).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert df.values.tolist() == [[1, 2], [2, 3], [3, 1]]


def test_xs1_roundtrip(tmp_path):
    t = pa.table(
        {
            "src": pa.array([1, 2, 3], pa.int64()),
            "dst": pa.array([4, 5, 6], pa.int64()),
            "weight": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    p = tmp_path / "g.xs1"
    write_xs1(t, str(p))
    df = read_xs1(str(p)).to_pandas().sort_values("src").reset_index(drop=True)
    assert df["src"].tolist() == [1, 2, 3]
    assert df["dst"].tolist() == [4, 5, 6]
    assert df["weight"].tolist() == [1.5, 2.5, 3.5]


def test_erdos_renyi_bounds_and_determinism():
    a = erdos_renyi(100, 500, seed=5).to_pandas()
    b = erdos_renyi(100, 500, seed=5, override_num_blocks=7).to_pandas()
    assert len(a) == 500
    assert a["src"].between(0, 99).all() and a["dst"].between(0, 99).all()
    sa = a.sort_values(["src", "dst"]).reset_index(drop=True)
    sb = b.sort_values(["src", "dst"]).reset_index(drop=True)
    # chunk seeding: output is a pure function of (seed, id) — identical
    # across block layouts, not just identical layouts
    assert sa.equals(sb)
    c = erdos_renyi(100, 500, seed=5).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert sa.equals(c)


def test_rmat_layout_independent():
    a = rmat(7, 4, seed=9).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = (
        rmat(7, 4, seed=9, override_num_blocks=5)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_rmat_power_law():
    df = rmat(8, 8, seed=42).to_pandas()
    assert len(df) == 8 * 256
    assert df["src"].between(0, 255).all()
    deg = df.groupby("src").size()
    # power-law-ish: max degree far above mean
    assert deg.max() > 4 * deg.mean()


def test_registry_dispatch(tmp_path):
    assert load_edges("rmat(6, 4)").count() == 4 * 64
    assert load_edges("er(50, 200)").count() == 200
    p = tmp_path / "x.net"
    p.write_text("0 1\n")
    assert load_edges(str(p)).count() == 1
    with pytest.raises(ValueError):
        load_edges("nope.xyz")


def test_fgf_roundtrip(tmp_path):
    """FGF v1 binary container: write → read round-trip with node and
    edge properties across both block-framing forms."""
    from llama_ray.sources.fgf import read_fgf, write_fgf
    from llama_ray.sources.registry import load_edges

    p = str(tmp_path / "tiny.fgf")
    edges = [
        (0, 1, {"weight": 5, "label": "a"}),
        (1, 2, {"weight": 7}),
        (2, 0, {}),
    ] + [(i % 4, (i + 1) % 4, {"weight": i}) for i in range(40)]  # >254 bytes → 0x7A framing
    vprops = [{"name": f"v{i}"} for i in range(4)]
    write_fgf(
        p,
        num_vertices=4,
        edges=edges,
        vertex_props=vprops,
        prop_types=[("weight", "int32"), ("label", "string"), ("name", "string")],
    )
    out = read_fgf(p)
    ed = out["edges"].to_pandas()
    assert len(ed) == len(edges)
    assert ed.iloc[0][["src", "dst"]].tolist() == [0, 1]
    assert ed.iloc[0]["weight"] == 5 and ed.iloc[0]["label"] == "a"
    assert ed.iloc[1]["weight"] == 7 and ed.iloc[1]["label"] is None
    nd = out["nodes"].to_pandas()
    assert nd["name"].tolist() == ["v0", "v1", "v2", "v3"]
    assert out["meta"]["edge_types"] == [("edge", len(edges))]
    # registry dispatch by extension
    assert load_edges(p).count() == len(edges)


def test_fgf_all_seven_property_types(tmp_path):
    """Round-trip every FGF type code (ll_common.h:182-188): string,
    boolean, int16, int32, int64, float, double."""
    import numpy as np

    from llama_ray.sources.fgf import read_fgf, write_fgf

    path = str(tmp_path / "types.fgf")
    props = [
        ("name", "string"), ("flag", "boolean"), ("small", "int16"),
        ("mid", "int32"), ("big", "int64"), ("ratio", "float"), ("score", "double"),
    ]
    vp = [
        {"name": "a", "flag": True, "small": -123, "mid": 1 << 20,
         "big": -(1 << 40), "ratio": 1.5, "score": 2.25e-3},
        {"name": "b", "flag": False, "small": 32767, "mid": -(1 << 31),
         "big": (1 << 62), "ratio": -0.25, "score": -1e100},
        {},  # no props — nulls in every property column
    ]
    edges = [(0, 1, {"score": 0.125, "flag": True}), (1, 2, {"big": 7})]
    write_fgf(path, num_vertices=3, edges=edges, vertex_props=vp, prop_types=props)
    out = read_fgf(path)
    nd = out["nodes"].to_pandas().sort_values("node").reset_index(drop=True)
    assert nd["name"].tolist()[:2] == ["a", "b"] and nd["name"].isna().tolist() == [False, False, True]
    assert nd["flag"].tolist()[:2] == [True, False]
    assert nd["small"].tolist()[:2] == [-123, 32767]
    assert nd["mid"].tolist()[:2] == [1 << 20, -(1 << 31)]
    assert nd["big"].tolist()[:2] == [-(1 << 40), 1 << 62]
    assert np.isclose(nd["ratio"][0], 1.5) and np.isclose(nd["ratio"][1], -0.25)
    assert nd["score"][1] == -1e100  # double keeps full range
    ed = out["edges"].to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert ed[["src", "dst"]].values.tolist() == [[0, 1], [1, 2]]
    assert ed["score"][0] == 0.125 and ed["flag"][0] == True  # noqa: E712
    assert ed["big"][1] == 7
    # arrow schema carries the exact types
    sch = out["nodes"].schema()
    import pyarrow as pa
    types = dict(zip(sch.names, sch.types))
    assert types["flag"] == pa.bool_() and types["small"] == pa.int16()
    assert types["big"] == pa.int64() and types["ratio"] == pa.float32()
    assert types["score"] == pa.float64()


def test_watts_strogatz_structure_and_determinism(ray_session):
    import numpy as np

    from llama_ray.sources.generators import watts_strogatz

    n, k = 200, 6
    # beta=0: the pure ring lattice — every vertex has out-degree k/2,
    # all edges at ring distance <= k/2
    ds = watts_strogatz(n, k, beta=0.0, seed=7)
    t = ds.to_pandas()
    assert len(t) == n * k // 2
    d = (t["dst"] - t["src"]) % n
    assert d.between(1, k // 2).all()
    # beta=0.3: deterministic across layouts, ~30% rewired
    a = watts_strogatz(n, k, beta=0.3, seed=7, override_num_blocks=1).to_pandas()
    b = watts_strogatz(n, k, beta=0.3, seed=7, override_num_blocks=13).to_pandas()
    a = a.sort_values(["src", "dst"]).reset_index(drop=True)
    b = b.sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    dd = (a["dst"] - a["src"]) % n
    frac_far = float((dd > k // 2).mean())
    assert 0.15 < frac_far < 0.45  # rewired fraction ≈ beta (minus lucky hits)
    # out-degree preserved exactly (rewiring only moves dst)
    assert (a.groupby("src").size() == k // 2).all()
