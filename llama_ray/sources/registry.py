"""Loader registry — dispatch by file extension / pseudo-file name.

Reference: ``ll_file_loaders::loader_for``
(`/root/reference/llama/include/llama/loaders/ll_loaders.h:53-119`)
picks a loader by extension; generator pseudo-files like
``rmat(scale,deg[,a,b,c[,seed]])`` / ``er(nodes,edges[,seed])`` are
accepted as inputs (``ll_gen_rmat.h:77-83``).
"""

from __future__ import annotations

import re

import ray.data as rd

from .generators import erdos_renyi, rmat
from .text import read_net
from .xs1 import read_xs1

_GEN_RE = re.compile(r"^(rmat|r-mat|er)\(([^)]*)\)$", re.I)

# user-extension surface (reference loader plugin API,
# ``ll_load_utils.h:63-135``): register (predicate, loader) pairs
_CUSTOM_LOADERS: list = []


def register_loader(accepts, load) -> None:
    """Plug in a custom source: ``accepts(path) -> bool`` and
    ``load(path) -> Dataset``. Checked before the built-ins."""
    _CUSTOM_LOADERS.append((accepts, load))


def load_edges(path: str) -> rd.Dataset:
    """Edge Dataset from a path or generator pseudo-file."""
    for accepts, load in _CUSTOM_LOADERS:
        if accepts(path):
            return load(path)
    m = _GEN_RE.match(path.strip())
    if m:
        kind = m.group(1).lower().replace("-", "")
        args = [float(x) for x in m.group(2).split(",") if x.strip()]
        if kind == "rmat":
            scale = int(args[0]) if args else 10
            deg = int(args[1]) if len(args) > 1 else 8
            a = args[2] if len(args) > 2 else 0.57
            b = args[3] if len(args) > 3 else 0.19
            c = args[4] if len(args) > 4 else 0.19
            seed = int(args[5]) if len(args) > 5 else 42
            return rmat(scale, deg, a, b, c, seed=seed)
        nodes = int(args[0]) if args else 1024
        edges = int(args[1]) if len(args) > 1 else nodes * 8
        seed = int(args[2]) if len(args) > 2 else 42
        return erdos_renyi(nodes, edges, seed=seed)
    low = path.lower()
    if low.endswith((".net", ".snap", ".txt")):
        return read_net(path)
    if low.endswith((".dat", ".xs1")):
        return read_xs1(path)
    if low.endswith(".fgf"):
        from .fgf import read_fgf_edges

        return read_fgf_edges(path)
    if low.endswith(".parquet") or low.rstrip("/").endswith("parquet"):
        return rd.read_parquet(path)
    raise ValueError(f"no loader for {path!r}")
