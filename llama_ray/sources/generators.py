"""Deterministic graph generators — distributed, seeded per logical chunk.

Reference analogues: the Erdős–Rényi and R-MAT pseudo-file loaders
(`/root/reference/llama/include/llama/loaders/ll_gen_erdosrenyi.h:76-84`,
``ll_gen_rmat.h:204-238`` — defaults a=0.57, b=0.19, c=0.19).

Reproducibility: every edge id belongs to a fixed-size logical chunk
(``id // CHUNK``); the chunk's RNG stream is seeded ``(seed, chunk)``
and the whole chunk is drawn before slicing out the rows present in
the batch. Output therefore depends only on ``(seed, id)`` — never on
Ray's block layout or ``override_num_blocks`` — at the cost of
regenerating at most one partial chunk on each batch edge.
"""

from __future__ import annotations

import numpy as np
import ray.data as rd

_CHUNK = 1 << 16


def _chunked_draw(ids: np.ndarray, seed: int, draw) -> dict:
    """Per-row values for ``ids`` from fixed-chunk RNG streams.

    ``draw(rng, m) -> dict[str, np.ndarray]`` generates a full chunk of
    ``m`` rows; rows are then sliced by position within the chunk, so
    the value of row ``id`` is a pure function of ``(seed, id)``.
    """
    ids = np.asarray(ids, dtype=np.int64)
    chunks = ids // _CHUNK
    out: dict[str, np.ndarray] = {}
    for c in np.unique(chunks):
        rng = np.random.default_rng([seed, int(c)])
        full = draw(rng, _CHUNK)
        mask = chunks == c
        off = ids[mask] - c * _CHUNK
        for k, v in full.items():
            out.setdefault(k, np.empty(len(ids), v.dtype))[mask] = v[off]
    return out


def erdos_renyi(
    nodes: int, edges: int, *, seed: int = 42, override_num_blocks: int | None = None
) -> rd.Dataset:
    """Uniform random directed multigraph with ``edges`` edges."""

    def draw(rng, m):
        return {
            "src": rng.integers(0, nodes, m, dtype=np.int64),
            "dst": rng.integers(0, nodes, m, dtype=np.int64),
        }

    def gen(batch: dict) -> dict:
        return _chunked_draw(batch["id"], seed, draw)

    return rd.range(edges, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def rmat(
    scale: int,
    avg_degree: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    *,
    seed: int = 42,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """R-MAT power-law graph: 2^scale vertices, avg_degree * 2^scale
    edges. Recursive quadrant sampling, fully vectorized per chunk."""
    n = 1 << scale
    num_edges = avg_degree * n

    def draw(rng, m):
        src = np.zeros(m, dtype=np.int64)
        dst = np.zeros(m, dtype=np.int64)
        r = rng.random((scale, m))
        for bit in range(scale):
            rb = r[bit]
            # quadrant probabilities: a | b / c | d
            src_bit = rb >= a + b
            dst_bit = (rb >= a) & (rb < a + b) | (rb >= a + b + c)
            src = (src << 1) | src_bit
            dst = (dst << 1) | dst_bit
        return {"src": src, "dst": dst}

    def gen(batch: dict) -> dict:
        return _chunked_draw(batch["id"], seed, draw)

    return rd.range(num_edges, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )


def watts_strogatz(
    nodes: int,
    k: int,
    beta: float = 0.1,
    *,
    seed: int = 42,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Watts–Strogatz small-world graph (Watts & Strogatz, Nature
    1998): a ring lattice where vertex ``i`` connects to its ``k/2``
    clockwise neighbors, each edge independently rewired with
    probability ``beta`` to a uniform random endpoint.

    Same determinism contract as the other generators: edge ``e``
    (``e = i*(k/2) + (j-1)``, the j-th clockwise edge of vertex i) is a
    pure function of ``(seed, e)`` — block-layout independent.
    Rewiring may create duplicates/self-loops (multigraph semantics,
    like the reference's generators); pipe through ``dedup_edges`` for
    a simple graph."""
    if k % 2 or k <= 0:
        raise ValueError("watts_strogatz: k must be positive and even")
    half = k // 2
    num_edges = nodes * half

    def draw(rng, m):
        # chunk rows are edge ids e; decode (i, j) lazily in gen —
        # here we only draw the random streams (rewire coin + target)
        return {
            "u": rng.random(m),
            "t": rng.integers(0, nodes, m, dtype=np.int64),
        }

    def gen(batch: dict) -> dict:
        ids = np.asarray(batch["id"], dtype=np.int64)
        rnd = _chunked_draw(ids, seed, draw)
        i = ids // half
        j = ids % half + 1
        lattice_dst = (i + j) % nodes
        rew = rnd["u"] < beta
        dst = np.where(rew, rnd["t"], lattice_dst)
        return {"src": i, "dst": dst}

    return rd.range(num_edges, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )
