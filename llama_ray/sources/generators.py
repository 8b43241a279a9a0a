"""Deterministic graph generators — distributed, seeded per block.

Reference analogues: the Erdős–Rényi and R-MAT pseudo-file loaders
(`/root/reference/llama/include/llama/loaders/ll_gen_erdosrenyi.h:76-84`,
``ll_gen_rmat.h:204-238`` — defaults a=0.57, b=0.19, c=0.19). Each
output block derives its RNG stream from (seed, block_start), so
generation is reproducible regardless of parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def erdos_renyi(
    nodes: int, edges: int, *, seed: int = 42, override_num_blocks: int | None = None
) -> rd.Dataset:
    """Uniform random directed multigraph with ``edges`` edges."""

    def gen(batch: dict) -> dict:
        ids = batch["id"]
        rng = np.random.default_rng([seed, int(ids[0])])
        m = len(ids)
        return {
            "src": rng.integers(0, nodes, m, dtype=np.int64),
            "dst": rng.integers(0, nodes, m, dtype=np.int64),
        }

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
    edges. Recursive quadrant sampling, fully vectorized per batch."""
    n = 1 << scale
    num_edges = avg_degree * n

    def gen(batch: dict) -> dict:
        ids = batch["id"]
        rng = np.random.default_rng([seed, int(ids[0])])
        m = len(ids)
        src = np.zeros(m, dtype=np.int64)
        dst = np.zeros(m, dtype=np.int64)
        for bit in range(scale):
            r = rng.random(m)
            # quadrant probabilities: a | b / c | d
            src_bit = r >= a + b
            dst_bit = (r >= a) & (r < a + b) | (r >= a + b + c)
            src = (src << 1) | src_bit
            dst = (dst << 1) | dst_bit
        return {"src": src, "dst": dst}

    return rd.range(num_edges, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="numpy"
    )
