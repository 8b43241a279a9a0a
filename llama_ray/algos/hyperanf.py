"""HyperANF — approximate neighborhood function / effective diameter
(Boldi, Rosa & Vigna, WWW '11): per-vertex HyperLogLog registers over
the forward-reachability ball, merged along out-edges each round:

    B_{t+1}(v) = {v} ∪ ⋃_{(v,w)∈E} B_t(w)
    R_{t+1}(v) = max(R_t(v), max_{(v,w)∈E} R_t(w))   (elementwise)

The register merge is an idempotent, commutative elementwise max —
exactly ``gather_max_multi`` over the reversed (src-range) pool, one
sweep per round, O(V·m) driver state (m = 64 registers here; at
10^12-vertex scale the registers live sharded in the actors and only
the per-partition harmonic sums travel).

Registers are deterministic: h = splitmix64((id·GOLD) ⊕ seed),
bucket = h ≫ 58, rho = 59 − bit_length(h mod 2^58) — pure integer
state, so the register matrix after T rounds is hash-exactly
replayable in SQL (``pipelines/oracles.py::hyperanf_sql``); the HLL
cardinality estimate and effective diameter are float post-processing
checked against exact BFS ball sizes in pytest.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..data_ops.dedup import _GOLD, _mix64
from ..engine.bsp import shared_pool
from ..graph import Graph

DEFAULT_ANF_SEED = 20260818
M = 64  # registers (p = 6); alpha_64 from the HLL paper
ALPHA_64 = 0.709


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (floats would round above 2^53)."""
    x = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    return bl + (x > 0)


def init_registers(ids: np.ndarray, seed: int = DEFAULT_ANF_SEED) -> np.ndarray:
    """(V, M) int64: each vertex's ball starts as {itself}."""
    h = _mix64(ids.astype(np.uint64) * _GOLD ^ np.uint64(seed))
    bucket = (h >> np.uint64(58)).astype(np.int64)
    rem = h & np.uint64((1 << 58) - 1)
    rho = 59 - _bit_length_u64(rem)
    R = np.zeros((len(ids), M), np.int64)
    R[np.arange(len(ids)), bucket] = rho
    return R


def _hll_estimate(R: np.ndarray, n_total: int) -> np.ndarray:
    """Per-vertex HLL cardinality with the small-range correction."""
    est = ALPHA_64 * M * M / np.sum(np.exp2(-R.astype(np.float64)), axis=1)
    zeros = np.sum(R == 0, axis=1)
    small = (est <= 2.5 * M) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = M * np.log(M / np.maximum(zeros, 1e-300))
    return np.where(small, lin, est)


@dataclass
class ANFResult:
    registers: np.ndarray  # (V, M) after the final round
    neighborhood_function: list  # Σ_v |B_t(v)| estimate per t (t=0..T)
    effective_diameter: float  # smallest t with N(t) ≥ 0.9 · N(T)
    rounds: int


def hyperanf(
    graph: Graph,
    *,
    rounds: int | None = None,
    seed: int = DEFAULT_ANF_SEED,
    direction: str = "out",
) -> ANFResult:
    """Run until the registers stop changing (ball saturation) or for
    a fixed number of ``rounds``. ``direction="out"`` grows forward
    balls (vertices reachable FROM v); ``"in"`` grows co-reachability
    balls (vertices that can reach v) — the HyperBall orientation for
    harmonic/closeness centrality."""
    if direction not in ("out", "in"):
        raise ValueError(f"unknown direction {direction!r}")
    R = init_registers(graph.ids, seed)
    pool = shared_pool(graph, view="reversed" if direction == "out" else "forward")
    nf = [float(_hll_estimate(R, graph.num_vertices).sum())]
    t = 0
    max_t = rounds if rounds is not None else 256
    while t < max_t:
        nxt = np.maximum(R, pool.gather_max_multi(R))
        t += 1
        changed = not np.array_equal(nxt, R)
        R = nxt
        nf.append(float(_hll_estimate(R, graph.num_vertices).sum()))
        if rounds is None and not changed:
            break
    target = 0.9 * nf[-1]
    eff = next(i for i, v in enumerate(nf) if v >= target)
    return ANFResult(R, nf, float(eff), t)


def harmonic_centrality(
    graph: Graph,
    *,
    seed: int = DEFAULT_ANF_SEED,
    max_rounds: int = 256,
) -> pa.Table:
    """HyperBall harmonic centrality (Boldi & Vigna, WSDM '14):
    H(v) = Σ_{u≠v} 1/d(u→v), estimated as Σ_t (|B_t(v)|−|B_{t−1}(v)|)/t
    over the co-reachability balls (negative HLL fluctuations clamped,
    as in the paper). One gather_max_multi per round; O(V) driver
    state beyond the registers."""
    R = init_registers(graph.ids, seed)
    pool = shared_pool(graph, view="forward")
    prev = _hll_estimate(R, graph.num_vertices)
    H = np.zeros(graph.num_vertices)
    t = 0
    while t < max_rounds:
        nxt = np.maximum(R, pool.gather_max_multi(R))
        t += 1
        if np.array_equal(nxt, R):
            break
        R = nxt
        est = _hll_estimate(R, graph.num_vertices)
        H += np.maximum(est - prev, 0.0) / t
        prev = est
    return pa.table({"vertex": graph.ids, "harmonic": H})


def registers_table(graph: Graph, *, rounds: int, seed: int = DEFAULT_ANF_SEED) -> pa.Table:
    """Long-format (vertex, reg, value) registers after ``rounds``
    merges — the integer-exact surface the SQL oracle replays."""
    res = hyperanf(graph, rounds=rounds, seed=seed)
    V = graph.num_vertices
    return pa.table(
        {
            "vertex": np.repeat(graph.ids, M),
            "reg": np.tile(np.arange(M, dtype=np.int64), V),
            "value": res.registers.ravel(),
        }
    )
