"""Shifted pencil operators ``Aᵀ + μ Eᵀ`` — the ADI hot path.

Each ADI iteration solves ``(Aᵀ + μ Eᵀ) V = W`` (adi.jl:155-160, 196-204;
the reference writes ``A' + (μE)'``).  ``A`` is typically a lazy closed-loop
update ``A₀ − B K`` (lowrank_ros1.jl:39, newton.jl:103), so the shifted
operator is *sparse/dense core + low-rank correction* and the solve routes
through Sherman–Morrison–Woodbury with a factorization of the core only.

Complex shifts produce complex operators; the double-step recombination in
the ADI keeps the solution factors real (adi.jl:205-217).
"""

from __future__ import annotations

import jax.numpy as jnp

from .operators import DenseOp, LowRankUpdateOp, as_operator
from .blocklinear import Backslash, ShermanMorrisonWoodbury, Krylov, prepare


def shifted_operator(E, A, mu):
    """Build the operator ``Aᵀ + μ Eᵀ`` (lazily for low-rank-updated ``A``)."""
    E = as_operator(E)
    A = as_operator(A)
    if isinstance(A, LowRankUpdateOp):
        core = shifted_operator(E, A.A, mu)
        # (A₀ + α⁻¹UV)ᵀ + μEᵀ = (A₀ᵀ + μEᵀ) + α⁻¹ Vᵀ Uᵀ
        dtype = core.dtype
        return LowRankUpdateOp(
            core,
            jnp.asarray(A.alpha, dtype),
            jnp.asarray(A.V.T, dtype),
            jnp.asarray(A.U.T, dtype),
        )
    if isinstance(A, DenseOp) and isinstance(E, DenseOp):
        mu = jnp.asarray(mu)
        M = A.M.T.astype(jnp.result_type(A.dtype, mu.dtype)) + mu * E.M.T
        return DenseOp(M)
    # banded core: combine on the shared diagonal set (ops/dia.py)
    from .dia import DiaOp, shifted_dia

    if isinstance(A, DiaOp):
        return shifted_dia(E, A, mu)
    # block-sparse core: combine on the shared pattern (ops/sparse.py)
    from .sparse import shifted_bell

    return shifted_bell(E, A, mu)


def default_inner_alg(A) -> object:
    """Pick the natural solver for a shifted coefficient, mirroring the
    reference's `Backslash`/`SMW` routing (LowRankUpdate.jl:61-64)."""
    A = as_operator(A)
    if isinstance(A, LowRankUpdateOp):
        return ShermanMorrisonWoodbury(
            outer=default_inner_alg(A.A), inner=Backslash()
        )
    if isinstance(A, DenseOp):
        return Backslash()
    return Krylov()


def prepare_shifted(E, A, mu, alg=None):
    """Factor/prepare a solver for ``(Aᵀ + μEᵀ) V = W``."""
    op = shifted_operator(E, A, mu)
    if alg is None:
        alg = default_inner_alg(op)
    return prepare(op, alg)


class ShiftedSolveCache:
    """Cross-iteration cache of factored shifted cores ``A₀ᵀ + μEᵀ``.

    The ADI consumes a (usually cyclic) set of shifts; the *core* of each
    shifted coefficient depends only on ``(E, A₀, μ)`` — constant across ADI
    iterations, across Newton steps (newton.jl:103: only the feedback term
    ``B K`` changes), and across all time steps of a fixed-``dt`` Rosenbrock
    sweep (lowrank_ros1.jl:39: ``A − E/(2τ)`` with constant ``τ``).  The
    rank-m feedback part is absorbed by the Sherman–Morrison–Woodbury
    correction, which reuses the cached core factorization.

    This turns the per-ADI-iteration cost on the dense path from one
    O(n³) LU into O(n²(m+q)) triangular solves.  The cache key is the shift
    value; validity is owned by the caller (create one cache per
    (E, A₀) pencil).
    """

    def __init__(self, max_entries: int = 64):
        self._core = {}
        self.max_entries = max_entries

    def core_solver(self, mu: complex, build):
        key = complex(mu)
        s = self._core.get(key)
        if s is None:
            if len(self._core) >= self.max_entries:  # FIFO eviction
                self._core.pop(next(iter(self._core)))
            s = self._core[key] = build()
        return s

    def __len__(self):
        return len(self._core)


def solve_shifted(E, A, mu, W, alg=None):
    return prepare_shifted(E, A, mu, alg).solve(W)
