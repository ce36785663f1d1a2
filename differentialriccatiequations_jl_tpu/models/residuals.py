"""Residuals of GALE / GARE / GDRE in low-rank and dense form.

Low-rank residuals never form the n×n matrix: they assemble a factor
``R = [G  EᵀL  AᵀL]`` with a small block middle matrix and compress,
following Benner–Li–Penzl 2008 (lyapunov/residual.jl:3-31,
riccati/residual.jl:6-52).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lowrank import LowRank, lowrank, lr_compress
from ..ops.operators import as_operator


@partial(jax.jit, static_argnames=("r_out",))
def residual_gale_lowrank(E, A, C: LowRank, X: LowRank,
                          r_out: int | None = None) -> LowRank:
    """GALE residual ``C + AᵀXE + EᵀXA`` as a compressed `LowRank`.

    Factor ``[G  EᵀL  AᵀL]`` with middle matrix
    ``[[S,0,0],[0,0,D],[0,D,0]]`` (lyapunov/residual.jl:3-31).
    """
    E = as_operator(E)
    A = as_operator(A)
    G, S = C.L, C.D
    L, D = X.L, X.D
    qg = G.shape[1]
    r = L.shape[1]
    R = jnp.concatenate([G, E.tmm(L), A.tmm(L)], axis=1)
    dim = qg + 2 * r
    T = jnp.zeros((dim, dim), R.dtype)
    T = T.at[:qg, :qg].set(S)
    T = T.at[qg:qg + r, qg + r:].set(D)
    T = T.at[qg + r:, qg:qg + r].set(D)
    k = C.k + 2 * X.k
    res = lowrank(R, T, k=None)  # invariant holds: padded cols already zero
    res = LowRank(L=res.L, D=res.D, k=jnp.minimum(k, dim))
    return lr_compress(res, r_out=r_out)


def residual_gale_dense(E, A, C, X):
    """Dense GALE residual (lyapunov/residual.jl:33-42)."""
    E = as_operator(E)
    A = as_operator(A)
    C = C.to_dense() if isinstance(C, LowRank) else jnp.asarray(C)
    return C + A.tmm(X) @ E.to_dense() + E.tmm(X) @ A.to_dense()


@partial(jax.jit, static_argnames=("r_out",))
def residual_gare_lowrank(E, A, G: LowRank, Q: LowRank, X: LowRank,
                          r_out: int | None = None) -> LowRank:
    """GARE residual ``Q + AᵀXE + EᵀXA − EᵀXGXE`` as a compressed `LowRank`.

    Factor ``[Cᵀ AᵀL EᵀL]`` with middle matrix containing the indefinite
    block ``−D Lᵀ G L D`` (riccati/residual.jl:36-51).
    """
    E = as_operator(E)
    A = as_operator(A)
    Ct, S = Q.L, Q.D
    B, Rinv = G.L, G.D
    L, D = X.L, X.D
    h = Ct.shape[1]
    r = L.shape[1]
    AtL = A.tmm(L)
    EtL = E.tmm(L)
    BtLD = (B.T @ L) @ D
    DLGLD = BtLD.T @ Rinv @ BtLD
    R = jnp.concatenate([Ct, AtL, EtL], axis=1)
    dim = h + 2 * r
    T = jnp.zeros((dim, dim), R.dtype)
    T = T.at[:h, :h].set(S)
    T = T.at[h:h + r, h + r:].set(D)
    T = T.at[h + r:, h:h + r].set(D)
    T = T.at[h + r:, h + r:].set(-DLGLD)
    k = Q.k + 2 * X.k
    res = LowRank(L=R, D=T, k=jnp.minimum(k, dim))
    return lr_compress(res, r_out=r_out)


def residual_gare_dense(E, A, G: LowRank, Q, X):
    """Dense GARE residual (riccati/residual.jl:54-66)."""
    E = as_operator(E)
    A = as_operator(A)
    Ed = E.to_dense()
    Q = Q.to_dense() if isinstance(Q, LowRank) else jnp.asarray(Q)
    B, Rinv = G.L, G.D
    BtXE = (B.T @ X) @ Ed
    return (Q + A.tmm(X) @ Ed + E.tmm(X) @ A.to_dense()
            - BtXE.T @ Rinv @ BtXE)


def residual(prob, X, **kw):
    """Residual dispatch mirroring the reference's exported `residual`."""
    from .problems import GALEProblem, GAREProblem

    if isinstance(prob, GALEProblem):
        if isinstance(X, LowRank) and isinstance(prob.C, LowRank):
            return residual_gale_lowrank(prob.E, prob.A, prob.C, X, **kw)
        return residual_gale_dense(prob.E, prob.A, prob.C, X)
    if isinstance(prob, GAREProblem):
        if isinstance(X, LowRank):
            return residual_gare_lowrank(prob.E, prob.A, prob.G, prob.Q, X, **kw)
        return residual_gare_dense(prob.E, prob.A, prob.G, prob.Q, X)
    raise TypeError(f"no residual for problem type {type(prob)}")
