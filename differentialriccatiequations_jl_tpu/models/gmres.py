"""Matrix-valued (flexible) GMRES for GALE problems (src/lyapunov/gmres.jl).

FGMRES (Saad 1993, Alg. 2.2) on the Lyapunov operator

    𝓛 X = AᵀXE + EᵀXA,     𝓛 · (Z, Y) = ([EᵀZ AᵀZ], [[0,Y],[Y,0]])

with low-rank Krylov "vectors", optional low-rank compression of basis
vectors, and an optional Lyapunov-solver preconditioner (typically a capped
ADI) applied per Krylov vector (gmres.jl:48-52).  The small least-squares
problem and Hessenberg bookkeeping run on host; all matrix work is jitted
low-rank algebra.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax.numpy as jnp
import numpy as np

from ..lowrank import (
    LowRank,
    lowrank,
    lr_add,
    lr_compress,
    lr_dot,
    lr_norm,
    lr_scale,
    lr_zero,
    round_up,
)
from ..utils.callbacks import notify
from ..utils.timers import timeit
from .problems import ADI, GALEProblem, GMRES
from .residuals import residual_gale_lowrank
from . import shifts as shifts_mod


def _apply_lyapunov_operator(E, A, X: LowRank) -> LowRank:
    """``𝓛 X`` in factored form; storage width doubles (gmres.jl:108-120)."""
    Z, Y = X.L, X.D
    r = Z.shape[1]
    L2 = jnp.concatenate([E.tmm(Z), A.tmm(Z)], axis=1)
    Y2 = jnp.zeros((2 * r, 2 * r), Y.dtype)
    Y2 = Y2.at[:r, r:].set(Y)
    Y2 = Y2.at[r:, :r].set(Y)
    return LowRank(L=L2, D=Y2, k=jnp.minimum(2 * X.k, 2 * r))


def specialize(alg, prob):
    """Pre-initialize expensive shift strategies once per problem
    (gmres.jl:122-134)."""
    if isinstance(alg, shifts_mod.Cyclic):
        return shifts_mod.init_shifts(alg, prob)
    if isinstance(alg, shifts_mod.Heuristic):
        return shifts_mod.init_shifts(alg, prob)
    if isinstance(alg, ADI):
        return dataclasses.replace(alg, shifts=specialize(alg.shifts, prob))
    if isinstance(alg, GMRES):
        return dataclasses.replace(
            alg, preconditioner=specialize(alg.preconditioner, prob)
        )
    return alg


def solve_gale_gmres(prob: GALEProblem, alg: GMRES, *, initial_guess=None,
                     abstol=None, observer=None) -> LowRank:
    from .adi import solve_gale_adi  # preconditioner path

    notify(observer, "gale_start", prob, alg)
    E, A, C = prob.E, prob.A, prob.C
    n = prob.n
    dtype = C.dtype
    maxiters, maxrestarts = alg.maxiters, alg.maxrestarts

    if alg.ignore_initial_guess or initial_guess is None:
        X = lr_zero(n, C.r, dtype)
    else:
        X = initial_guess

    reltol = alg.reltol if alg.reltol is not None else n * float(jnp.finfo(dtype).eps)
    if abstol is None:
        abstol = alg.abstol if alg.abstol is not None else reltol * float(lr_norm(C))

    precond = specialize(alg.preconditioner, prob)

    H = np.zeros((maxiters + 1, maxiters))
    b = np.zeros(maxiters + 1)

    m = 0
    residual_norm = np.inf
    restarts = 0
    for restarts in range(maxrestarts + 1):
        m = 0
        R0 = residual_gale_lowrank(E, A, C, X)
        beta = residual_norm = float(lr_norm(R0))
        notify(observer, "gale_step", 0, X, R0, beta)
        if beta <= abstol:
            break

        V: list = [None] * (maxiters + 1)
        Z: list = [None] * maxiters
        V[0] = lr_scale(1.0 / beta, R0)
        H[:] = 0.0
        b[:] = 0.0
        b[0] = beta
        y = np.zeros(0)
        for j in range(maxiters):
            if precond is None:
                Z[j] = V[j]
            elif callable(precond):
                # Prepared preconditioner closure (e.g. one compiled-ADI
                # dispatch over cached shifted cores, models/compiled.py).
                with timeit("gmres.preconditioner"):
                    Z[j] = precond(GALEProblem(E, A, V[j]))
            else:
                with timeit("gmres.preconditioner"):
                    Z[j] = solve_gale_adi(GALEProblem(E, A, V[j]), precond,
                                          observer=observer)
            with timeit("gmres.lyapunov_op"):
                W = _apply_lyapunov_operator(E, A, Z[j])
            if alg.compression:
                W = lr_compress(W, r_out=round_up(int(W.k) + 1, 8))
            for i in range(j + 1):
                H[i, j] = float(lr_dot(V[i], W))
                W = lr_add(W, lr_scale(-H[i, j], V[i]),
                           r_out=W.r + V[i].r)
            hjj = float(lr_norm(W))
            H[j + 1, j] = hjj

            # Least squares min ‖b − Hy‖ for the current Hessenberg block:
            m = j + 1
            Hm = H[: m + 1, :m]
            bm = b[: m + 1]
            y, *_ = np.linalg.lstsq(Hm, bm, rcond=None)
            residual_norm = float(np.linalg.norm(bm - Hm @ y))
            # Happy breakdown: the Krylov space is invariant — the solution
            # is exact in the current subspace; normalizing W would divide
            # by ~0.
            if hjj <= 1e4 * float(jnp.finfo(dtype).eps) * beta:
                break
            if residual_norm <= abstol:
                break
            V[j + 1] = lr_scale(1.0 / hjj, W)
            notify(observer, "gale_step", m, None, None, residual_norm)
            if alg.compression:
                V[j + 1] = lr_compress(
                    V[j + 1], r_out=round_up(int(V[j + 1].k) + 1, 8)
                )

        # X ← X − Σ y_j Z_j  (our residual convention is C + 𝓛X, gmres.jl:100-104)
        for jj in range(m):
            X = lr_add(X, lr_scale(-float(y[jj]), Z[jj]),
                       r_out=X.r + Z[jj].r)
        if alg.compression:
            X = lr_compress(X, r_out=round_up(int(X.k) + 1, 8))
        # The small-LS estimate drifts from the true residual under basis
        # compression (gmres.jl:70-74) — terminate (and warn) only on the
        # *true* low-rank residual.
        residual_norm = float(lr_norm(residual_gale_lowrank(E, A, C, X)))
        notify(observer, "gale_step", m, X, None, residual_norm)
        if residual_norm <= abstol:
            break

    if residual_norm > abstol:
        notify(observer, "gale_failed")
        if alg.warn_convergence:
            warnings.warn(
                f"GMRES did not converge: residual={residual_norm:g} "
                f"abstol={abstol:g} maxrestarts={maxrestarts} "
                f"maxiters={maxiters}"
            )

    iters = restarts * maxiters + m
    notify(observer, "gale_done", iters, X, None, residual_norm)
    return X
