"""(Inexact) Kleinman–Newton for generalized algebraic Riccati equations.

Analog of src/riccati/newton.jl: per Newton step a closed-loop GALE
``F = A − B K`` is solved by the (warm-started) ADI; the inner tolerance
follows Dembo-style forcing with an optional hybrid switch-back to the
classical tolerance, and an Armijo line search guards insufficient residual
decrease (newton.jl:36-143).

Restriction matching the reference (newton.jl:8-18): ``G`` and ``Q`` must
carry identity inner factors, i.e. ``G = B Bᵀ``, ``Q = Cᵀ C``.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from ..config import eps as _eps
from ..lowrank import (
    LowRank,
    lowrank,
    lr_add,
    lr_compress,
    lr_norm,
    lr_scale,
    lr_slice_active,
    lr_zero,
    round_up,
)
from ..ops.operators import lr_update
from ..utils.callbacks import notify
from ..utils.timers import timeit
from .adi import solve_gale_adi
from .problems import ADI, GALEProblem, GAREProblem, GMRES, Newton
from .residuals import residual_gare_lowrank


def _check_identity_inner(M: LowRank, name: str) -> None:
    r = int(M.k)
    D = np.asarray(M.D)[:r, :r]
    if not np.allclose(D, np.eye(r)):
        raise NotImplementedError(
            f"{name} must have an identity inner factor (newton.jl:8-9)"
        )


def solve_gare_newton(prob: GAREProblem, alg: Newton, *, observer=None) -> LowRank:
    _check_identity_inner(prob.G, "G")
    _check_identity_inner(prob.Q, "Q")
    notify(observer, "gare_start", prob, alg)

    E, A, Q = prob.E, prob.A, prob.Q
    B = prob.G.L[:, : int(prob.G.k)]
    Ct = Q.L[:, : int(Q.k)]
    n = prob.n
    m = B.shape[1]
    q = Ct.shape[1]
    dtype = B.dtype

    res = Q
    res_norm = float(lr_norm(res))
    reltol = alg.reltol if alg.reltol is not None else n * _eps(dtype)
    abstol = alg.abstol if alg.abstol is not None else reltol * res_norm

    X = lr_zero(n, max(q + m, 16), dtype)

    inner_alg = alg.inner_alg
    inner_reltol = (
        inner_alg.reltol
        if isinstance(inner_alg, (ADI, GMRES)) and inner_alg.reltol is not None
        else reltol / 10.0
    )

    # The closed-loop coefficient is A − B K with constant A (newton.jl:103):
    # shifted-core factorizations are shared across all Newton steps.
    from ..ops.shifted import ShiftedSolveCache

    shift_cache = ShiftedSolveCache()

    i = 0
    X_prev = None
    while True:
        # Residual & feedback (newton.jl:38-47).
        L, D = X.L, X.D
        EtL = E.tmm(L)
        BtLD = (B.T @ L) @ D
        K = BtLD @ EtL.T
        with timeit("newton.residual"):
            res = residual_gare_lowrank(E, A, prob.G, Q, X)
            res_norm_prev = res_norm
            res_norm = float(lr_norm(res))

        if i > 0 and alg.linesearch:
            # Armijo line search (newton.jl:49-90).
            armijo = 0.1
            if res_norm > (1.0 - armijo) * res_norm_prev:
                X_tilde = X
                beta = 0.5
                lam = beta
                while True:
                    X = lr_add(
                        lr_scale(1.0 - lam, X_prev),
                        lr_scale(lam, X_tilde),
                        r_out=X_prev.r + X_tilde.r,
                    )
                    X = lr_compress(X, r_out=round_up(int(X.k) + 1, 16))
                    res = residual_gare_lowrank(E, A, prob.G, Q, X)
                    res_norm = float(lr_norm(res))
                    if res_norm < (1.0 - lam * armijo) * res_norm_prev:
                        L, D = X.L, X.D
                        EtL = E.tmm(L)
                        BtLD = (B.T @ L) @ D
                        K = BtLD @ EtL.T
                        break
                    lam *= beta
                    if lam < _eps(dtype):
                        warnings.warn("Line search failed; using un-modified iterate")
                        X = X_tilde
                        break
                notify(observer, "gare_metadata", "line search", lam)

        notify(observer, "gare_step", i, X, res, res_norm)

        if res_norm <= abstol:
            break
        if i >= alg.maxiters:
            notify(observer, "gare_failed")
            warnings.warn(
                f"Newton method did not converge: residual={res_norm:g} "
                f"abstol={abstol:g} maxiters={alg.maxiters}"
            )
            break
        i += 1

        # Closed-loop coefficient and RHS (newton.jl:101-112).
        F = lr_update(A, -1.0, B, K)
        EtXB = EtL @ BtLD.T  # (n, m)
        G = jnp.concatenate([Ct, EtXB], axis=1)
        S = jnp.eye(q + m, dtype=dtype)
        RHS = LowRank(L=G, D=S, k=jnp.int32(q + m))

        lyap = GALEProblem(E, F, RHS)
        if alg.inexact:
            eta = alg.inexact_forcing(i, res_norm)
            inner_abstol = eta * res_norm
            if alg.inexact_hybrid:
                # Switch back to the classical tolerance if it is looser
                # (newton.jl:118-127).
                classical_abstol = inner_reltol * float(lr_norm(RHS))
                switch_back = classical_abstol > inner_abstol
                notify(observer, "gare_metadata", "inexact", not switch_back)
                if switch_back:
                    inner_abstol = classical_abstol
            else:
                notify(observer, "gare_metadata", "inexact", True)
        else:
            inner_abstol = inner_reltol * float(lr_norm(RHS))

        X_prev = X
        with timeit("newton.gale_solve"):
            if isinstance(inner_alg, GMRES):
                # Newton+FGMRES — the reference's second benchmark family
                # (benchmark/benchmarks.jl:21-31,36-49).
                from .gmres import solve_gale_gmres

                X = lr_slice_active(solve_gale_gmres(
                    lyap, inner_alg, abstol=inner_abstol,
                    initial_guess=X_prev, observer=observer,
                ))
            else:
                X = lr_slice_active(solve_gale_adi(
                    lyap, inner_alg, abstol=inner_abstol,
                    initial_guess=X_prev, observer=observer,
                    shift_cache=shift_cache,
                ))

    notify(observer, "gare_done", i, X, res, res_norm)
    return X
