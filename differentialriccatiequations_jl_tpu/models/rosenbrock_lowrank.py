"""Low-rank (LRSIF) Rosenbrock integrators for GDRE problems (L5).

Analog of src/riccati/lowrank_ros1.jl and lowrank_ros2.jl: a fixed-step
backward time loop on an ``X = L D Lᵀ`` state.  Each step assembles a GALE
whose coefficient is the lazy closed-loop update ``F = (A + c·E) − B K``
and whose right-hand side is a small concatenated low-rank factorization;
the GALE is solved by the ADI, warm-started with the previous state for
Ros1 (lowrank_ros1.jl:47-49).

The factor/feedback algebra per step is jitted; the time loop itself is a
host loop (the jitted end-to-end step for compiled/sharded execution lives
in `models.compiled`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lowrank import (
    LowRank,
    lowrank,
    lr_add,
    lr_compress,
    lr_scale,
    lr_slice_active,
    round_up,
)
from ..ops.operators import lin_comb, lr_update, scale_op
from ..ops.shifted import ShiftedSolveCache
from ..utils.callbacks import notify
from ..utils.timers import timeit
from .adi import solve_gale_adi
from .problems import ADI, GALEProblem, GDREProblem, DRESolution, Ros1, Ros2


def time_grid(tspan, dt: float) -> np.ndarray:
    """``t0:dt:tf`` — fixed-step grid, negative ``dt`` integrates backward."""
    t0, tf = tspan
    nsteps = int(round((tf - t0) / dt))
    if nsteps < 1 or not math.isclose(t0 + nsteps * dt, tf, rel_tol=1e-9, abs_tol=1e-9):
        raise ValueError(f"dt={dt} does not evenly divide tspan={tspan}")
    return t0 + dt * np.arange(nsteps + 1)


@jax.jit
def feedback_K(E, B, X: LowRank) -> jax.Array:
    """``K = Bᵀ X E`` in factored form ``(BᵀLD)(LᵀE)``
    (lowrank_ros1.jl:26-29)."""
    BtLD = (B.T @ X.L) @ X.D
    EtL = E.tmm(X.L)
    return BtLD @ EtL.T


@jax.jit
def _ros1_rhs(E, B, C, X: LowRank, tau) -> LowRank:
    """Ros1 right-hand side ``[Cᵀ EᵀL] · blkdiag(I_q, (BᵀLD)ᵀ(BᵀLD) + D/τ)``
    (lowrank_ros1.jl:42-44)."""
    q = C.shape[0]
    L, D = X.L, X.D
    r = L.shape[1]
    BtLD = (B.T @ L) @ D
    G = jnp.concatenate([C.T, E.tmm(L)], axis=1)
    S = jnp.zeros((q + r, q + r), G.dtype)
    S = S.at[:q, :q].set(jnp.eye(q, dtype=G.dtype))
    S = S.at[q:, q:].set(BtLD.T @ BtLD + D / tau)
    res = LowRank(L=G, D=S, k=jnp.minimum(q + X.k, q + r))
    return lr_compress(res)


def solve_gdre_lowrank_ros1(prob: GDREProblem, alg: Ros1, *, dt: float,
                            save_state: bool = False, observer=None) -> DRESolution:
    notify(observer, "gdre_start", prob, alg)
    E, A, B, C = prob.E, prob.A, prob.B, prob.C
    X = prob.X0
    tstops = time_grid(prob.tspan, dt)

    Xs = [X]
    K = feedback_K(E, B, X)
    Ks = [K]
    notify(observer, "gdre_step", float(tstops[0]), X, K)

    inner_alg = alg.inner_alg if alg.inner_alg is not None else ADI()
    # Fixed-step sweep: the shifted solve core (A − E/(2τ))ᵀ + μEᵀ is
    # constant across ALL time steps (τ constant), so one factorization
    # cache serves the entire trajectory (see ops/shifted.ShiftedSolveCache).
    tau0 = float(tstops[0] - tstops[1])
    F_base = lin_comb(A, -1.0 / (2.0 * tau0), E)
    cache = ShiftedSolveCache()
    for i in range(1, len(tstops)):
        tau = float(tstops[i - 1] - tstops[i])

        # Closed-loop Lyapunov coefficient F = (A − E/(2τ)) − B K
        # (lowrank_ros1.jl:39).
        F = lr_update(F_base, -1.0, B, K)

        R = _ros1_rhs(E, B, C, X, tau)

        lyap = GALEProblem(E, F, R)
        with timeit("gdre.gale_solve"):
            X = solve_gale_adi(lyap, inner_alg, initial_guess=X,
                               observer=observer, shift_cache=cache)
        X = lr_slice_active(X)
        if save_state:
            Xs.append(X)

        K = feedback_K(E, B, X)
        Ks.append(K)
        notify(observer, "gdre_step", float(tstops[i]), X, K)

    if not save_state:
        Xs.append(X)
    notify(observer, "gdre_done")
    return DRESolution(Xs, Ks, tstops)


@jax.jit
def _ros2_rhs1(E, A, B, C, X: LowRank) -> LowRank:
    """Ros2 stage-1 RHS with indefinite 3×3 block inner factor
    (lowrank_ros2.jl:44-55)."""
    q = C.shape[0]
    L, D = X.L, X.D
    r = L.shape[1]
    BtLD = (B.T @ L) @ D
    G = jnp.concatenate([C.T, A.tmm(L), E.tmm(L)], axis=1)
    dim = q + 2 * r
    S = jnp.zeros((dim, dim), G.dtype)
    S = S.at[:q, :q].set(jnp.eye(q, dtype=G.dtype))
    S = S.at[q:q + r, q + r:].set(D)
    S = S.at[q + r:, q:q + r].set(D)
    S = S.at[q + r:, q + r:].set(-(BtLD.T @ BtLD))
    res = LowRank(L=G, D=S, k=jnp.minimum(q + 2 * X.k, dim))
    return lr_compress(res)


@jax.jit
def _ros2_rhs2(E, B, K1: LowRank, tau, gamma) -> LowRank:
    """Ros2 stage-2 RHS built from the stage-1 solution
    (lowrank_ros2.jl:60-66)."""
    T1, D1 = K1.L, K1.D
    BtT1D1 = (B.T @ T1) @ D1
    G2 = E.tmm(T1)
    S2 = (tau**2) * (BtT1D1.T @ BtT1D1) + (2.0 - 1.0 / gamma) * D1
    return LowRank(L=G2, D=S2, k=K1.k)


def solve_gdre_lowrank_ros2(prob: GDREProblem, alg: Ros2, *, dt: float,
                            save_state: bool = False, observer=None) -> DRESolution:
    notify(observer, "gdre_start", prob, alg)
    E, A, B, C = prob.E, prob.A, prob.B, prob.C
    X = prob.X0
    tstops = time_grid(prob.tspan, dt)
    gamma = 1.0 + 1.0 / math.sqrt(2.0)  # lowrank_ros2.jl:22

    Xs = [X]
    K = feedback_K(E, B, X)
    Ks = [K]
    notify(observer, "gdre_step", float(tstops[0]), X, K)

    inner_alg = alg.inner_alg if alg.inner_alg is not None else ADI()
    # γτ·A − E/2 is constant across the fixed-step sweep — share one
    # factorization cache over all steps and both stages.
    tau0 = float(tstops[0] - tstops[1])
    F_base = lin_comb(scale_op(A, gamma * tau0), -0.5, E)
    cache = ShiftedSolveCache()
    for i in range(1, len(tstops)):
        tau = float(tstops[i - 1] - tstops[i])
        gt = gamma * tau

        # F = γτ·A − E/2 − γτ·B K   (lowrank_ros2.jl:40)
        F = lr_update(F_base, -1.0 / gt, B, K)

        R1 = _ros2_rhs1(E, A, B, C, X)
        K1 = solve_gale_adi(GALEProblem(E, F, R1), inner_alg, observer=observer,
                            shift_cache=cache)

        R2 = _ros2_rhs2(E, B, K1, tau, gamma)
        K2 = solve_gale_adi(GALEProblem(E, F, R2), inner_alg, observer=observer,
                            shift_cache=cache)

        # X ← X + (2 − 1/(2γ))τ·K1 − (τ/2)·K2   (lowrank_ros2.jl:71-72)
        K1 = lr_slice_active(K1)
        K2 = lr_slice_active(K2)
        X = lr_add(X, lr_scale((2.0 - 1.0 / (2.0 * gamma)) * tau, K1),
                   r_out=X.r + K1.r)
        X = lr_add(X, lr_scale(-tau / 2.0, K2), r_out=X.r + K2.r)
        X = lr_slice_active(lr_compress(X))
        if save_state:
            Xs.append(X)

        K = feedback_K(E, B, X)
        Ks.append(K)
        notify(observer, "gdre_step", float(tstops[i]), X, K)

    if not save_state:
        Xs.append(X)
    notify(observer, "gdre_done")
    return DRESolution(Xs, Ks, tstops)
