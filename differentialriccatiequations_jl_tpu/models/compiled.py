"""Fully-compiled (single-jit) ADI and LRSIF Rosenbrock stepping.

The default drivers (`models.adi`, `models.rosenbrock_lowrank`) orchestrate
jitted kernels from the host for observer/shift flexibility.  This module is
the *compiled* execution path: one `jax.jit` containing the complete ADI
`lax.while_loop` (shifted solves, residual updates, double steps, periodic
compression, convergence test) and the full Ros1 time step around it.  It is
what runs on TPU in steady state, what `__graft_entry__.entry()` exposes,
and what `parallel.dryrun_multichip` shards over a device mesh.

Shifts are consumed from a precomputed cyclic buffer (the reference's
benchmark configuration, `Cyclic(Heuristic(20,30,30))`,
benchmark/benchmarks.jl:15-19).  Static shape configuration lives in
`CompiledConfig` — residual width and iterate capacity are fixed buffer
sizes here (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..lowrank import LowRank, lr_add, lr_compress
from ..ops.operators import lin_comb, lr_update
from ..ops.shifted import prepare_shifted, shifted_operator, default_inner_alg
from .adi import _residual_norm


@dataclasses.dataclass(frozen=True)
class CompiledConfig:
    """Static configuration of the compiled ADI/Rosenbrock step."""

    maxiters: int = 60
    compression_interval: int = 10
    r_res: int = 32  # residual factor width (≥ numerical residual rank)
    inner_alg: object = None  # None → routed per operator kind


def _masked_cols(W, k):
    r = W.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    return jnp.where(col < k, W, 0)


@partial(jax.jit, static_argnames=("cfg",))
def adi_compiled(E, A, W0, T0, w_k, X0: LowRank, shifts, abstol,
                 cfg: CompiledConfig):
    """Low-rank ADI as a single `lax.while_loop`.

    Args:
      E, A: operators (A may be a `LowRankUpdateOp` closed-loop coefficient).
      W0, T0: residual factors — residual = W T Wᵀ, W: (n, r_res) with the
        active (numerically nonzero) leading columns counted by ``w_k``.
      w_k: traced active residual rank; increments add ``w_k`` (or ``2·w_k``)
        columns to ``X``, keeping padded zero columns from eating capacity.
      X0: warm-start iterate (static capacity).  ``W0 T0 W0ᵀ`` must be the
        GALE residual *at* ``X0`` (adi.jl:44-47).
      shifts: complex shift buffer, consumed cyclically (conjugate pairs
        adjacent, as produced by `Shifts` strategies).
      abstol: absolute residual tolerance.

    Compression triggers on the reference's interval (adi.jl:111-113) and
    additionally whenever the next increment would overflow the static
    capacity — the compiled-mode substitute for the host driver's dynamic
    buffer growth.  If the *numerical* rank exceeds the capacity, excess is
    truncated (pick `X0.r` generously).

    Returns (X, W, iters, res_norm).
    """
    nshifts = shifts.shape[0]
    inner = cfg.inner_alg
    if inner is None:
        inner = default_inner_alg(
            shifted_operator(E, A, jnp.asarray(1.0, W0.dtype))
        )
    q = W0.shape[1]
    w_k = jnp.asarray(w_k, jnp.int32)
    cdtype = jnp.result_type(W0.dtype, jnp.complex64)

    def real_step(mu_c, W, T, X):
        mu = jnp.real(mu_c).astype(W.dtype)
        solver = prepare_shifted(E, A, mu, inner)
        V = solver.solve(W)
        incr = LowRank(L=V, D=(-2.0 * mu) * T, k=w_k)
        W_new = W - 2.0 * mu * E.tmm(V)
        X_new = lr_add(X, incr, r_out=X.r)
        return W_new, X_new, jnp.int32(1)

    def double_step(mu_c, W, T, X):
        solver = prepare_shifted(E, A, mu_c.astype(cdtype), inner)
        V = solver.solve(W.astype(cdtype))
        mur = jnp.real(mu_c).astype(W.dtype)
        delta = mur / jnp.imag(mu_c).astype(W.dtype)
        Vr, Vi = jnp.real(V).astype(W.dtype), jnp.imag(V).astype(W.dtype)
        s2 = math.sqrt(2.0)
        V1 = s2 * Vr + (s2 * delta) * Vi
        V2 = jnp.sqrt(2.0 * delta**2 + 2.0) * Vi
        # Interleave [V1 V2] so the active columns stay packed in front:
        # columns [0:w_k] of V1, then [0:w_k] of V2, via two masked adds.
        incr1 = LowRank(L=V1, D=(-2.0 * mur) * T, k=w_k)
        incr2 = LowRank(L=V2, D=(-2.0 * mur) * T, k=w_k)
        W_new = W - (2.0 * s2 * mur) * E.tmm(V1)
        X_new = lr_add(lr_add(X, incr1, r_out=X.r), incr2, r_out=X.r)
        return W_new, X_new, jnp.int32(2)

    def cond(state):
        X, W, i, ptr, since_comp, res = state
        return (i < cfg.maxiters) & (res > abstol)

    def body(state):
        X, W, i, ptr, since_comp, res = state
        # Compress on interval or imminent capacity overflow.
        do_comp = (since_comp >= cfg.compression_interval) | (
            X.k + 2 * w_k > X.r
        )
        X = jax.lax.cond(do_comp, lr_compress, lambda x: x, X)
        since_comp = jnp.where(do_comp, 0, since_comp)

        mu_c = shifts[ptr % nshifts]
        is_real = jnp.imag(mu_c) == 0.0
        W, X, used = jax.lax.cond(
            is_real,
            lambda args: real_step(*args),
            lambda args: double_step(*args),
            (mu_c, W, T0, X),
        )
        since_comp = since_comp + used
        res = _residual_norm(W, T0)
        return (X, W, i + used, ptr + used, since_comp, res)

    res0 = _residual_norm(W0, T0)
    state = (X0, W0, jnp.int32(0), jnp.int32(0), jnp.int32(0), res0)
    X, W, iters, _, since_comp, res = jax.lax.while_loop(cond, body, state)
    X = jax.lax.cond(since_comp > 0, lr_compress, lambda x: x, X)
    return X, W, iters, res


@partial(jax.jit, static_argnames=("cfg",))
def ros1_step_compiled(E, A, B, C, X: LowRank, tau, shifts, abstol,
                       cfg: CompiledConfig):
    """One full LRSIF Ros1 (implicit Euler) GDRE time step, end to end.

    Mirrors the host driver (`rosenbrock_lowrank.solve_gdre_lowrank_ros1`;
    reference lowrank_ros1.jl:35-60) but with everything — RHS assembly,
    compression, the ADI while-loop, the feedback update — in one jit.
    Returns (X_next, K_next, adi_iters, adi_residual_norm).
    """
    q = C.shape[0]
    L, D = X.L, X.D
    BtLD = (B.T @ L) @ D
    K = BtLD @ E.tmm(L).T

    # Closed-loop coefficient F = (A − E/(2τ)) − B K
    F = lr_update(lin_comb(A, -1.0 / (2.0 * tau), E), -1.0, B, K)

    # Right-hand side (lowrank_ros1.jl:42-44) ...
    G = jnp.concatenate([C.T, E.tmm(L)], axis=1)
    r = L.shape[1]
    S = jnp.zeros((q + r, q + r), G.dtype)
    S = S.at[:q, :q].set(jnp.eye(q, dtype=G.dtype))
    S = S.at[q:, q:].set(BtLD.T @ BtLD + D / tau)
    R = LowRank(L=G, D=S, k=jnp.minimum(q + X.k, q + r))

    # ... and the warm-start residual at X (adi.jl:44-47): the ADI drives
    # this to zero while accumulating increments on top of X.
    from .residuals import residual_gale_lowrank

    res0 = residual_gale_lowrank(E, F, R, X, r_out=cfg.r_res)
    W0 = _masked_cols(res0.L, res0.k)
    T0 = res0.D

    X_new, _, iters, res = adi_compiled(E, F, W0, T0, res0.k, X, shifts,
                                        abstol, cfg)

    L2, D2 = X_new.L, X_new.D
    BtLD2 = (B.T @ L2) @ D2
    K_new = BtLD2 @ E.tmm(L2).T
    return X_new, K_new, iters, res
