"""Low-rank ADI for generalized algebraic Lyapunov equations (L4).

TPU-native re-design of the reference ADI (src/lyapunov/adi.jl).  The math is
identical — one shifted solve ``(Aᵀ + μEᵀ)V = W`` per iteration, in-place
residual-factor update, real recombination of complex double-steps — but the
execution model diverges where XLA forces it:

* All per-iteration linear algebra is jitted with **static shapes**: the
  residual factor ``W`` has a fixed column count ``q`` chosen (bucketed)
  from the numerical rank of the initial residual, and the iterate ``X``
  lives in a padded `LowRank` buffer that is grown geometrically on the
  host when needed.
* The iteration itself is host-orchestrated (one device sync per step for
  the convergence check — negligible next to the shifted solve), which
  keeps observers/callbacks and self-generating shifts natural.  A fully
  jitted `lax.while_loop` variant for compiled end-to-end stepping lives in
  `models.compiled`.
* Shifted solves route through dense LU / Sherman–Morrison–Woodbury /
  block-sparse Krylov depending on the operator (see `ops.shifted`).

Reference correspondence: init (adi.jl:29-69), step (adi.jl:97-128), real
single step (adi.jl:149-179), complex double step (adi.jl:181-225),
convergence and collapse detection (adi.jl:130-141).
"""

from __future__ import annotations

import math
import warnings
from functools import partial

import jax
import jax.numpy as jnp

from ..lowrank import (
    LowRank,
    lowrank,
    lr_add,
    lr_compress,
    lr_norm,
    lr_slice_active,
    lr_with_capacity,
    lr_zero,
    round_up,
)
from ..utils.callbacks import notify
from ..utils.timers import timeit
from ..ops.blocklinear import Backslash, SMWSolver, prepare
from ..ops.operators import DenseOp, LowRankUpdateOp
from ..ops.shifted import prepare_shifted
from .problems import ADI, GALEProblem
from .residuals import residual_gale_lowrank
from .shifts import init_shifts


@jax.jit
def _step_real(E, solver, mu, W, T, X):
    """One real ADI step: V, updated residual factor, updated iterate.

    ``V = (Aᵀ + μEᵀ)⁻¹ W``; ``X += −2μ · V T Vᵀ``; ``W ← W − 2μ EᵀV``
    (adi.jl:149-179).  ``solver`` is the prepared (possibly cached)
    factorization of the shifted coefficient.
    """
    V = solver.solve(W)
    q = W.shape[1]
    incr = LowRank(L=V, D=(-2.0 * mu) * T, k=jnp.int32(q))
    W_new = W - 2.0 * mu * E.tmm(V)
    X_new = lr_add(X, incr, r_out=X.r)
    return V, W_new, X_new


@jax.jit
def _step_double(E, solver, mu, W, T, X):
    """Complex double step for a conjugate shift pair with a single complex
    solve and real recombination V₁, V₂ (adi.jl:181-225)."""
    V = solver.solve(W.astype(jnp.result_type(W.dtype, mu.dtype)))
    mur = jnp.real(mu)
    delta = mur / jnp.imag(mu)
    Vr = jnp.real(V)
    Vi = jnp.imag(V)
    sqrt2 = math.sqrt(2.0)
    V1 = sqrt2 * Vr + (sqrt2 * delta) * Vi
    V2 = jnp.sqrt(2.0 * delta**2 + 2.0) * Vi
    q = W.shape[1]
    Lr = jnp.concatenate([V1, V2], axis=1)
    D2 = jnp.zeros((2 * q, 2 * q), W.dtype)
    D2 = D2.at[:q, :q].set((-2.0 * mur) * T)
    D2 = D2.at[q:, q:].set((-2.0 * mur) * T)
    incr = LowRank(L=Lr, D=D2, k=jnp.int32(2 * q))
    W_new = W - (2.0 * sqrt2 * mur) * E.tmm(V1)
    X_new = lr_add(X, incr, r_out=X.r)
    return V1, V2, W_new, X_new


@jax.jit
def _residual_norm(W, T):
    """‖W T Wᵀ‖_F via the Gram form of the Benner–Li–Penzl trick
    (LDLt.jl:77-89): ``tr((T·WᵀW)²)`` — no tall QR (see `lr_norm`)."""
    TM = T @ (W.T @ W)
    return jnp.sqrt(jnp.maximum(jnp.trace(TM @ TM), 0.0))


class ADISolver:
    """Resumable ADI solver object: `init`/`step`/`solve` (adi.jl:91-95)."""

    def __init__(self, prob: GALEProblem, alg: ADI, *, initial_guess=None,
                 initial_residual=None, abstol=None, observer=None,
                 shift_cache=None):
        self.prob = prob
        self.alg = alg
        self.observer = observer
        self.shift_cache = shift_cache
        self._solver_cache: dict = {}  # per-solve: shift -> prepared solver
        notify(observer, "gale_start", prob, alg)

        E, A, C = prob.E, prob.A, prob.C
        n = prob.n
        dtype = C.dtype

        if alg.ignore_initial_guess or initial_guess is None:
            initial_guess = None

        # Work on active-rank slices: wide assemblies below must scale with
        # numerical rank, not storage capacity.
        C_s = lr_slice_active(C)
        if initial_guess is not None:
            initial_guess = lr_slice_active(lr_compress(initial_guess))

        # Initial residual (adi.jl:40-47): for a zero/absent guess the
        # residual *is* the right-hand side.
        if initial_residual is None:
            if initial_guess is None:
                initial_residual = C_s
            else:
                initial_residual = residual_gale_lowrank(E, A, C_s,
                                                         initial_guess)
        res = initial_residual

        # Freeze the static residual width from the numerical rank.
        k_res = max(int(res.k), 1)
        self.q = q = round_up(k_res, 4)
        W = res.L[:, :q]
        T = res.D[:q, :q]
        self.W = W
        self.T = T

        # Iterate buffer: warm start or rank-0 (adi.jl:40-42).  Capacity
        # covers the growth between compressions; `_ensure_capacity` extends
        # on demand (one recompile per new bucket).
        k0 = initial_guess.r if initial_guess is not None else 0
        cap = alg.capacity or round_up(
            k0 + (alg.compression_interval + 2) * q, 32
        )
        if initial_guess is None:
            X = lr_zero(n, cap, dtype)
        else:
            X = lr_with_capacity(initial_guess, max(cap, k0))
        self.X = X

        self.residual_norm = float(_residual_norm(W, T))

        # Shift oracle (adi.jl:53-58).
        self.oracle = init_shifts(alg.shifts, prob)
        self.oracle.update(self.X, self.W)
        self.shifts: list = []

        # Tolerances (adi.jl:61-62).
        reltol = alg.reltol if alg.reltol is not None else n * float(jnp.finfo(dtype).eps)
        if abstol is not None:
            self.abstol = float(abstol)
        elif alg.abstol is not None:
            self.abstol = float(alg.abstol)
        else:
            self.abstol = reltol * float(lr_norm(C_s))

        self.inner_alg = alg.inner_alg
        self.last_compression = 0
        self._collapsed = False
        notify(observer, "gale_step", 0, self.X, res, self.residual_norm)

    # -- capacity management (host-side; replaces dynamic rank growth) -------

    def _ensure_capacity(self, incoming: int) -> None:
        need = int(self.X.k) + incoming
        if need > self.X.r:
            new_cap = round_up(
                need + 2 * self.q * (self.alg.compression_interval + 1), 32
            )
            self.X = lr_with_capacity(self.X, new_cap)

    # -- iteration ------------------------------------------------------------

    @property
    def iters(self) -> int:
        return len(self.shifts)

    def _solver_for(self, mu: complex):
        """Prepared solver for ``(Aᵀ + μEᵀ)``, with two cache levels: the
        per-solve cache (shifts repeat within a cyclic sweep) and the
        cross-solve `ShiftedSolveCache` of factored cores (see
        ops/shifted.py)."""
        key = complex(mu)
        s = self._solver_cache.get(key)
        if s is not None:
            return s
        E, A = self.prob.E, self.prob.A
        dtype = self.W.dtype
        mu_val = (jnp.asarray(mu.real, dtype) if mu.imag == 0.0
                  else jnp.asarray(mu, jnp.result_type(dtype, jnp.complex64)))
        cache = self.shift_cache
        if self.inner_alg is not None or cache is None:
            s = prepare_shifted(E, A, mu_val, self.inner_alg)
        elif (isinstance(A, LowRankUpdateOp) and isinstance(A.A, DenseOp)
              and isinstance(E, DenseOp)):
            # Cached core LU + fresh SMW correction for the feedback term.
            core = cache.core_solver(
                key,
                lambda: prepare(DenseOp(A.A.M.T.astype(mu_val.dtype)
                                        + mu_val * E.M.T), Backslash()),
            )
            U = A.V.T.astype(mu_val.dtype)  # (n, m) of the transposed update
            Vt = A.U.T.astype(mu_val.dtype)  # (m, n)
            AinvU = core.solve(U)
            m = U.shape[1]
            S = (jnp.asarray(A.alpha, mu_val.dtype) * jnp.eye(m, dtype=mu_val.dtype)
                 + Vt @ AinvU)
            s = SMWSolver(base=core, AinvU=AinvU, V=Vt,
                          schur=prepare(DenseOp(S), Backslash()))
        elif isinstance(A, DenseOp) and isinstance(E, DenseOp):
            s = cache.core_solver(
                key, lambda: prepare_shifted(E, A, mu_val, None)
            )
        else:
            s = prepare_shifted(E, A, mu_val, None)
        self._solver_cache[key] = s
        return s

    def step(self) -> None:
        alg, E = self.alg, self.prob.E
        with timeit("adi.shifts"):
            mu = self.oracle.take()
        notify(self.observer, "gale_metadata", "ADI shifts", mu)
        if mu.imag == 0.0:
            self.shifts.append(mu)
            self._ensure_capacity(self.q)
            with timeit("adi.prepare_shifted"):
                solver = self._solver_for(mu)
            m = jnp.asarray(mu.real, self.W.dtype)
            with timeit("adi.shifted_solve"):
                V, self.W, self.X = _step_real(E, solver, m, self.W, self.T,
                                               self.X)
            self.last_compression += 1
            with timeit("adi.shifts"):
                self.oracle.update(self.X, self.W, V)
            collapse = not bool(jnp.any(V != 0))
        else:
            with timeit("adi.shifts"):
                mu2 = self.oracle.take()
            notify(self.observer, "gale_metadata", "ADI shifts", mu2)
            assert abs(mu2 - mu.conjugate()) <= 1e-8 * abs(mu), \
                "complex shifts must come in conjugate pairs"
            self.shifts.extend((mu, mu2))
            self._ensure_capacity(2 * self.q)
            with timeit("adi.prepare_shifted"):
                solver = self._solver_for(mu)
            m = jnp.asarray(mu, jnp.result_type(self.W.dtype, jnp.complex64))
            with timeit("adi.shifted_solve"):
                V1, V2, self.W, self.X = _step_double(E, solver, m, self.W,
                                                      self.T, self.X)
            self.last_compression += 2
            with timeit("adi.shifts"):
                self.oracle.update(self.X, self.W, V1, V2)
            collapse = not (bool(jnp.any(V1 != 0)) or bool(jnp.any(V2 != 0)))

        self._collapsed = collapse  # iteration collapse (adi.jl:134-137)

        if alg.compression and self.last_compression >= alg.compression_interval:
            self.compress()

        with timeit("adi.residual_norm"):
            self.residual_norm = float(_residual_norm(self.W, self.T))
        notify(self.observer, "gale_step", self.iters, self.X,
               self.residual_lowrank(), self.residual_norm)

        if self.residual_norm <= self.abstol:
            return
        if self.iters >= alg.maxiters:
            notify(self.observer, "gale_failed")
            if alg.warn_convergence:
                warnings.warn(
                    f"ADI did not converge: residual={self.residual_norm:g} "
                    f"abstol={self.abstol:g} maxiters={alg.maxiters}"
                )

    def compress(self) -> None:
        with timeit("adi.compress"):
            self.X = lr_compress(self.X)
        self.last_compression = 0

    def residual_lowrank(self) -> LowRank:
        return lowrank(self.W, self.T)

    @property
    def done(self) -> bool:
        if self.residual_norm <= self.abstol:
            return True
        if self.iters > 0 and self._collapsed:
            return True
        return self.iters >= self.alg.maxiters

    def solve(self) -> LowRank:
        while not self.done:
            self.step()
        if self.alg.compression and self.last_compression > 0:
            self.compress()
        notify(self.observer, "gale_done", self.iters, self.X,
               self.residual_lowrank(), self.residual_norm)
        return self.X


def solve_gale_adi(prob: GALEProblem, alg: ADI, **kw) -> LowRank:
    return ADISolver(prob, alg, **kw).solve()
