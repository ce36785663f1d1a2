"""ADI shift parameter strategies (L3).

Re-design of the reference's `Shifts` module (src/Shifts.jl, src/shifts/*):

* `Projection(u)`  — self-generating Galerkin shifts from the last `u`
  increment factors (Benner–Kürschner–Saak 2014; shifts/projection.jl).
* `Heuristic(nshifts, kp, km)` — Penzl's heuristic sub-optimal shifts via
  Arnoldi Ritz values of E⁻¹A and A⁻¹E (Penzl 1999 Alg 5.1;
  shifts/heuristic.jl).
* `Cyclic(inner_or_values)`, `Wrapped(func, inner)` — combinators
  (shifts/helpers.jl:19-58).

Device/host split: subspace assembly, orthonormalization and Galerkin
projection run jitted on device; the tiny (k ≤ ~40) *nonsymmetric
generalized* eigenproblem has no XLA kernel and is evaluated on host — the
same CPU hop the reference makes explicitly via `adapt(Matrix, ·)`
(projection.jl:64-67).  Strategy configs are frozen/hashable; runtime state
lives in small host-side oracle objects driven by the reference's protocol
`init / update! / take!` (Shifts.jl:80-116).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..config import default_dtype
from ..ops.operators import as_operator, restrict
from ..ops.blocklinear import prepare
from ..ops.shifted import default_inner_alg


# --- strategy configs ---------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Projection:
    n_history: int = 2

    def __post_init__(self):
        if self.n_history % 2 != 0:
            # ADI double-steps contribute factor pairs (projection.jl:28-31)
            raise ValueError(f"History must be even; got {self.n_history}")


@dataclasses.dataclass(frozen=True)
class Heuristic:
    nshifts: int
    kp: int  # Arnoldi steps w.r.t. E⁻¹A
    km: int  # Arnoldi steps w.r.t. A⁻¹E
    alg_E: object = None  # default: routed by operator kind (dense LU / Krylov)
    alg_A: object = None


@dataclasses.dataclass(frozen=True)
class Cyclic:
    """Cycle through precomputed values or one batch of the inner strategy."""

    inner: object  # Strategy or sequence of shift values


@dataclasses.dataclass(frozen=True)
class Wrapped:
    """Apply `func` to every batch produced by the inner strategy."""

    func: object
    inner: object


# --- helpers (shifts/helpers.jl) ---------------------------------------------


def safe_sort(shifts: np.ndarray) -> np.ndarray:
    """Sort keeping complex-conjugate pairs adjacent (helpers.jl:122)."""
    return np.array(sorted(shifts, key=lambda v: (v.real, abs(v.imag))))


def is_stable(v) -> np.ndarray:
    return np.real(v) < 0


def flip(v: np.ndarray) -> np.ndarray:
    return -np.real(v) + 1j * np.imag(v)


def stabilize_ritz_values(lam: np.ndarray, desc: str) -> np.ndarray:
    """Discard unstable Ritz values; flip all if none stable
    (helpers.jl:129-140)."""
    assert len(lam) > 0
    unstable = ~is_stable(lam)
    n_unstable = int(np.sum(unstable))
    if 0 < n_unstable < len(lam):
        warnings.warn(f"Discarding unstable Ritz values of {desc}")
        lam = lam[is_stable(lam)]
    elif n_unstable == len(lam):
        warnings.warn(
            f"All Ritz values of {desc} are unstable; flipping along imaginary axis"
        )
        lam = flip(lam)
    return lam


@jax.jit
def _orth(N: jax.Array):
    """SVD-based orthonormal basis with singular values (rank cut on host).

    Analog of `orth` (Stuff.jl:13-18); SVD replaces pivoted QR exactly as the
    reference's own GPU configuration does (test/cuda.jl:32-37).
    """
    U, s, _ = jnp.linalg.svd(N, full_matrices=False)
    return U, s


def orth(N) -> jax.Array:
    U, s = _orth(jnp.asarray(N))
    s = np.asarray(s)
    smax = s[0] if len(s) else 0.0
    cut = N.shape[0] * np.finfo(np.asarray(U).dtype).eps * max(smax, 1.0)
    k = int(np.sum(s > cut))
    return U[:, :k]


# --- oracle protocol ----------------------------------------------------------


class ShiftOracle:
    """Runtime shift generator: `update` is cheap, `take` may be expensive
    (Shifts.jl:88-116)."""

    def update(self, X, W, *Vs) -> None:  # noqa: D401
        pass

    def take(self) -> complex:
        raise NotImplementedError

    def take_many(self) -> list:
        raise NotImplementedError


class BufferedOracle(ShiftOracle):
    """Buffer batches from `take_many`, pop one-by-one (helpers.jl:70-113)."""

    def __init__(self):
        self._buffer: list = []

    def take(self) -> complex:
        if not self._buffer:
            self._buffer = list(self.take_many())
        return complex(self._buffer.pop(0))


class CyclicOracle(ShiftOracle):
    def __init__(self, values):
        self._values = [complex(v) for v in values]
        self._i = 0

    def take(self) -> complex:
        v = self._values[self._i % len(self._values)]
        self._i += 1
        return v

    def take_many(self) -> list:
        return list(self._values)


class WrappedOracle(BufferedOracle):
    def __init__(self, func, inner: ShiftOracle):
        super().__init__()
        self.func = func
        self.inner = inner

    def update(self, X, W, *Vs) -> None:
        self.inner.update(X, W, *Vs)

    def take_many(self) -> list:
        return list(self.func(self.inner.take_many()))


class ProjectionOracle(BufferedOracle):
    """Galerkin-projection shifts (shifts/projection.jl:38-72)."""

    def __init__(self, E, A, n_history: int):
        super().__init__()
        self.E = E
        self.A = A
        self.n_history = n_history
        self.Vs: list = []

    def update(self, X, W, *Vs) -> None:
        # On the initial update (no increments yet), seed with the residual
        # factor (projection.jl:45-52).
        if not Vs:
            self.Vs.append(W)
        self.Vs.extend(Vs)
        self.Vs = self.Vs[-self.n_history:]

    def take_many(self) -> list:
        N = jnp.concatenate([jnp.asarray(V) for V in self.Vs], axis=1)
        Q = orth(N)
        Et = np.asarray(restrict(self.E, Q))
        At = np.asarray(restrict(self.A, Q))
        lam = scipy.linalg.eig(At, Et, right=False)
        lam = stabilize_ritz_values(lam, "(A, E)")
        lam = safe_sort(lam)
        # Prune spurious (infinite/NaN) generalized eigenvalues.
        lam = lam[np.isfinite(lam)]
        if len(lam) == 0:
            raise RuntimeError("projection shifts: no finite stable Ritz values")
        return list(lam)


# --- Penzl heuristic (shifts/heuristic.jl) ------------------------------------


def _arnoldi_ritz(matvec, n: int, k: int, dtype, desc: str) -> np.ndarray:
    """k-step Arnoldi from the all-ones start vector, with repeated MGS;
    Ritz values of the Hessenberg matrix (heuristic.jl:103-130)."""
    H = np.zeros((k + 1, k))
    b0 = jnp.ones((n,), dtype)
    V = [b0 / jnp.linalg.norm(b0)]
    for j in range(k):
        w = matvec(V[j])
        for _ in range(2):  # repeated MGS
            for i in range(j + 1):
                g = jnp.vdot(V[i], w)
                H[i, j] += float(g)
                w = w - V[i] * g
        beta = float(jnp.linalg.norm(w))
        H[j + 1, j] = beta
        if beta == 0.0:
            k = j + 1
            H = H[: k + 1, :k]
            break
        V.append(w / beta)
    ritz = np.linalg.eigvals(H[:k, :k])
    return stabilize_ritz_values(ritz, desc)


def heuristic(R: np.ndarray, nshifts: int) -> list:
    """Penzl's greedy min-max selection over the Ritz value set
    (heuristic.jl:82-101)."""
    R = np.asarray(R)

    def s(t, P):
        return np.prod([abs(t - p) / abs(t + p) for p in P])

    # p minimizing the max of s(t, {p}) over t in R:
    best, best_val = None, np.inf
    for p in R:
        val = max(s(t, (p,)) for t in R)
        if val < best_val:
            best, best_val = p, val
    P = [best] if np.isreal(best) else [best, np.conj(best)]
    while len(P) < nshifts:
        # t maximizing s(t, P):
        best, best_val = None, -np.inf
        for t in R:
            val = s(t, P)
            if val > best_val:
                best, best_val = t, val
        if np.isreal(best):
            P.append(best)
        else:
            P.extend((best, np.conj(best)))
    return [complex(v) for v in P]


def _heuristic_shifts(strategy: Heuristic, E, A) -> list:
    E = as_operator(E)
    A = as_operator(A)
    n = E.shape[0]
    dtype = default_dtype()
    alg_E = strategy.alg_E if strategy.alg_E is not None else default_inner_alg(E)
    alg_A = strategy.alg_A if strategy.alg_A is not None else default_inner_alg(A)
    solver_E = prepare(E, alg_E)
    Rp = _arnoldi_ritz(lambda x: solver_E.solve(A.mm(x)), n, strategy.kp,
                       dtype, "E⁻¹A")
    solver_A = prepare(A, alg_A)
    Rm = _arnoldi_ritz(lambda x: solver_A.solve(E.mm(x)), n, strategy.km,
                       dtype, "A⁻¹E")
    R = np.concatenate([Rp, 1.0 / Rm])
    return heuristic(R, strategy.nshifts)


def heuristic_shifts_host(E_sparse, A_sparse, nshifts: int, kp: int, km: int,
                          B=None, K=None, lu_cache: dict = None,
                          warm_start: bool = False):
    """Penzl heuristic shifts computed entirely on the host with SciPy
    sparse LU — setup-time helper for compiled/TPU sweeps where the
    device-orchestrated Arnoldi would cost one tunnel round trip per step.
    Same algorithm as `Heuristic` (Penzl 1999 Alg 5.1).

    With ``B``/``K`` given, the Ritz values are those of the **closed-loop**
    pencil ``(E, A − BK)`` — the operator each Kleinman–Newton step's GALE
    actually carries (the reference re-inits its shift strategy per inner
    solve, newton.jl:136-142 → Shifts.init).  ``F⁻¹E`` products use the SMW
    identity around the sparse LU of ``A`` (one extra m×m dense solve).

    ``lu_cache``: optional dict reused across calls with the same pencil
    (Newton shift rebuilds): the open-loop LUs of ``E``/``A`` are constant
    — only the SMW correction depends on ``K`` — so rebuilds skip the two
    `splu` factorizations.

    ``warm_start``: start each Arnoldi from the previous call's dominant
    Ritz vector (stored in ``lu_cache``) instead of the all-ones vector —
    the closed-loop Ritz data moves smoothly with ``K`` across Newton
    rebuilds, so a restarted subspace recovers the extremal values at
    reduced depth (pass smaller ``kp``/``km``).  Falls back to all-ones
    when no previous vector is cached."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    # f64 on the host regardless of the device dtype: shift quality gates
    # ADI convergence and the host hop is setup-scale anyway.
    E = sp.csc_matrix(E_sparse).astype(np.float64)
    A = sp.csc_matrix(A_sparse).astype(np.float64)
    n = E.shape[0]
    if K is not None:
        B = np.asarray(B, np.float64)
        K = np.asarray(K, np.float64)

    def arnoldi(matvec, k, desc, cache_key):
        H = np.zeros((k + 1, k))
        b0 = None
        if warm_start and lu_cache is not None:
            b0 = lu_cache.get(cache_key)
        if b0 is None:
            b0 = np.ones(n)
        V = [b0 / np.linalg.norm(b0)]
        for j in range(k):
            w = matvec(V[j])
            for _ in range(2):
                for i in range(j + 1):
                    g = V[i] @ w
                    H[i, j] += g
                    w = w - g * V[i]
            beta = np.linalg.norm(w)
            H[j + 1, j] = beta
            if beta == 0:
                k = j + 1
                H = H[: k + 1, :k]
                break
            V.append(w / beta)
        ritz, vecs = np.linalg.eig(H[:k, :k])
        if lu_cache is not None:
            # Dominant Ritz vector lifted to R^n — the warm start for the
            # next rebuild's restarted Arnoldi.
            dom = int(np.argmax(np.abs(ritz)))
            y = np.real(np.column_stack(V[:k]) @ vecs[:, dom])
            ny = np.linalg.norm(y)
            if np.isfinite(ny) and ny > 0:
                lu_cache[cache_key] = y / ny
        return stabilize_ritz_values(ritz, desc)

    if lu_cache is not None and "luE" in lu_cache:
        luE, luA = lu_cache["luE"], lu_cache["luA"]
    else:
        luE = spla.splu(E)
        luA = spla.splu(A)
        if lu_cache is not None:
            lu_cache["luE"], lu_cache["luA"] = luE, luA
    if K is None:
        fwd = lambda x: luE.solve(A @ x)
        bwd = lambda x: luA.solve(E @ x)
        descs = ("E⁻¹A", "A⁻¹E")
    else:
        # F = A − BK; F⁻¹ = A⁻¹ + A⁻¹B (I − K A⁻¹B)⁻¹ K A⁻¹  (SMW)
        AinvB = luA.solve(B)
        Sinv = np.linalg.inv(np.eye(B.shape[1]) - K @ AinvB)

        def fwd(x):
            return luE.solve(A @ x - B @ (K @ x))

        def bwd(x):
            y = luA.solve(E @ x)
            return y + AinvB @ (Sinv @ (K @ y))

        descs = ("E⁻¹F", "F⁻¹E")
    Rp = arnoldi(fwd, kp, descs[0], "warm_fwd")
    Rm = arnoldi(bwd, km, descs[1], "warm_bwd")
    R = np.concatenate([Rp, 1.0 / Rm])
    return heuristic(R, nshifts)


class HeuristicOracle(BufferedOracle):
    def __init__(self, shifts):
        super().__init__()
        self._shifts = list(shifts)

    def take_many(self) -> list:
        return list(self._shifts)


# --- init dispatch (Shifts.init) ----------------------------------------------


def init_shifts(strategy, prob) -> ShiftOracle:
    """`Shifts.init(strategy, prob) -> oracle` (Shifts.jl:80-86)."""
    if isinstance(strategy, Projection):
        return ProjectionOracle(prob.E, prob.A, strategy.n_history)
    if isinstance(strategy, Heuristic):
        return HeuristicOracle(_heuristic_shifts(strategy, prob.E, prob.A))
    if isinstance(strategy, Cyclic):
        inner = strategy.inner
        if isinstance(inner, (Projection, Heuristic, Cyclic, Wrapped)):
            return CyclicOracle(init_shifts(inner, prob).take_many())
        return CyclicOracle(inner)  # precomputed values
    if isinstance(strategy, Wrapped):
        return WrappedOracle(strategy.func, init_shifts(strategy.inner, prob))
    if isinstance(strategy, ShiftOracle):
        return strategy  # pre-initialized (GMRES `specialize`, gmres.jl:122-134)
    raise TypeError(f"unknown shift strategy {strategy!r}")
