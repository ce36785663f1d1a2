"""Dense GALE solvers: matrix-sign-function (on device) and host oracle.

The reference's dense path leans on LAPACK kernels with no XLA equivalent:
generalized Schur `schur(F, E)` + quasi-triangular back-substitution
`lyapcs!` (dense_ros2.jl:38-47) and `MatrixEquations.lyapc`
(bartels-stewart.jl:3-11).  The TPU-native replacement is the **matrix sign
function** Newton iteration (Roberts 1980; Benner & Quintana-Ortí 1999):
solving

    AᵀXE + EᵀXA = −C

reduces via ``M = A E⁻¹``, ``C̃ = E⁻ᵀ C E⁻¹`` to ``MᵀX + XM = −C̃``, and with
the determinant-scaled iteration

    M_{k+1} = (M_k/c_k + c_k M_k⁻¹)/2,
    C_{k+1} = (C_k/c_k + c_k M_k⁻ᵀ C_k M_k⁻¹)/2,      c_k = |det M_k|^{1/n}

one gets ``X = −lim C_k / 2``.  Every iteration is an LU solve plus two
matmuls — pure MXU work, quadratically convergent.

For the multi-stage dense Rosenbrock schemes the reference computes **one**
Schur decomposition per time step and reuses it for every stage
(dense_ros2.jl:38, CHANGELOG.md:100).  The analog here is
`SignFunctionCache`: run the M-iteration once, store the inverse sequence,
then each stage right-hand side replays only the cheap C-updates.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..config import register_pytree_dataclass
from ..lowrank import LowRank
from ..ops.operators import as_operator


def _dense(X):
    return X.to_dense() if hasattr(X, "to_dense") else jnp.asarray(X)


@partial(jax.jit, static_argnames=("maxiters",))
def _sign_iteration(M: jax.Array, maxiters: int):
    """Determinant-scaled sign iteration; returns stacked inverses & scales.

    After convergence ``M ≈ −I`` (stable M), so further iterations are
    fixed points and the cached tail replays as no-ops — a fixed `maxiters`
    is safe and keeps shapes static.
    """
    n = M.shape[0]
    eye = jnp.eye(n, dtype=M.dtype)

    def body(Mk, _):
        sign, logdet = jnp.linalg.slogdet(Mk)
        c = jnp.exp(logdet / n)
        c = jnp.where(jnp.isfinite(c) & (c > 0), c, 1.0)
        lu, piv = jsl.lu_factor(Mk)
        Minv = jsl.lu_solve((lu, piv), eye)
        M_next = 0.5 * (Mk / c + c * Minv)
        return M_next, (Minv, c)

    M_final, (Minvs, cs) = jax.lax.scan(body, M, None, length=maxiters)
    return M_final, Minvs, cs


@partial(jax.jit, static_argnames=())
def _replay_rhs(Ctil: jax.Array, Minvs: jax.Array, cs: jax.Array) -> jax.Array:
    """Replay the C-update sequence for one right-hand side."""

    def body(Ck, inv_c):
        Minv, c = inv_c
        C_next = 0.5 * (Ck / c + c * (Minv.T @ Ck @ Minv))
        return C_next, None

    C_final, _ = jax.lax.scan(body, Ctil, (Minvs, cs))
    # Z₀ = [[M, 0], [C̃, −Mᵀ]] has sign [[−I, 0], [−2X̂, I]] with
    # MᵀX̂ + X̂M = C̃; our GALE reduces to MᵀX + XM = −C̃, so X = +C_∞/2.
    return 0.5 * C_final


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SignFunctionCache:
    """Factored pencil state reusable across stage solves (the analog of the
    reference's per-step Schur reuse, dense_ros2.jl:38)."""

    E_lu: jax.Array
    E_piv: jax.Array
    Minvs: jax.Array  # (maxiters, n, n)
    cs: jax.Array  # (maxiters,)

    def solve(self, C) -> jax.Array:
        """Solve ``AᵀXE + EᵀXA = −C`` for symmetric dense ``C``."""
        C = _dense(C)
        # C̃ = E⁻ᵀ C E⁻¹  via two triangular solve sweeps.
        EinvT_C = jsl.lu_solve((self.E_lu, self.E_piv), C, trans=1)
        Ctil = jsl.lu_solve((self.E_lu, self.E_piv), EinvT_C.T, trans=1).T
        X = _replay_rhs(Ctil, self.Minvs, self.cs)
        return 0.5 * (X + X.T)


def sign_function_cache(E, A, maxiters: int = 40) -> SignFunctionCache:
    E = _dense(as_operator(E).to_dense())
    A = _dense(as_operator(A).to_dense())
    E_lu, E_piv = jsl.lu_factor(E)
    # M = A E⁻¹  ⇔  Mᵀ = E⁻ᵀ Aᵀ
    Mt = jsl.lu_solve((E_lu, E_piv), A.T, trans=1)
    M = Mt.T
    _, Minvs, cs = _sign_iteration(M, maxiters)
    return SignFunctionCache(E_lu=E_lu, E_piv=E_piv, Minvs=Minvs, cs=cs)


def solve_gale_dense(E, A, C, maxiters: int = 40) -> jax.Array:
    """One-shot dense GALE solve on device (BartelsStewart analog)."""
    return sign_function_cache(E, A, maxiters).solve(C)


# --- host oracle (SciPy) ------------------------------------------------------


def solve_gale_host(E, A, C) -> jax.Array:
    """GALE solve on the host CPU via SciPy — correctness oracle, mirroring
    the role of `MatrixEquations.lyapc` in the reference tests."""
    import scipy.linalg

    En = np.asarray(_dense(as_operator(E).to_dense()))
    An = np.asarray(_dense(as_operator(A).to_dense()))
    Cn = np.asarray(_dense(C))
    M = np.linalg.solve(En.T, An.T).T  # A E⁻¹
    Ctil = np.linalg.solve(En.T, np.linalg.solve(En.T, Cn).T).T
    # Mᵀ X + X M = −C̃  ⇔  a Y + Y aᴴ = q with a = Mᵀ, q = −C̃
    X = scipy.linalg.solve_continuous_lyapunov(M.T, -Ctil)
    return jnp.asarray(0.5 * (X + X.T))


# --- Kronecker (testing only, kronecker.jl:5-14) ------------------------------


@jax.jit
def solve_gale_kronecker(Ed: jax.Array, Ad: jax.Array, Cd: jax.Array):
    """Direct n²×n² Kronecker solve of ``AᵀXE + EᵀXA = −C``."""
    n = Ed.shape[0]
    # vec_c(AᵀXE) = (Eᵀ ⊗ Aᵀ) vec_c(X); emulate column-major vec with
    # transposed reshapes.
    K = jnp.kron(Ed.T, Ad.T) + jnp.kron(Ad.T, Ed.T)
    b = -Cd.T.reshape(-1)
    x = jnp.linalg.solve(K, b)
    X = x.reshape(n, n).T
    return 0.5 * (X + X.T)
