"""Benchmark/test problem generators.

The reference benchmarks against the Oberwolfach SteelProfile ("Rail")
matrices fetched from MORWiki at runtime (test/rail.jl:15,
benchmark/benchmarks.jl:44).  This environment has no network egress, so we
generate *structurally matched surrogates*: 2D heat-equation FEM/FD pencils
``(E, A)`` with E symmetric positive definite (mass-like, banded), A
symmetric negative definite (stiffness-like, 5-point stencil), and low-rank
``B`` (m=7 inputs) / ``C`` (q=6 outputs) like the Rail systems.  Same
sparsity structure class, same definiteness, same solver behavior — used at
the reference's sizes n ∈ {371, 1357, 5177, 79841}.

Also: random sparse-ish SPD/stable pencils mirroring test/tiny_random.jl.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..config import default_dtype

import jax.numpy as jnp


def _rng(seed):
    return np.random.default_rng(seed)


# --- tiny_random analog (test/tiny_random.jl:62-105) --------------------------


def random_pencil(n: int = 50, *, symmetric_E=True, symmetric_A=True, seed=0):
    """Random sparse-ish pencil: E ≻ 0 (or spectrum in right half plane),
    A stable.  Returned dense (float64 numpy)."""
    rng = _rng(seed)

    def sprand(density):
        M = np.zeros((n, n))
        nnz = int(density * n * n)
        idx = rng.integers(0, n, size=(2, nnz))
        M[idx[0], idx[1]] = rng.random(nnz)
        return M

    E = sprand(1.0 / n)
    if symmetric_E:
        E = E + E.T + n * np.eye(n)
    else:
        E = E + n * np.eye(n)
    A = sprand(1.0 / n)
    if symmetric_A:
        A = A + A.T - n * np.eye(n)
    else:
        A = A - n * np.eye(n)
    return E, A


def random_rhs_lowrank(n: int, g: int = 4, seed=1):
    """RHS ``C = −2·lowrank(G, −I)`` = 2·G Gᵀ ≥ 0 (test/tiny_random.jl:14-17)."""
    rng = _rng(seed)
    G = rng.random((n, g))
    S = 2.0 * np.eye(g)
    return G, S


# --- Rail surrogate -----------------------------------------------------------


def _grid_shape(n: int):
    nx = int(np.sqrt(n))
    ny = -(-n // nx)
    return nx, ny


def rail_surrogate(n: int, *, m: int = 7, q: int = 6, seed=0):
    """2D heat-equation surrogate of SteelProfile(n) as scipy.sparse CSR.

    Returns (E, A, B, C): E SPD banded mass matrix, A SND 5-point stencil
    stiffness with Robin-like boundary absorption, B (n, m), C (q, n).
    """
    rng = _rng(seed)
    nx, ny = _grid_shape(n)
    total = nx * ny

    # 5-point Laplacian on the nx × ny grid, truncated to exactly n nodes.
    ex = np.ones(nx)
    ey = np.ones(ny)
    Tx = sp.diags([ex[:-1], -2 * ex, ex[:-1]], [-1, 0, 1])
    Ty = sp.diags([ey[:-1], -2 * ey, ey[:-1]], [-1, 0, 1])
    lap = sp.kronsum(Tx, Ty, format="csr")  # (total, total), entries ~ −4..1
    lap = lap[:n, :n]

    # Rail's FEM stiffness entries are O(1) (conductivity scaling absorbs
    # the 1/h² mesh factor); keep the unscaled stencil to match that regime.
    A = lap - 0.05 * sp.eye(n)  # absorption keeps A ≺ 0
    A = A.tocsr()

    # Mass-like E: strictly diagonally dominant, same pattern family.
    diag_w = 4.0 + rng.random(n)
    off = sp.diags([np.ones(n - 1), np.ones(n - 1)], [-1, 1])
    E = (sp.diags(diag_w) + 0.5 * off).tocsr()
    E = (0.5 * (E + E.T)).tocsr()

    # Smooth low-rank input/output maps touching boundary strips (Rail-like).
    B = np.zeros((n, m))
    for j in range(m):
        center = (j + 1) * n // (m + 1)
        width = max(2, n // (3 * m))
        idx = np.arange(max(0, center - width), min(n, center + width))
        B[idx, j] = np.exp(-0.5 * ((idx - center) / max(1.0, width / 2)) ** 2)
    C = np.zeros((q, n))
    for i in range(q):
        center = (2 * i + 1) * n // (2 * q)
        width = max(2, n // (3 * q))
        idx = np.arange(max(0, center - width), min(n, center + width))
        C[i, idx] = 1.0 / len(idx)
    return E, A, B, C


def conv_diff_surrogate(n: int, *, m: int = 7, q: int = 6, peclet: float = 2.0,
                        wind=(1.0, 0.4), seed=0):
    """2D convection–diffusion surrogate: **nonsymmetric** stable ``A``.

    ``A = Δ/h² − w·∇_upwind/h − 0.05·I`` with the wind speed set so the mesh
    Péclet number is ``peclet`` (> 1 ⇒ genuinely complex spectrum: Penzl and
    projection shifts come in conjugate pairs, exercising the ADI double
    step at any n — the scale analog of the reference's nonsymmetric E×A
    grid, test/tiny_random.jl:20-47).  ``E`` is the same SPD mass-like
    matrix as `rail_surrogate`.  Returns scipy CSR (E, A) and dense (B, C).
    """
    rng = _rng(seed)
    nx, ny = _grid_shape(n)
    h = 1.0 / (nx + 1)

    ex = np.ones(nx)
    ey = np.ones(ny)
    Tx = sp.diags([ex[:-1], -2 * ex, ex[:-1]], [-1, 0, 1])
    Ty = sp.diags([ey[:-1], -2 * ey, ey[:-1]], [-1, 0, 1])
    lap = sp.kronsum(Tx, Ty, format="csr") / (h * h)

    # Upwind first-order differences: D = (I − S₋)/h (for wind > 0).
    Dx = (sp.eye(nx) - sp.eye(nx, k=-1)) / h
    Dy = (sp.eye(ny) - sp.eye(ny, k=-1)) / h
    # kronsum(Tx, Ty) = kron(I_ny, Tx) + kron(Ty, I_nx): x varies fastest.
    conv = sp.kron(sp.eye(ny), Dx) * wind[0] + sp.kron(Dy, sp.eye(nx)) * wind[1]
    # Scale the wind so w·h/2 = peclet (mesh Péclet number).
    wscale = 2.0 * peclet / h / max(abs(wind[0]), abs(wind[1]))
    A = (lap - wscale * conv.tocsr())[:n, :n] - 0.05 * sp.eye(n)
    A = A.tocsr()

    diag_w = 4.0 + rng.random(n)
    off = sp.diags([np.ones(n - 1), np.ones(n - 1)], [-1, 1])
    E = (sp.diags(diag_w) + 0.5 * off).tocsr()
    E = (0.5 * (E + E.T)).tocsr()

    _, _, B, C = rail_surrogate(n, m=m, q=q, seed=seed)
    return E, A, B, C


def rail_surrogate_dense(n: int, **kw):
    """Dense jnp versions for the dense-path solvers and small tests."""
    E, A, B, C = rail_surrogate(n, **kw)
    dt = default_dtype()
    return (
        jnp.asarray(E.toarray(), dt),
        jnp.asarray(A.toarray(), dt),
        jnp.asarray(B, dt),
        jnp.asarray(C, dt),
    )
