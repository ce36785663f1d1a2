"""Tests for operators and block linear solvers.

Mirrors /root/reference/test/LowRankUpdate.jl: SMW solve vs explicitly
assembled ``A + α⁻¹UV``, and shifted-operator solves.
"""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu.ops import (
    Backslash,
    DenseOp,
    Krylov,
    ShermanMorrisonWoodbury,
    lr_update,
    prepare,
    solve_blocklinear,
    shifted_operator,
    solve_shifted,
)
from differentialriccatiequations_jl_tpu.ops.operators import lin_comb, restrict

rng = np.random.default_rng(0)
N, M = 30, 4


def _stable_matrix(n, seed=0):
    g = np.random.default_rng(seed)
    A = g.standard_normal((n, n))
    return A - n * np.eye(n)


def test_dense_backslash():
    A = _stable_matrix(N)
    B = rng.standard_normal((N, 3))
    X = np.asarray(solve_blocklinear(DenseOp(A), B, Backslash()))
    assert np.allclose(A @ X, B, atol=1e-10)


def test_lowrank_update_mm_and_smw():
    A = _stable_matrix(N, 1)
    U = rng.standard_normal((N, M))
    V = rng.standard_normal((M, N))
    alpha = -2.0
    op = lr_update(DenseOp(A), alpha, U, V)
    dense = A + (1.0 / alpha) * U @ V
    X = rng.standard_normal((N, 3))
    assert np.allclose(np.asarray(op.mm(X)), dense @ X)
    assert np.allclose(np.asarray(op.tmm(X)), dense.T @ X)

    B = rng.standard_normal((N, 3))
    sol = np.asarray(solve_blocklinear(op, B, ShermanMorrisonWoodbury()))
    assert np.allclose(dense @ sol, B, atol=1e-9)
    # default routing picks SMW automatically
    sol2 = np.asarray(solve_blocklinear(op, B))
    assert np.allclose(dense @ sol2, B, atol=1e-9)


def test_adjoint():
    A = _stable_matrix(N, 2)
    U = rng.standard_normal((N, M))
    V = rng.standard_normal((M, N))
    op = lr_update(DenseOp(A), 1.5, U, V)
    X = rng.standard_normal((N, 2))
    assert np.allclose(
        np.asarray(op.adjoint().mm(X)), np.asarray(op.tmm(X))
    )


@pytest.mark.parametrize("mu", [-3.0, -1.5 + 2.0j])
def test_shifted_solve_plain(mu):
    E = np.eye(N) + 0.1 * rng.standard_normal((N, N))
    A = _stable_matrix(N, 3)
    W = rng.standard_normal((N, 3))
    V = np.asarray(solve_shifted(DenseOp(E), DenseOp(A), mu, W))
    F = A.T + mu * E.T
    assert np.allclose(F @ V, W, atol=1e-9)


@pytest.mark.parametrize("mu", [-3.0, -1.5 + 2.0j])
def test_shifted_solve_lowrank_update(mu):
    E = np.eye(N) + 0.1 * rng.standard_normal((N, N))
    A0 = _stable_matrix(N, 4)
    B = rng.standard_normal((N, M))
    K = rng.standard_normal((M, N))
    # F = A0 - B K   (closed loop, lowrank_ros1.jl:39)
    op = lr_update(DenseOp(A0), -1.0, B, K)
    W = rng.standard_normal((N, 3))
    V = np.asarray(solve_shifted(dre.DenseOp(E), op, mu, W))
    F = (A0 - B @ K).T + mu * E.T
    assert np.allclose(F @ V, W, atol=1e-9)


def test_lin_comb_and_restrict():
    E = np.eye(N) + 0.05 * rng.standard_normal((N, N))
    A = _stable_matrix(N, 5)
    op = lin_comb(DenseOp(A), -0.25, DenseOp(E))
    assert np.allclose(np.asarray(op.to_dense()), A - 0.25 * E)

    Q = np.linalg.qr(rng.standard_normal((N, 5)))[0]
    U = rng.standard_normal((N, M))
    Vm = rng.standard_normal((M, N))
    upd = lr_update(DenseOp(A), 2.0, U, Vm)
    expect = Q.T @ (A + 0.5 * U @ Vm) @ Q
    assert np.allclose(np.asarray(restrict(upd, Q)), expect, atol=1e-12)


def test_krylov_solver_dense():
    # SPD system solved by CG, general by BiCGStab
    G = rng.standard_normal((N, N))
    SPD = G @ G.T + N * np.eye(N)
    B = rng.standard_normal((N, 2))
    X = np.asarray(
        solve_blocklinear(DenseOp(SPD), B, Krylov(method="cg", tol=1e-12))
    )
    assert np.allclose(SPD @ X, B, atol=1e-7)
