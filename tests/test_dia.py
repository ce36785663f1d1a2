"""Tests for the DIA (diagonal-storage) banded sparse operator.

The format replacing block-ELL for the stencil/FEM-banded matrices the
reference targets (Oberwolfach Rail; /root/reference/test/rail.jl:15) —
round 1 stored ~112 padded zeros per useful nonzero on these.  Oracles:
scipy dense algebra, the XLA reference kernel, and the single-device path
for the halo-exchange `shard_map` variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from differentialriccatiequations_jl_tpu.ops import dia as dia_mod
from differentialriccatiequations_jl_tpu.ops.dia import (
    DiaOp,
    dia_from_scipy,
    dia_lin_comb,
    dia_offsets,
    dia_pencil,
    dia_scale,
    is_banded,
    shifted_dia,
)


def _random_banded(n=97, offsets=(-9, -1, 0, 1, 9), seed=0, diag_boost=4.0):
    rng = np.random.default_rng(seed)
    M = sp.lil_matrix((n, n))
    for off in offsets:
        i0, i1 = max(0, -off), min(n, n - off)
        rows = np.arange(i0, i1)
        M[rows, rows + off] = rng.standard_normal(len(rows))
    M = M + diag_boost * sp.eye(n)
    return M.tocsr()


def test_dia_offsets_and_nnz():
    M = _random_banded()
    offs = dia_offsets(M)
    assert set(offs) == {-9, -1, 0, 1, 9}
    op = dia_from_scipy(M)
    assert op.nnz == M.nnz
    # DIA stores ndiag·N entries; for banded matrices that's ~nnz, not 112×.
    assert op.nnz_stored <= 6 * M.nnz
    assert is_banded(M)


@pytest.mark.parametrize("q", [1, 3, 16])
def test_dia_mm_tmm_vs_dense(q):
    M = _random_banded(n=83, seed=1)
    op = dia_from_scipy(M)
    rng = np.random.default_rng(2)
    X = rng.standard_normal((83, q)) if q > 1 else rng.standard_normal(83)
    Y = np.asarray(op.mm(jnp.asarray(X)))
    Yt = np.asarray(op.tmm(jnp.asarray(X)))
    dense = M.toarray()
    np.testing.assert_allclose(Y, dense @ X, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(Yt, dense.T @ X, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.to_dense()), dense,
                               rtol=1e-14, atol=1e-14)


def test_dia_adjoint():
    M = _random_banded(n=64, offsets=(-8, -3, 0, 2), seed=3)
    op = dia_from_scipy(M)
    at = op.adjoint()
    np.testing.assert_allclose(np.asarray(at.to_dense()), M.toarray().T,
                               rtol=1e-14, atol=1e-14)
    X = np.random.default_rng(4).standard_normal((64, 5))
    np.testing.assert_allclose(np.asarray(at.mm(jnp.asarray(X))),
                               np.asarray(op.tmm(jnp.asarray(X))),
                               rtol=1e-13, atol=1e-13)
    assert at.offsets == tuple(sorted(at.offsets))


def test_dia_padding():
    M = _random_banded(n=50, seed=5)
    op = dia_from_scipy(M, pad_to=16)
    assert op.N == 64 and op.n == 50
    X = np.random.default_rng(6).standard_normal((50, 4))
    np.testing.assert_allclose(np.asarray(op.mm(jnp.asarray(X))),
                               M.toarray() @ X, rtol=1e-12, atol=1e-12)


def test_dia_pencil_lin_comb_and_shift():
    E = _random_banded(n=71, offsets=(-1, 0, 1), seed=7, diag_boost=6.0)
    A = _random_banded(n=71, offsets=(-8, -1, 0, 1, 8), seed=8,
                       diag_boost=-6.0)
    E_op, A_op = dia_pencil(E, A)
    assert E_op.offsets == A_op.offsets
    # union nnz is the csr-equivalent unit for the combined operator
    U = ((E != 0) + (A != 0))
    assert E_op.nnz == U.nnz

    C = dia_lin_comb(A_op, -0.25, E_op)
    np.testing.assert_allclose(np.asarray(C.to_dense()),
                               A.toarray() - 0.25 * E.toarray(),
                               rtol=1e-12, atol=1e-12)
    S = dia_scale(E_op, 3.0)
    np.testing.assert_allclose(np.asarray(S.to_dense()), 3.0 * E.toarray(),
                               rtol=1e-13, atol=1e-13)

    for mu in (-1.7, -0.4 + 0.9j):
        F = shifted_dia(E_op, A_op, jnp.asarray(mu))
        ref = A.toarray().T + mu * E.toarray().T
        np.testing.assert_allclose(np.asarray(F.to_dense()), ref,
                                   rtol=1e-12, atol=1e-12)


def test_dia_diag_and_blocks():
    M = _random_banded(n=40, offsets=(-3, 0, 5), seed=9)
    op = dia_from_scipy(M)
    np.testing.assert_allclose(np.asarray(op.diag()), M.diagonal(),
                               rtol=1e-14, atol=1e-14)
    bs = 16
    blocks = np.asarray(op.diag_blocks(bs))
    dense = M.toarray()
    nb = -(-40 // bs)
    # padding rows carry identity so the block LUs stay regular
    padded = np.eye(nb * bs)
    padded[:40, :40] = dense
    padded[:40, 40:] = 0.0
    padded[40:, :40] = 0.0
    for b in range(nb):
        expect = padded[b * bs:(b + 1) * bs, b * bs:(b + 1) * bs].copy()
        # couplings crossing the block boundary are dropped by block-Jacobi
        np.testing.assert_allclose(np.tril(np.triu(blocks[b], -bs), bs),
                                   expect * (np.abs(
                                       np.subtract.outer(np.arange(bs),
                                                         np.arange(bs))
                                   ) < bs), rtol=1e-13, atol=1e-13)


def test_dia_halo_shardmap_matches_local():
    ndev = len(jax.devices())
    assert ndev == 8, "conftest should provide 8 virtual CPU devices"
    from differentialriccatiequations_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(ndev)
    n = 96  # 12 rows per shard
    E = _random_banded(n=n, offsets=(-1, 0, 1), seed=10, diag_boost=5.0)
    A = _random_banded(n=n, offsets=(-10, -1, 0, 1, 10), seed=11,
                       diag_boost=-5.0)
    E_l, A_l = dia_pencil(E, A, pad_to=ndev)
    E_s, A_s = dia_pencil(E, A, pad_to=ndev, mesh=mesh)

    X = np.random.default_rng(12).standard_normal((n, 6))
    Xd = jnp.asarray(X)
    for loc, sh in ((E_l, E_s), (A_l, A_s)):
        np.testing.assert_allclose(np.asarray(sh.mm(Xd)),
                                   np.asarray(loc.mm(Xd)),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sh.tmm(Xd)),
                                   np.asarray(loc.tmm(Xd)),
                                   rtol=1e-12, atol=1e-12)

    # shifted combine keeps the mesh
    F = shifted_dia(E_s, A_s, jnp.asarray(-0.8))
    assert F.mesh is mesh
    np.testing.assert_allclose(
        np.asarray(F.mm(Xd)),
        (A.toarray().T - 0.8 * E.toarray().T) @ X,
        rtol=1e-12, atol=1e-12)


def test_dia_halo_exceeding_shard_raises():
    from differentialriccatiequations_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    M = _random_banded(n=64, offsets=(-20, 0, 20), seed=13)
    op = dia_from_scipy(M, pad_to=8, mesh=mesh)
    with pytest.raises(ValueError, match="halo"):
        op.mm(jnp.ones((64, 2)))


def test_dia_pallas_kernel_interpret():
    """Run the production Pallas DIA kernel through the interpreter."""
    M = _random_banded(n=300, offsets=(-17, -1, 0, 1, 17), seed=14)
    op = dia_from_scipy(M, dtype=np.float32)
    X = np.random.default_rng(15).standard_normal((op.N, 4)).astype(np.float32)
    ref = np.asarray(dia_mod._dia_mm_xla(op.data, op.offsets, jnp.asarray(X)))
    old = dia_mod._INTERPRET
    dia_mod._INTERPRET = True
    try:
        out = np.asarray(
            dia_mod._dia_mm_pallas(op.data, op.offsets, jnp.asarray(X)))
    finally:
        dia_mod._INTERPRET = old
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dia_shifted_krylov_solve():
    """(Aᵀ + μEᵀ)V = W via block-Jacobi CG on the DIA operator — the ADI
    hot kernel (adi.jl:155-160) in its TPU-native form."""
    from differentialriccatiequations_jl_tpu.ops.blocklinear import (
        Krylov, prepare)

    n = 128
    E = _random_banded(n=n, offsets=(-1, 0, 1), seed=16, diag_boost=6.0)
    E = (E + E.T) / 2.0
    lap = sp.diags([np.ones(n - 1), -2.0 * np.ones(n), np.ones(n - 1)],
                   [-1, 0, 1]) - 0.05 * sp.eye(n)
    A = lap.tocsr()
    E_op, A_op = dia_pencil(E, A)
    mu = -0.9
    F = shifted_dia(E_op, A_op, jnp.asarray(mu))
    W = np.random.default_rng(17).standard_normal((n, 5))
    solver = prepare(F, Krylov(method="cg", tol=1e-13, maxiter=500,
                               preconditioner="block_jacobi", negate=True))
    V = np.asarray(solver.solve(jnp.asarray(W)))
    ref = np.linalg.solve(A.toarray().T + mu * E.toarray().T, W)
    np.testing.assert_allclose(V, ref, rtol=1e-8, atol=1e-8)


def test_dia_gale_adi_vs_dense_oracle():
    """Host ADI on a DIA-backed GALE matches the dense Lyapunov oracle."""
    from differentialriccatiequations_jl_tpu.models.adi import solve_gale_adi
    from differentialriccatiequations_jl_tpu.models.problems import (
        ADI, GALEProblem)
    from differentialriccatiequations_jl_tpu.lowrank import lowrank, lr_to_dense
    import scipy.linalg as sla

    n = 96
    E = sp.diags([0.3 * np.ones(n - 1), 4.0 + np.arange(n) % 3,
                  0.3 * np.ones(n - 1)], [-1, 0, 1]).tocsr()
    lap = sp.diags([np.ones(n - 1), -2.0 * np.ones(n), np.ones(n - 1)],
                   [-1, 0, 1]) - 0.05 * sp.eye(n)
    A = lap.tocsr()
    E_op, A_op = dia_pencil(E, A)
    rng = np.random.default_rng(18)
    G = rng.standard_normal((n, 3))
    C = lowrank(jnp.asarray(G), jnp.eye(3))

    X = solve_gale_adi(GALEProblem(E_op, A_op, C), ADI(maxiters=80))
    Xd = np.asarray(lr_to_dense(X))

    # dense oracle: solve Aᵀ X E + Eᵀ X A = -G Gᵀ via the Kronecker system
    Ed, Ad = E.toarray(), A.toarray()
    rhs = -(G @ G.T)
    K = np.kron(Ed.T, Ad.T) + np.kron(Ad.T, Ed.T)
    X_ref = np.linalg.solve(K, rhs.reshape(-1)).reshape(n, n)
    np.testing.assert_allclose(Xd, X_ref, rtol=0, atol=1e-8 * sla.norm(X_ref))


def test_dia_pallas_fused_axpby_interpret():
    """The fused SpMM+axpby epilogue (``α·AX + β·Z`` folded into the Pallas
    kernel) matches the unfused XLA expression."""
    M = _random_banded(n=300, offsets=(-17, -1, 0, 1, 17), seed=24)
    op = dia_from_scipy(M, dtype=np.float32)
    rng = np.random.default_rng(25)
    Xt = rng.standard_normal((4, op.N)).astype(np.float32)
    Z = rng.standard_normal((4, op.N)).astype(np.float32)
    a, b = np.float32(0.37), np.float32(-1.21)
    ref = a * np.asarray(
        dia_mod._dia_mm_t_xla(op.data, op.offsets, jnp.asarray(Xt))) + b * Z
    old = dia_mod._INTERPRET
    dia_mod._INTERPRET = True
    try:
        out = np.asarray(dia_mod._dia_mm_pallas_t(
            op.data, op.offsets, jnp.asarray(Xt), Z=jnp.asarray(Z),
            coeffs=(a, b)))
    finally:
        dia_mod._INTERPRET = old
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
