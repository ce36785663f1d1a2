"""Property tests for the padded LowRank (LDLᵀ) pytree.

Mirrors /root/reference/test/LDLt.jl: arithmetic laws, dense conversion,
compression correctness including storage rank ≠ numerical rank, and
definite/scaled/indefinite inner factors.
"""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu.lowrank import (
    lowrank,
    lr_add,
    lr_compress,
    lr_dot,
    lr_norm,
    lr_scale,
    lr_sub,
    lr_to_dense,
    lr_with_capacity,
    lr_zero,
)

rng = np.random.default_rng(42)
N, R = 20, 5


def make(n=N, r=R, kind="definite", seed=0):
    g = np.random.default_rng(seed)
    L = g.standard_normal((n, r))
    if kind == "definite":
        D = np.eye(r)
    elif kind == "scaled":
        D = 3.0 * np.eye(r)
    else:  # indefinite
        d = g.standard_normal(r)
        d[np.abs(d) < 0.1] = 0.5
        D = np.diag(d)
    return lowrank(L, D)


@pytest.mark.parametrize("kind", ["definite", "scaled", "indefinite"])
def test_to_dense_and_norm(kind):
    X = make(kind=kind)
    M = np.asarray(lr_to_dense(X))
    assert M.shape == (N, N)
    assert np.allclose(float(lr_norm(X)), np.linalg.norm(M), rtol=1e-12)


def test_add_scale_laws():
    X = make(seed=1)
    Y = make(seed=2)
    Mx, My = np.asarray(lr_to_dense(X)), np.asarray(lr_to_dense(Y))
    S = lr_add(X, Y, r_out=X.r + Y.r)
    assert np.allclose(np.asarray(lr_to_dense(S)), Mx + My)
    assert int(S.k) == int(X.k) + int(Y.k)
    assert np.allclose(np.asarray(lr_to_dense(lr_scale(-2.5, X))), -2.5 * Mx)
    Dm = lr_sub(X, Y, r_out=X.r + Y.r)
    assert np.allclose(np.asarray(lr_to_dense(Dm)), Mx - My)


def test_dot():
    X, Y = make(seed=3), make(seed=4)
    Mx, My = np.asarray(lr_to_dense(X)), np.asarray(lr_to_dense(Y))
    assert np.allclose(float(lr_dot(X, Y)), np.trace(Mx @ My), rtol=1e-12)


def test_zero():
    Z = lr_zero(N, R, np.float64)
    assert int(Z.k) == 0
    assert np.allclose(np.asarray(lr_to_dense(Z)), 0.0)
    assert float(lr_norm(Z)) == 0.0
    X = make()
    S = lr_add(X, Z, r_out=X.r + Z.r)
    assert np.allclose(np.asarray(lr_to_dense(S)), np.asarray(lr_to_dense(X)))


@pytest.mark.parametrize("kind", ["definite", "scaled", "indefinite"])
def test_compress_exact(kind):
    X = make(kind=kind, seed=5)
    M = np.asarray(lr_to_dense(X))
    Xc = lr_compress(X)
    assert np.allclose(np.asarray(lr_to_dense(Xc)), M, atol=1e-10)
    assert int(Xc.k) <= int(X.k)


def test_compress_rank_deficient():
    # storage rank > numerical rank (test/LDLt.jl:76-90)
    g = np.random.default_rng(7)
    L1 = g.standard_normal((N, 3))
    L = np.concatenate([L1, L1], axis=1)  # duplicated columns
    X = lowrank(L, np.eye(6))
    Xc = lr_compress(X)
    assert int(Xc.k) == 3
    assert np.allclose(
        np.asarray(lr_to_dense(Xc)), np.asarray(lr_to_dense(X)), atol=1e-10
    )


def test_compress_cancellation():
    # ‖X − X‖ numerically zero (test/LDLt.jl:66) and compression keeps it so
    X = make(seed=8)
    Z = lr_sub(X, X, r_out=2 * X.r)
    nX = float(lr_norm(X))
    assert float(lr_norm(Z)) / np.finfo(np.float64).eps < 10 * N * nX
    Zc = lr_compress(Z)
    assert np.allclose(np.asarray(lr_to_dense(Zc)), 0.0, atol=1e-12 * nX)


def test_compress_inner_rank_drop():
    # storage rank ≠ numerical rank via zeroed inner factor
    # (test/LDLt.jl:83-90)
    g = np.random.default_rng(12)
    L = g.standard_normal((N, 4))
    D = np.zeros((4, 4))
    D[0, 0] = 13.0
    X = lowrank(L, D)
    Xc = lr_compress(X)
    assert int(Xc.k) == 1
    assert np.allclose(
        np.asarray(lr_to_dense(Xc)), np.asarray(lr_to_dense(X)), atol=1e-10
    )


def test_capacity_roundtrip():
    X = make(seed=9)
    M = np.asarray(lr_to_dense(X))
    Xg = lr_with_capacity(X, R + 7)
    assert Xg.r == R + 7 and np.allclose(np.asarray(lr_to_dense(Xg)), M)
    Xs = lr_with_capacity(Xg, R)
    assert Xs.r == R and np.allclose(np.asarray(lr_to_dense(Xs)), M)


def test_add_offset_placement():
    # second term must land at the traced offset k1 even after compression
    X = lr_compress(make(seed=10))  # k may be < r
    Y = make(seed=11)
    S = lr_add(X, Y, r_out=X.r + Y.r)
    assert np.allclose(
        np.asarray(lr_to_dense(S)),
        np.asarray(lr_to_dense(X)) + np.asarray(lr_to_dense(Y)),
        atol=1e-10,
    )


def test_vector_diag_constructor():
    L = rng.standard_normal((N, 3))
    d = np.array([1.0, -2.0, 3.0])
    X = lowrank(L, d)
    assert np.allclose(np.asarray(lr_to_dense(X)), L @ np.diag(d) @ L.T)


def test_capacity_exceeding_n():
    # buffers wider than n (r > n) must still compress correctly
    X = lowrank(rng.standard_normal((4, 9)), np.eye(9))
    M = np.asarray(lr_to_dense(X))
    Xc = lr_compress(X)
    assert int(Xc.k) <= 4
    assert np.allclose(np.asarray(lr_to_dense(Xc)), M, atol=1e-12)


def test_eigh_via_svd_psd_shift():
    # The TPU f64 eigh fallback (XLA:TPU cannot lower f64 eigh; the PSD
    # shift makes one f64 SVD act as the symmetric eigendecomposition).
    import jax.numpy as jnp

    from differentialriccatiequations_jl_tpu.lowrank import (
        _eigh_via_svd_psd_shift)

    r = 48
    W = rng.standard_normal((r, r))
    lam_true = np.sort(np.concatenate(
        [np.logspace(0, -13, r // 2), -np.logspace(-2, -12, r - r // 2)]))
    Q, _ = np.linalg.qr(W)
    S = (Q * lam_true) @ Q.T
    S = 0.5 * (S + S.T)
    lam, V = _eigh_via_svd_psd_shift(jnp.asarray(S))
    lam, V = np.asarray(lam), np.asarray(V)
    assert np.all(np.diff(lam) >= 0)  # eigh's ascending convention
    np.testing.assert_allclose(lam, np.linalg.eigvalsh(S), atol=5e-15)
    np.testing.assert_allclose((V * lam) @ V.T, S, atol=5e-14)


def test_cholqr_tall_ill_conditioned_and_padded():
    # The TPU f64 tall-QR replacement: shifted CholeskyQR3 must factor
    # ill-conditioned and zero-padded (dead-column) operands to O(eps).
    import jax.numpy as jnp

    from differentialriccatiequations_jl_tpu.lowrank import _cholqr_tall

    n, r = 500, 24
    U, _ = np.linalg.qr(rng.standard_normal((n, r)))
    s = np.logspace(0, -10, r)  # cond 1e10
    W, _ = np.linalg.qr(rng.standard_normal((r, r)))
    L = (U * s) @ W.T
    L = np.concatenate([L, np.zeros((n, 8))], axis=1)  # padded columns
    Q, R = _cholqr_tall(jnp.asarray(L))
    Q, R = np.asarray(Q), np.asarray(R)
    assert np.linalg.norm(Q @ R - L) < 1e-13 * np.linalg.norm(L)
    # Zero-padded columns yield zero Q columns (their R rows are ~sqrt(ridge),
    # so their S contributions are truncated downstream); the active block
    # must be orthonormal to O(eps).
    assert np.linalg.norm(Q[:, :r].T @ Q[:, :r] - np.eye(r)) < 1e-12
    assert np.linalg.norm(Q[:, r:]) < 1e-6


def test_eigh_refined_tpu_accuracy():
    # SVD-seeded refined eigendecomposition: simulate the chip's f32-class
    # SVD seed by perturbing the exact eigvecs, then check the refinement
    # recovers O(eps) invariance — including a degenerate cluster.
    import jax.numpy as jnp

    from differentialriccatiequations_jl_tpu.lowrank import _eigh_refined_tpu

    r = 32
    lam_true = np.concatenate([[1.0, 1.0 + 1e-12, 0.5], -np.logspace(-1, -13, r - 3)])
    Q, _ = np.linalg.qr(rng.standard_normal((r, r)))
    S = (Q * lam_true) @ Q.T
    S = 0.5 * (S + S.T)
    lam, V, M = _eigh_refined_tpu(jnp.asarray(S))
    lam, V, M = np.asarray(lam), np.asarray(V), np.asarray(M)
    # V orthonormal, and V M Vᵀ reconstructs S to f64
    assert np.linalg.norm(V.T @ V - np.eye(r)) < 1e-13
    assert np.linalg.norm((V @ M) @ V.T - S) < 1e-13 * np.linalg.norm(S)
    np.testing.assert_allclose(np.sort(lam), np.sort(np.linalg.eigvalsh(S)),
                               atol=1e-13)


def test_compress_gram_route_f32_singular():
    """f32 gram-route compression (the TPU throughput path) on a factor
    with exactly dependent columns and large scale spread: the √n-scaled
    ridge added to the Gram matrix must keep its Cholesky NaN-free where
    the unregularized factorization of the (numerically singular) Gram
    matrix breaks down (regression: compiled Newton hump iterates at
    n=79841 NaN'd inside lr_compress, round 4)."""
    import numpy as np
    import jax.numpy as jnp
    from differentialriccatiequations_jl_tpu.lowrank import (
        LowRank, lr_compress, lr_to_dense)

    rng = np.random.default_rng(5)
    n, r = 2000, 24
    base = rng.standard_normal((n, 8)).astype(np.float32)
    # columns: scaled copies + near-duplicates + zero padding
    cols = [base[:, i % 8] * (10.0 ** ((i % 7) - 3)) for i in range(16)]
    cols += [base[:, 0] + 1e-4 * base[:, 1], base[:, 0]]
    L = np.stack(cols + [np.zeros(n, np.float32)] * (r - len(cols)), axis=1)
    D = np.diag(rng.standard_normal(r).astype(np.float32))
    D[r - 3:, r - 3:] = 0.0
    X = LowRank(L=jnp.asarray(L), D=jnp.asarray(0.5 * (D + D.T)),
                k=jnp.int32(len(cols)))
    Xc = lr_compress(X, method="gram")
    assert not bool(jnp.any(jnp.isnan(Xc.L)))
    assert not bool(jnp.any(jnp.isnan(Xc.D)))
    dense0 = np.asarray(lr_to_dense(X))
    dense1 = np.asarray(lr_to_dense(Xc))
    rel = np.linalg.norm(dense1 - dense0) / max(np.linalg.norm(dense0), 1e-30)
    assert rel < 5e-3  # sqrt(eps_f32) class (gram-route accuracy)
    assert int(Xc.k) <= int(X.k)

    # all-zero factor: must not produce inf/NaN through the clamped inverse
    Z = LowRank(L=jnp.zeros((64, 8), jnp.float32),
                D=jnp.zeros((8, 8), jnp.float32), k=jnp.int32(0))
    Zc = lr_compress(Z, method="gram")
    assert not bool(jnp.any(jnp.isnan(Zc.L))) and int(Zc.k) == 0
