"""Block-ELL sparse operator tests: structure, products, shifted combines,
Krylov solves, Pallas kernel (interpreter mode), and a sparse end-to-end ADI.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import ADI, GALEProblem, Krylov, lowrank, solve
from differentialriccatiequations_jl_tpu.models import residual
from differentialriccatiequations_jl_tpu.ops.sparse import (
    BellOp,
    bell_from_scipy,
    bell_lin_comb,
    bell_pencil,
    bell_scale,
    shifted_bell,
    _bell_mm_xla,
)
from differentialriccatiequations_jl_tpu.ops import solve_blocklinear
from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

rng = np.random.default_rng(3)


def _random_sparse(n, seed=0, density=0.05, shift=None):
    g = np.random.default_rng(seed)
    M = sp.random(n, n, density=density, random_state=g, format="csr")
    if shift is not None:
        M = M + shift * sp.eye(n)
    return M.tocsr()


@pytest.mark.parametrize("n,bs", [(50, 8), (70, 16), (128, 128)])
def test_bell_roundtrip_and_mm(n, bs):
    M = _random_sparse(n, seed=n, shift=1.0)
    op = bell_from_scipy(M, bs=bs)
    Md = M.toarray()
    assert np.allclose(np.asarray(op.to_dense()), Md)
    X = rng.standard_normal((n, 5))
    assert np.allclose(np.asarray(op.mm(X)), Md @ X, atol=1e-12)
    assert np.allclose(np.asarray(op.tmm(X)), Md.T @ X, atol=1e-12)
    v = rng.standard_normal(n)
    assert np.allclose(np.asarray(op.mm(v)), Md @ v, atol=1e-12)
    assert np.allclose(np.asarray(op.diag()), Md.diagonal())


def test_bell_pencil_combine_and_shift():
    n, bs = 60, 8
    E, A, _, _ = rail_surrogate(n)
    E_op, A_op = bell_pencil(E, A, bs=bs)
    Ed, Ad = E.toarray(), A.toarray()
    c = -0.125
    comb = bell_lin_comb(A_op, c, E_op)
    assert np.allclose(np.asarray(comb.to_dense()), Ad + c * Ed, atol=1e-12)
    sc = bell_scale(A_op, 2.5)
    assert np.allclose(np.asarray(sc.to_dense()), 2.5 * Ad, atol=1e-12)

    mu = -2.0
    sh = shifted_bell(E_op, A_op, mu)
    assert np.allclose(np.asarray(sh.to_dense()), Ad.T + mu * Ed.T, atol=1e-12)

    mu_c = -1.0 + 0.5j
    sh_c = shifted_bell(E_op, A_op, mu_c)
    X = rng.standard_normal((n, 3))
    assert np.allclose(
        np.asarray(sh_c.mm(X)), (Ad.T + mu_c * Ed.T) @ X, atol=1e-12
    )


def test_krylov_solve_bell():
    n, bs = 80, 16
    E, A, _, _ = rail_surrogate(n)
    E_op, A_op = bell_pencil(E, A, bs=bs)
    F = shifted_bell(E_op, A_op, -1.5)
    Fd = A.toarray().T - 1.5 * E.toarray().T
    B = rng.standard_normal((n, 3))
    X = np.asarray(
        solve_blocklinear(F, B, Krylov(method="bicgstab", tol=1e-13, maxiter=2000))
    )
    assert np.linalg.norm(Fd @ X - B) / np.linalg.norm(B) < 1e-9


def test_pallas_kernel_interpret_mode():
    # run the Pallas SpMM in interpreter mode and compare to the XLA path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax
    import jax.numpy as jnp
    from differentialriccatiequations_jl_tpu.ops import sparse as sparse_mod

    n, bs = 64, 16
    M = _random_sparse(n, seed=5, shift=2.0)
    op = bell_from_scipy(M, bs=bs, dtype=np.float32)
    X = rng.standard_normal((n, 8)).astype(np.float32)

    nb, K, _, _ = op.data.shape
    qp = 128
    Xp = jnp.pad(jnp.asarray(X), ((0, 0), (0, qp - X.shape[1])))

    def kernel(cols_ref, data_ref, x_ref, y_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        y_ref[...] += jnp.dot(
            data_ref[0, 0], x_ref[...], preferred_element_type=y_ref.dtype
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, K),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, k, c: (i, k, 0, 0)),
            pl.BlockSpec((bs, qp), lambda i, k, c: (c[i, k], 0)),
        ],
        out_specs=pl.BlockSpec((bs, qp), lambda i, k, c: (i, 0)),
    )
    Y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bs, qp), jnp.float32),
        interpret=True,
    )(op.cols, op.data, Xp)
    expect = M.toarray() @ X
    assert np.allclose(np.asarray(Y[:n, :8]), expect, atol=1e-4)


def test_sparse_adi_end_to_end():
    """LRSIF ADI on a block-sparse pencil — residual at reference tolerance."""
    n, bs = 96, 16
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = bell_pencil(E, A, bs=bs)
    Cfac = lowrank(np.asarray(C.T))
    prob = GALEProblem(E_op, A_op, Cfac)
    alg = ADI(
        maxiters=120,
        inner_alg=Krylov(method="bicgstab", tol=1e-13, maxiter=4000),
    )
    X = solve(prob, alg)
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Cfac))
    assert rel < 1e-10

    # oracle: dense host solve on the same pencil
    from differentialriccatiequations_jl_tpu.models import solve_gale_host

    X_ref = np.asarray(solve_gale_host(E.toarray(), A.toarray(), (C.T @ C.T.T)))
    Xd = np.asarray(dre.lr_to_dense(X))
    assert np.linalg.norm(Xd - X_ref) / np.linalg.norm(X_ref) < 1e-8
