"""Sharded SpMM with halo exchange vs single-device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differentialriccatiequations_jl_tpu.ops.sparse import bell_pencil
from differentialriccatiequations_jl_tpu.parallel.mesh import make_mesh
from differentialriccatiequations_jl_tpu.parallel.sharded_ops import ShardedBellSpmm
from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_sharded_spmm_matches_dense():
    n, bs = 1024, 16  # nb = 64 → 8 block-rows per device
    E, A, _, _ = rail_surrogate(n)
    E_op, A_op = bell_pencil(E, A, bs=bs)
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, 5))

    mm = ShardedBellSpmm(mesh, A_op)
    Y = np.asarray(mm(X))
    assert np.allclose(Y, A.toarray() @ X, atol=1e-10)

    mmt = ShardedBellSpmm(mesh, A_op, transpose=True)
    Yt = np.asarray(mmt(X))
    assert np.allclose(Yt, A.toarray().T @ X, atol=1e-10)

    # vector RHS
    v = rng.standard_normal(n)
    assert np.allclose(np.asarray(mm(v)), A.toarray() @ v, atol=1e-10)


def test_sharded_spmm_rejects_wide_band():
    import scipy.sparse as sp

    n, bs = 256, 16
    rng = np.random.default_rng(1)
    M = sp.random(n, n, density=0.2, random_state=rng, format="csr") + sp.eye(n)
    from differentialriccatiequations_jl_tpu.ops.sparse import bell_from_scipy

    op = bell_from_scipy(M.tocsr(), bs=bs)
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        ShardedBellSpmm(mesh, op, halo=1)
