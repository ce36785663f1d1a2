"""Multi-device dry run: jit the full compiled GDRE step over a mesh."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..lowrank import lowrank, lr_with_capacity
from ..models.compiled import CompiledConfig, ros1_step_compiled
from ..ops.operators import DenseOp
from ..utils.testmat import rail_surrogate
from .mesh import make_mesh, shard_lowrank, shard_operator, shard_replicated


def dryrun_multichip(n_devices: int) -> None:
    """Create an `n_devices` mesh, shard the flagship LRSIF Ros1 step
    (row-partitioned operators/factors + replicated small algebra — the
    library's spatial analog of tp/sp; see parallel/mesh.py), and execute
    one full compiled time step on tiny shapes."""
    mesh = make_mesh(n_devices)
    dt = default_dtype()

    n = 16 * n_devices  # divisible by the mesh
    E, A, B, C = rail_surrogate(n)
    E_op = shard_operator(mesh, DenseOp(jnp.asarray(E.toarray(), dt)))
    A_op = shard_operator(mesh, DenseOp(jnp.asarray(A.toarray(), dt)))
    B_d = shard_replicated(mesh, jnp.asarray(B, dt))
    C_d = shard_replicated(mesh, jnp.asarray(C, dt))

    q = C.shape[0]
    L0 = np.linalg.solve(E.toarray(), np.asarray(C).T)
    X0 = lr_with_capacity(lowrank(jnp.asarray(L0, dt), 0.01 * jnp.eye(q, dtype=dt)), 64)
    X0 = shard_lowrank(mesh, X0)

    shifts = shard_replicated(
        mesh,
        jnp.asarray([-0.5, -1.0 + 0.5j, -1.0 - 0.5j, -2.0], jnp.complex128
                    if dt == jnp.float64 else jnp.complex64),
    )
    cfg = CompiledConfig(maxiters=8, compression_interval=4, r_res=16)

    with mesh:
        X1, K1, iters, res = ros1_step_compiled(
            E_op, A_op, B_d, C_d, X0, jnp.asarray(20.0, dt), shifts,
            jnp.asarray(1e-8, dt), cfg,
        )
        jax.block_until_ready((X1.L, K1))
    assert np.isfinite(float(res))
