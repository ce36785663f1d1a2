"""Multi-device dry run: the full compiled sparse GDRE step over a mesh.

This is the BASELINE north-star configuration in miniature: a banded
(5-point-stencil) surrogate pencil in DIA storage, row-sharded over a 1-D
device mesh, one complete LRSIF Ros1 time step — RHS assembly, the ADI
`lax.while_loop` with block-Jacobi-preconditioned Krylov shifted solves
(each SpMM a halo-exchange `shard_map` with two `ppermute`s over ICI),
complex double steps, periodic compression, the SMW feedback correction —
in a single jit.  The reference's cross-device oracle is a trajectory
comparison (test/cuda.jl:86-101); the pytest analog lives in
tests/test_sharded_gdre.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..lowrank import lowrank, lr_with_capacity
from ..models.compiled import (
    CompiledConfig,
    build_dia_shift_ops,
    ros1_step_compiled,
)
from ..ops.dia import dia_pencil
from ..utils.testmat import rail_surrogate
from .mesh import make_mesh, shard_lowrank, shard_operator, shard_replicated


def dryrun_multichip(n_devices: int) -> None:
    """Create an `n_devices` mesh, shard the flagship sparse LRSIF Ros1 step
    (row-partitioned DIA operators + factors, halo-exchange SpMM inside the
    ADI while-loop, replicated small algebra), and execute one full compiled
    time step on tiny shapes."""
    mesh = make_mesh(n_devices)
    dt = default_dtype()

    n = 64 * n_devices
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A, dtype=dt, pad_to=n_devices)
    E_op = shard_operator(mesh, E_op)
    A_op = shard_operator(mesh, A_op)
    B_d = shard_replicated(mesh, jnp.asarray(B, dt))
    C_d = shard_replicated(mesh, jnp.asarray(C, dt))

    q = C.shape[0]
    import scipy.sparse.linalg as spla

    L0 = spla.splu(E.tocsc()).solve(np.asarray(C).T.copy())
    X0 = lr_with_capacity(
        lowrank(jnp.asarray(L0, dt), 0.01 * jnp.eye(q, dtype=dt)), 64
    )
    X0 = shard_lowrank(mesh, X0)

    # Complex buffer (conjugate pair adjacent) exercises the double step +
    # complex Krylov on the sharded path.
    cdt = jnp.complex128 if dt == jnp.float64 else jnp.complex64
    shifts = shard_replicated(
        mesh, jnp.asarray([-0.5, -1.0 + 0.5j, -1.0 - 0.5j, -2.0], cdt)
    )
    tau = 20.0
    from ..ops.operators import lin_comb

    F_base = lin_comb(A_op, -1.0 / (2.0 * tau), E_op)
    lus = build_dia_shift_ops(E_op, F_base, shifts)

    cfg = CompiledConfig(maxiters=8, compression_interval=4, r_res=16)
    with mesh:
        X1, K1, iters, res = ros1_step_compiled(
            E_op, A_op, B_d, C_d, X0, jnp.asarray(tau, dt), shifts,
            jnp.asarray(1e-8, dt), cfg, lus,
        )
        jax.block_until_ready((X1.L, K1))
    assert np.isfinite(float(res))

    # --- Newton GARE step on the same mesh (the second benchmark family:
    # benchmark/benchmarks.jl:32-49) -----------------------------------------
    # One compiled Kleinman-Newton step: GARE residual factor as the inner
    # ADI entry residual, closed-loop SMW feedback inside the sharded
    # shifted Krylov solves.
    from ..models.compiled import _newton_step_compiled
    from ..models.residuals import residual_gare_lowrank

    rshifts = shard_replicated(mesh, jnp.asarray([-0.5, -1.5, -3.0], dt))
    gare_lus = build_dia_shift_ops(E_op, A_op, rshifts)
    Gs = shard_lowrank(mesh, lr_with_capacity(lowrank(jnp.asarray(B, dt)), 16))
    Qs = shard_lowrank(
        mesh, lr_with_capacity(lowrank(jnp.asarray(np.asarray(C).T, dt)), 16))
    with mesh:
        K0 = ((B_d.T @ X0.L) @ X0.D) @ E_op.tmm(X0.L).T
        res_g = residual_gare_lowrank(E_op, A_op, Gs, Qs, X0, r_out=cfg.r_res)
        X2, it2, res2 = _newton_step_compiled(
            E_op, A_op, B_d, X0, K0, res_g, rshifts,
            jnp.asarray(1e-3, dt), cfg, gare_lus,
        )
        jax.block_until_ready((X2.L,))
    assert np.isfinite(float(res2))

    # --- Parareal: the TIME axis sharded over the same devices ---------------
    # One parareal iteration of the parallel-in-time GDRE solver: the
    # vmapped fine sweep's slab axis is partitioned over an n_devices mesh
    # (each device integrates its own time slab; no collectives).
    from ..models.parareal import Parareal, solve_gdre_parareal
    from ..models.problems import GDREProblem

    n2 = 96
    E2, A2, B2, C2 = rail_surrogate(n2)
    E2_op, A2_op = dia_pencil(E2, A2, dtype=dt)
    q2 = C2.shape[0]
    L02 = spla.splu(E2.tocsc()).solve(np.asarray(C2).T.copy())
    X02 = lr_with_capacity(
        lowrank(jnp.asarray(L02, dt), 0.01 * jnp.eye(q2, dtype=dt)), 64)
    tau2 = 20.0
    prob2 = GDREProblem(E2_op, A2_op, jnp.asarray(B2, dt),
                        jnp.asarray(C2, dt), X02,
                        (4500.0, 4500.0 - tau2 * n_devices))
    smesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:n_devices]), ("slab",))
    sol = solve_gdre_parareal(
        prob2, dt=-tau2, shifts=jnp.asarray([-0.5, -1.5, -3.0], dt),
        cfg=cfg, capacity=64, alg=Parareal(slabs=n_devices, max_iters=1),
        mesh=smesh, abstol=1e-6 if dt == jnp.float32 else 1e-8)
    jax.block_until_ready(sol.K[-1])
    assert np.isfinite(sol.adi_res_max)
