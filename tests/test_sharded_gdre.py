"""Sharded sparse (DIA) compiled ADI / GDRE tests — the BASELINE north-star
configuration in miniature.

Covers: DiaShiftOps compiled ADI with real shifts (block-Jacobi CG), complex
Penzl shifts on a nonsymmetric convection–diffusion pencil (the scale analog
of the reference's E×A grid, test/tiny_random.jl:20-47, and of the complex
double step adi.jl:181-225), the mixed-precision f32-core + refinement path,
and the sharded-vs-single-device trajectory equality that mirrors the
reference's CPU-vs-GPU oracle (test/cuda.jl:86-101) on the *sparse* path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse.linalg as sspla

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import GALEProblem, GDREProblem, lowrank
from differentialriccatiequations_jl_tpu.lowrank import (
    lr_to_dense,
    lr_with_capacity,
    lr_zero,
)
from differentialriccatiequations_jl_tpu.models import residual, solve_gale_host
from differentialriccatiequations_jl_tpu.models.compiled import (
    CompiledConfig,
    adi_compiled,
    build_dia_shift_ops,
    solve_gdre_ros1_compiled,
)
from differentialriccatiequations_jl_tpu.models.shifts import heuristic_shifts_host
from differentialriccatiequations_jl_tpu.ops.blocklinear import Krylov
from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
from differentialriccatiequations_jl_tpu.utils.testmat import (
    conv_diff_surrogate,
    rail_surrogate,
)


def _gale_setup(E, A, C):
    E_op, A_op = dia_pencil(E, A)
    q = C.shape[0]
    Cf = lowrank(np.asarray(C.T))
    W0 = jnp.asarray(C.T)
    T0 = jnp.eye(q)
    X0 = lr_zero(E.shape[0], 96, jnp.float64)
    cfg = CompiledConfig(maxiters=80, compression_interval=10, r_res=q)
    return E_op, A_op, Cf, W0, T0, X0, cfg


def test_dia_adi_compiled_real_shifts():
    """Compiled ADI over DiaShiftOps (block-Jacobi CG inner solves)."""
    n = 96
    E, A, B, C = rail_surrogate(n)
    E_op, A_op, Cf, W0, T0, X0, cfg = _gale_setup(E, A, C)
    sv = heuristic_shifts_host(E, A, 8, 10, 10)
    assert all(abs(s.imag) < 1e-12 for s in sv)
    shifts = jnp.asarray([s.real for s in sv])
    sops = build_dia_shift_ops(E_op, A_op, shifts)

    prob = GALEProblem(E_op, A_op, Cf)
    abstol = 1e-11 * float(dre.lr_norm(Cf))
    X, W, iters, res = adi_compiled(E_op, A_op, W0, T0, jnp.int32(C.shape[0]),
                                    X0, shifts, abstol, cfg, sops)
    assert float(res) <= abstol
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Cf))
    assert rel < 1e-10
    X_ref = np.asarray(solve_gale_host(E.toarray(), A.toarray(),
                                       np.asarray(C.T @ C)))
    err = np.linalg.norm(np.asarray(lr_to_dense(X)) - X_ref)
    assert err / np.linalg.norm(X_ref) < 1e-9


def test_dia_adi_compiled_complex_shifts_nonsymmetric():
    """Complex conjugate-pair shifts on the compiled sparse path
    (all-real factors via the double-step recombination; complex Krylov
    solves on the banded operator) for a nonsymmetric pencil."""
    n = 96
    E, A, B, C = conv_diff_surrogate(n, peclet=2.0)
    E_op, A_op, Cf, W0, T0, X0, cfg = _gale_setup(E, A, C)
    sv = heuristic_shifts_host(E, A, 8, 12, 12)
    assert any(abs(s.imag) > 1e-10 for s in sv), "expected complex shifts"
    shifts = jnp.asarray(sv, jnp.complex128)
    sops = build_dia_shift_ops(E_op, A_op, shifts)  # → bicgstab default

    prob = GALEProblem(E_op, A_op, Cf)
    abstol = 1e-10 * float(dre.lr_norm(Cf))
    X, W, iters, res = adi_compiled(E_op, A_op, W0, T0, jnp.int32(C.shape[0]),
                                    X0, shifts, abstol, cfg, sops)
    assert float(res) <= abstol
    assert not np.iscomplexobj(np.asarray(X.L))  # factors stay real
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Cf))
    assert rel < 1e-9
    X_ref = np.asarray(solve_gale_host(E.toarray(), A.toarray(),
                                       np.asarray(C.T @ C)))
    err = np.linalg.norm(np.asarray(lr_to_dense(X)) - X_ref)
    assert err / np.linalg.norm(X_ref) < 1e-9


def test_dia_adi_compiled_refined_f32_core():
    """Mixed-precision path: f32 Krylov core + f64 iterative refinement
    reaches the same 1e-10 regime as the all-f64 solve — the TPU answer to
    the reference's `uses_mixed_precision` (adi.jl:23-27) and the f64-on-TPU
    hard part (SURVEY §7 #5)."""
    n = 96
    E, A, B, C = rail_surrogate(n)
    E_op, A_op, Cf, W0, T0, X0, cfg = _gale_setup(E, A, C)
    sv = heuristic_shifts_host(E, A, 8, 10, 10)
    shifts = jnp.asarray([s.real for s in sv])
    kcfg = Krylov(method="cg", tol=3e-6, maxiter=400,
                  preconditioner="block_jacobi", negate=True,
                  solve_dtype="float32", refine_iters=3)
    sops = build_dia_shift_ops(E_op, A_op, shifts, kcfg)
    assert sops.prec_inv.dtype == jnp.float32

    prob = GALEProblem(E_op, A_op, Cf)
    abstol = 1e-11 * float(dre.lr_norm(Cf))
    X, W, iters, res = adi_compiled(E_op, A_op, W0, T0, jnp.int32(C.shape[0]),
                                    X0, shifts, abstol, cfg, sops)
    assert float(res) <= abstol
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Cf))
    assert rel < 1e-10


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_dia_gdre_trajectory_matches_single_device():
    """Full compiled LRSIF Ros1 sweep on row-sharded DIA operators (halo
    exchange inside the ADI while-loop) vs the single-device run — the
    sparse-path analog of the reference's GPU-vs-CPU trajectory oracle
    (test/cuda.jl:86-101)."""
    from differentialriccatiequations_jl_tpu.parallel.mesh import (
        make_mesh,
        shard_lowrank,
        shard_operator,
        shard_replicated,
    )

    n = 256
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A, pad_to=8)
    sv = heuristic_shifts_host(E, A, 8, 10, 10)
    shifts = jnp.asarray([s.real for s in sv])
    q = C.shape[0]
    L0 = sspla.splu(E.tocsc()).solve(np.asarray(C).T.copy())
    X0 = lr_with_capacity(lowrank(jnp.asarray(L0), 0.01 * jnp.eye(q)), 96)
    cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=48)
    tspan = (4500.0, 4440.0)

    prob = GDREProblem(E_op, A_op, jnp.asarray(B), jnp.asarray(C), X0, tspan)
    sol1 = solve_gdre_ros1_compiled(prob, dt=-20.0, shifts=shifts, cfg=cfg,
                                    capacity=96, abstol=1e-12)

    mesh = make_mesh(8)
    E_s = shard_operator(mesh, E_op)
    A_s = shard_operator(mesh, A_op)
    assert E_s.mesh is mesh  # halo-exchange shard_map path is active
    prob_s = GDREProblem(E_s, A_s, shard_replicated(mesh, jnp.asarray(B)),
                         shard_replicated(mesh, jnp.asarray(C)),
                         shard_lowrank(mesh, X0), tspan)
    with mesh:
        sol2 = solve_gdre_ros1_compiled(
            prob_s, dt=-20.0, shifts=shard_replicated(mesh, shifts), cfg=cfg,
            capacity=96, abstol=1e-12)
        jax.block_until_ready(sol2.K[-1])

    assert sol1.adi_iters == sol2.adi_iters
    for K1, K2 in zip(sol1.K, sol2.K):
        nrm = max(np.linalg.norm(np.asarray(K1)), 1e-300)
        assert np.linalg.norm(np.asarray(K1) - np.asarray(K2)) / nrm < 1e-10
    dX = np.linalg.norm(np.asarray(lr_to_dense(sol1.X[-1])) -
                        np.asarray(lr_to_dense(sol2.X[-1])))
    assert dX < 1e-10


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_sparse():
    """The driver's multi-chip dry run exercises the sharded sparse step."""
    from differentialriccatiequations_jl_tpu.parallel.dryrun import (
        dryrun_multichip,
    )

    dryrun_multichip(8)
