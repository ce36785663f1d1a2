"""Compiled (single-jit) ADI / Ros1 step and multi-device sharding tests.

The sharding test is the analog of the reference's CPU-vs-GPU trajectory
comparison (test/cuda.jl:86-101): single-device vs 8-virtual-device mesh
execution must agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import ADI, GALEProblem, lowrank, solve
from differentialriccatiequations_jl_tpu.lowrank import lr_to_dense, lr_with_capacity
from differentialriccatiequations_jl_tpu.models.compiled import (
    CompiledConfig,
    adi_compiled,
    ros1_step_compiled,
)
from differentialriccatiequations_jl_tpu.lowrank import lr_zero
from differentialriccatiequations_jl_tpu.models import residual, solve_gale_host
from differentialriccatiequations_jl_tpu.models.shifts import Cyclic, Heuristic, init_shifts
from differentialriccatiequations_jl_tpu.ops import DenseOp
from differentialriccatiequations_jl_tpu.utils.testmat import (
    rail_surrogate_dense,
    random_pencil,
    random_rhs_lowrank,
)

N = 48


def test_adi_compiled_matches_host_driver():
    E, A = random_pencil(N, seed=3)
    G, S = random_rhs_lowrank(N, 3, seed=4)
    C = lowrank(G, S)
    prob = GALEProblem(E, A, C)

    # Heuristic shifts, precomputed (the compiled path consumes a buffer).
    oracle = init_shifts(Cyclic(Heuristic(8, 8, 8)), prob)
    shifts = jnp.asarray(oracle.take_many(), jnp.complex128)

    q = 3
    W0 = jnp.asarray(G)
    T0 = jnp.asarray(S)
    X0 = lr_zero(N, 64, jnp.float64)
    cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=q)
    abstol = 1e-11 * float(dre.lr_norm(C))
    X, W, iters, res = adi_compiled(prob.E, prob.A, W0, T0, jnp.int32(q), X0,
                                    shifts, abstol, cfg)
    assert float(res) <= abstol
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(C))
    assert rel < 1e-10

    X_ref = np.asarray(solve_gale_host(E, A, np.asarray(lr_to_dense(C))))
    err = np.linalg.norm(np.asarray(lr_to_dense(X)) - X_ref)
    assert err / np.linalg.norm(X_ref) < 1e-9


def _ros1_inputs(n=N, cap=64):
    E, A, B, C = rail_surrogate_dense(n)
    q = C.shape[0]
    L0 = np.linalg.solve(np.asarray(E), np.asarray(C).T)
    X0 = lr_with_capacity(lowrank(L0, 0.01 * np.eye(q)), cap)
    return DenseOp(E), DenseOp(A), B, C, X0


def test_ros1_step_compiled_matches_host_driver():
    from differentialriccatiequations_jl_tpu import GDREProblem, Ros1
    from differentialriccatiequations_jl_tpu.models.shifts import Projection

    E_op, A_op, B, C, X0 = _ros1_inputs()
    tau = 20.0

    # Host driver: one step of Ros1 with heuristic shifts.
    prob = GDREProblem(E_op, A_op, B, C, X0, (4500.0, 4500.0 - tau))
    adi = ADI(shifts=Cyclic(Heuristic(10, 10, 10)), maxiters=60)
    ref = solve(prob, Ros1(inner_alg=adi), dt=-tau)
    K_ref = np.asarray(ref.K[-1])

    # Compiled step with the same shift set.
    lyap_prob = GALEProblem(E_op, A_op, lowrank(np.asarray(C).T))
    shifts = jnp.asarray(
        init_shifts(Cyclic(Heuristic(10, 10, 10)), lyap_prob).take_many(),
        jnp.complex128,
    )
    cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=24)
    X1, K1, iters, res = ros1_step_compiled(
        E_op, A_op, jnp.asarray(B), jnp.asarray(C), X0,
        jnp.asarray(tau), shifts, jnp.asarray(1e-12), cfg,
    )
    assert np.linalg.norm(np.asarray(K1) - K_ref) / np.linalg.norm(K_ref) < 1e-8


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    from differentialriccatiequations_jl_tpu.parallel.mesh import (
        make_mesh,
        shard_lowrank,
        shard_operator,
        shard_replicated,
    )

    n = 64
    E_op, A_op, B, C, X0 = _ros1_inputs(n=n, cap=48)
    shifts = jnp.asarray([-0.5, -1.0 + 0.5j, -1.0 - 0.5j, -2.0], jnp.complex128)
    cfg = CompiledConfig(maxiters=8, compression_interval=4, r_res=16)
    args = (jnp.asarray(B), jnp.asarray(C), jnp.asarray(20.0),
            jnp.asarray(1e-9))

    X1, K1, it1, res1 = ros1_step_compiled(
        E_op, A_op, args[0], args[1], X0, args[2], shifts, args[3], cfg)

    mesh = make_mesh(8)
    E_s = shard_operator(mesh, E_op)
    A_s = shard_operator(mesh, A_op)
    X0_s = shard_lowrank(mesh, X0)
    with mesh:
        X2, K2, it2, res2 = ros1_step_compiled(
            E_s, A_s, shard_replicated(mesh, args[0]),
            shard_replicated(mesh, args[1]), X0_s, args[2],
            shard_replicated(mesh, shifts), args[3], cfg)
        jax.block_until_ready(K2)

    assert int(it1) == int(it2)
    assert np.allclose(np.asarray(K1), np.asarray(K2), rtol=1e-9, atol=1e-10)
    assert np.allclose(
        np.asarray(lr_to_dense(X1)), np.asarray(lr_to_dense(X2)),
        rtol=1e-8, atol=1e-9,
    )


def test_adi_compiled_sparse_blockjacobi():
    """Compiled ADI with block-ELL operators + preconditioned-CG inner
    solves and precomputed per-shift operators (the pod-scale config)."""
    from differentialriccatiequations_jl_tpu.models.compiled import (
        build_sparse_shift_ops,
    )
    from differentialriccatiequations_jl_tpu.ops.blocklinear import Krylov
    from differentialriccatiequations_jl_tpu.ops.sparse import bell_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host,
    )

    n, bs = 96, 16
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = bell_pencil(E, A, bs=bs)
    sv = heuristic_shifts_host(E, A, 8, 10, 10)
    assert all(abs(s.imag) < 1e-12 for s in sv)
    shifts = jnp.asarray([s.real for s in sv])

    sops = build_sparse_shift_ops(
        E_op, A_op, shifts,
        Krylov(method="cg", tol=1e-14, maxiter=500,
               preconditioner="block_jacobi", negate=True),
    )

    q = C.shape[0]
    Cf = lowrank(np.asarray(C.T))
    W0 = jnp.asarray(C.T)
    T0 = jnp.eye(q)
    X0 = lr_zero(n, 96, jnp.float64)
    cfg = CompiledConfig(maxiters=80, compression_interval=10, r_res=q)
    prob = GALEProblem(E_op, A_op, Cf)
    abstol = 1e-11 * float(dre.lr_norm(Cf))
    X, W, iters, res = adi_compiled(E_op, A_op, W0, T0, jnp.int32(q), X0,
                                    shifts, abstol, cfg, sops)
    assert float(res) <= abstol
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Cf))
    assert rel < 1e-10

    X_ref = np.asarray(solve_gale_host(E.toarray(), A.toarray(),
                                       np.asarray(C.T @ C)))
    err = np.linalg.norm(np.asarray(lr_to_dense(X)) - X_ref)
    assert err / np.linalg.norm(X_ref) < 1e-8


def test_compiled_trajectory_matches_host_driver():
    from differentialriccatiequations_jl_tpu import GDREProblem, Ros1
    from differentialriccatiequations_jl_tpu.models.compiled import (
        solve_gdre_ros1_compiled,
    )

    E_op, A_op, B, C, X0 = _ros1_inputs()
    tspan = (4500.0, 4400.0)
    prob = GDREProblem(E_op, A_op, B, C, X0, tspan)

    adi = ADI(shifts=Cyclic(Heuristic(10, 10, 10)), maxiters=60)
    ref = solve(prob, Ros1(inner_alg=adi), dt=-20.0)

    lyap_prob = GALEProblem(E_op, A_op, lowrank(np.asarray(C).T))
    shift_vals = init_shifts(Cyclic(Heuristic(10, 10, 10)), lyap_prob).take_many()
    assert all(s.imag == 0 for s in shift_vals)  # symmetric surrogate
    shifts = jnp.asarray([s.real for s in shift_vals])

    # r_res must cover the numerical rank of the warm-start residual
    # (≈ q + 2·rank(X)); undersizing truncates and floors the accuracy.
    cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=48)
    sol = solve_gdre_ros1_compiled(prob, dt=-20.0, shifts=shifts, cfg=cfg,
                                   capacity=96, abstol=1e-13)
    assert len(sol.K) == len(ref.K)
    # Both solvers converge to their own inner tolerance (compiled: fixed
    # absolute 1e-13; host: per-step relative n·eps); feedbacks agree to the
    # looser of the two.
    for Kc, Kr in zip(sol.K[1:], ref.K[1:]):
        dK = np.linalg.norm(np.asarray(Kc) - np.asarray(Kr))
        assert dK / np.linalg.norm(np.asarray(Kr)) < 1e-6


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()
    res = fn(*args)
    jax.block_until_ready(res[1])

    ge.dryrun_multichip(8)


def test_ros2_compiled_matches_host_driver():
    """Compiled two-stage Ros2 sweep vs the host driver (lowrank_ros2.jl
    semantics) on DIA operators."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as sspla

    from differentialriccatiequations_jl_tpu import GDREProblem, Ros2
    from differentialriccatiequations_jl_tpu.models.compiled import (
        _ROS2_GAMMA,
        solve_gdre_ros2_compiled,
    )
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host,
    )
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    n, tau = 128, 20.0
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A)
    q = C.shape[0]
    L0 = sspla.splu(E.tocsc()).solve(np.asarray(C).T.copy())
    X0 = lr_with_capacity(lowrank(jnp.asarray(L0), 0.01 * jnp.eye(q)), 96)
    prob = GDREProblem(E_op, A_op, jnp.asarray(B), jnp.asarray(C), X0,
                       (4500.0, 4440.0))

    adi = ADI(shifts=Cyclic(Heuristic(10, 10, 10)), maxiters=80)
    ref = solve(prob, Ros2(inner_alg=adi), dt=-tau)

    # compiled path: shifts for the stage pencil (E, γτA − E/2)
    sv = heuristic_shifts_host(
        E, sp.csr_matrix((_ROS2_GAMMA * tau) * A - 0.5 * E), 10, 10, 10)
    shifts = jnp.asarray([s.real for s in sv])
    cfg = CompiledConfig(maxiters=80, compression_interval=10, r_res=48)
    sol = solve_gdre_ros2_compiled(prob, dt=-tau, shifts=shifts, cfg=cfg,
                                   capacity=96, abstol=1e-12)
    assert len(sol.K) == len(ref.K)
    for Kc, Kr in zip(sol.K[1:], ref.K[1:]):
        d = np.linalg.norm(np.asarray(Kc) - np.asarray(Kr))
        assert d / np.linalg.norm(np.asarray(Kr)) < 1e-8


def test_newton_compiled_gare():
    """Host-Newton over the compiled ADI with once-factored shifted cores
    (newton.jl:36-143; benchmark config analog).  Quadratic convergence to
    the reference's 1e-10 regime."""
    from differentialriccatiequations_jl_tpu import GAREProblem
    from differentialriccatiequations_jl_tpu.lowrank import lr_norm
    from differentialriccatiequations_jl_tpu.models.compiled import (
        solve_gare_newton_compiled,
    )
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host,
    )
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    n = 128
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A)
    gprob = GAREProblem(E_op, A_op, lowrank(jnp.asarray(B)),
                        lowrank(jnp.asarray(C.T)))
    sv = heuristic_shifts_host(E, A, 10, 12, 12)
    shifts = jnp.asarray([s.real for s in sv])
    X, info = solve_gare_newton_compiled(
        gprob, shifts=shifts, cfg=CompiledConfig(maxiters=120, r_res=32),
        capacity=128, reltol=1e-11)
    from differentialriccatiequations_jl_tpu.models import residual as _res

    rel = float(lr_norm(_res(gprob, X))) / float(lr_norm(gprob.Q))
    assert rel < 1e-10
    # superlinear tail (the final drop saturates at the eps floor, so the
    # factor is asserted loosely)
    h = info["residuals"]
    assert h[-1] < 0.02 * h[-2]


def test_newton_compiled_benchmark_config():
    """The reference's benchmark configuration — ``G = lowrank(1000B)``
    (benchmark/benchmarks.jl:46) — through the compiled Newton with
    automatic G/Q equilibration and per-step closed-loop Penzl shifts.
    Without both, the strong feedback stalls a fixed open-loop shift
    buffer and the unscaled iterates overflow the residual compression."""
    from differentialriccatiequations_jl_tpu import GAREProblem
    from differentialriccatiequations_jl_tpu.lowrank import lr_norm
    from differentialriccatiequations_jl_tpu.models.compiled import (
        PerStepHeuristic,
        solve_gare_newton_compiled,
    )
    from differentialriccatiequations_jl_tpu.models import residual as _res
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    n = 128
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A)
    gprob = GAREProblem(E_op, A_op, lowrank(jnp.asarray(1000.0 * B)),
                        lowrank(jnp.asarray(C.T)))
    X, info = solve_gare_newton_compiled(
        gprob, shifts=PerStepHeuristic(10, 12, 12),
        cfg=CompiledConfig(maxiters=120, r_res=32),
        capacity=128, reltol=1e-10)
    assert info["sigma"] > 4.0  # equilibration engaged
    rel = float(lr_norm(_res(gprob, X))) / float(lr_norm(gprob.Q))
    assert rel < 1e-9
    h = info["residuals"]
    assert h[-1] <= info["abstol"], h  # converged, no warning path


def test_newton_fgmres_compiled_preconditioner():
    """Newton+FGMRES with the capped compiled-ADI preconditioner (one
    dispatch per Krylov vector) — the reference's second benchmark family
    (benchmarks.jl:21-31) on the compiled path.  FGMRES inner accuracy
    floors near the Krylov-vector truncation, so the tolerance matches the
    reference's GMRES class (1e-8), not the ADI path's 1e-10."""
    from differentialriccatiequations_jl_tpu import GAREProblem, GMRES
    from differentialriccatiequations_jl_tpu.lowrank import lr_norm
    from differentialriccatiequations_jl_tpu.models import residual as _res
    from differentialriccatiequations_jl_tpu.models.compiled import (
        CappedADI,
        PerStepHeuristic,
        solve_gare_newton_compiled,
    )
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    n = 128
    E, A, B, C = rail_surrogate(n)
    E_op, A_op = dia_pencil(E, A)
    gprob = GAREProblem(E_op, A_op, lowrank(jnp.asarray(1000.0 * B)),
                        lowrank(jnp.asarray(C.T)))
    gmres = GMRES(maxiters=5, maxrestarts=0, ignore_initial_guess=True,
                  warn_convergence=False,
                  preconditioner=CappedADI(maxiters=10, r_in=48,
                                           capacity=160))
    X, info = solve_gare_newton_compiled(
        gprob, shifts=PerStepHeuristic(10, 12, 12),
        cfg=CompiledConfig(maxiters=60, r_res=32), capacity=128,
        reltol=1e-8, inner_gmres=gmres)
    rel = float(lr_norm(_res(gprob, X))) / float(lr_norm(gprob.Q))
    assert rel < 1e-8


def test_shift_buffer_pair_preserving():
    """`_shift_buffer` never splits a conjugate pair on tile/truncate and the
    cyclic wrap always lands on a unit boundary (VERDICT r2 weak #4;
    reference consumes pairs together, adi.jl:181-195)."""
    from differentialriccatiequations_jl_tpu.models.compiled import (
        _shift_buffer,
        check_shift_pairing,
    )

    # Truncation would split the pair at slot 2: filler real keeps length.
    sv = [-1.0, -2.0 + 1.0j, -2.0 - 1.0j, -3.0]
    buf = np.asarray(_shift_buffer(sv, jnp.float64, 2))
    check_shift_pairing(buf)
    assert buf.shape == (2,)
    assert np.allclose(buf.imag[:1], 0.0)  # pair replaced by real filler

    # Odd target with pairs present: pairs stay whole.
    buf = np.asarray(_shift_buffer(sv, jnp.float64, 5))
    check_shift_pairing(buf)
    assert buf.shape == (5,)

    # All-complex, odd target: buffer grows by one slot to keep the pair.
    sv = [-1.0 + 0.5j, -1.0 - 0.5j, -2.0 + 1.0j, -2.0 - 1.0j]
    buf = np.asarray(_shift_buffer(sv, jnp.float64, 3))
    check_shift_pairing(buf)
    assert buf.shape == (4,)

    # Non-adjacent conjugates are re-paired (synthesized adjacent).
    sv = [-1.0 + 0.5j, -3.0, -1.0 - 0.5j]
    buf = np.asarray(_shift_buffer(sv, jnp.float64, 6))
    check_shift_pairing(buf)

    # The validator rejects a hand-built split pair.
    with pytest.raises(ValueError):
        check_shift_pairing(np.asarray([-1.0 + 0.5j, -3.0 + 0j]))


def test_adi_compiled_odd_complex_buffer_conv_diff():
    """Odd-length complex shift buffer on the nonsymmetric conv-diff pencil:
    the double step must consume whole conjugate pairs across the cyclic
    wrap (regression for VERDICT r2 weak #4)."""
    from differentialriccatiequations_jl_tpu.models.compiled import (
        _shift_buffer,
        check_shift_pairing,
    )
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host,
    )
    from differentialriccatiequations_jl_tpu.utils.testmat import (
        conv_diff_surrogate,
    )

    n = 96
    E, A, B, C = conv_diff_surrogate(n)
    Ed, Ad = E.toarray(), A.toarray()
    G, S = random_rhs_lowrank(n, 3, seed=7)
    Clr = lowrank(G, S)

    sv = np.asarray(heuristic_shifts_host(E, A, 9, 12, 12))
    assert np.iscomplexobj(sv) and any(abs(sv.imag) > 0)  # pairs exercised
    shifts = _shift_buffer(sv, jnp.float64, 9)  # odd target, complex present
    check_shift_pairing(np.asarray(shifts))

    q = 3
    X0 = lr_zero(n, 64, jnp.float64)
    cfg = CompiledConfig(maxiters=80, compression_interval=10, r_res=q)
    abstol = 1e-11 * float(dre.lr_norm(Clr))
    X, W, iters, res = adi_compiled(
        DenseOp(jnp.asarray(Ed)), DenseOp(jnp.asarray(Ad)), jnp.asarray(G),
        jnp.asarray(S), jnp.int32(q), X0, shifts, abstol, cfg)
    assert float(res) <= abstol
    prob = GALEProblem(Ed, Ad, Clr)
    rel = float(dre.lr_norm(residual(prob, X))) / float(dre.lr_norm(Clr))
    assert rel < 1e-10


def test_coerce_shifts_for_backend(monkeypatch):
    """On TPU, complex shift buffers become the all-real pair encoding by
    default (stacked double step; the complex64 compiled-ADI loop never
    finishes compiling on XLA:TPU), or equal-modulus real substitution
    with DRE_TPU_REAL_SUBST=1; on CPU they pass through untouched."""
    from differentialriccatiequations_jl_tpu.models.compiled import (
        coerce_shifts_for_backend)

    sv = jnp.asarray([-1.0 + 0.5j, -1.0 - 0.5j, -2.0 + 0j])
    out_cpu = coerce_shifts_for_backend(sv)
    assert jnp.iscomplexobj(out_cpu)
    np.testing.assert_allclose(np.asarray(out_cpu), np.asarray(sv))

    import differentialriccatiequations_jl_tpu.ops.dia as dia_mod
    monkeypatch.setattr(dia_mod, "_on_tpu", lambda: True)
    out_tpu = coerce_shifts_for_backend(sv)
    assert not jnp.iscomplexobj(out_tpu)
    assert out_tpu.ndim == 2  # pair encoding: one (Re, |Im|) row per unit
    np.testing.assert_allclose(np.asarray(out_tpu),
                               [[-1.0, 0.5], [-2.0, 0.0]])

    monkeypatch.setenv("DRE_TPU_REAL_SUBST", "1")
    out_sub = coerce_shifts_for_backend(sv)
    assert out_sub.ndim == 1 and not jnp.iscomplexobj(out_sub)
    np.testing.assert_allclose(
        np.asarray(out_sub),
        [-np.abs(-1.0 + 0.5j), -np.abs(-1.0 - 0.5j), -2.0])
    assert np.all(np.asarray(out_sub) < 0)  # stays in the open left half-plane

    # real buffers pass through on every backend
    rv = jnp.asarray([-1.0, -2.0])
    assert coerce_shifts_for_backend(rv) is rv
