"""Benchmark: ADI shifted-solve/SpMM throughput + solver wall times.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric (honest unit): **csr-equivalent nnz/s** of the ADI hot
operator ``Aᵀ + μEᵀ`` SpMM on the n=79841 Rail surrogate in DIA (diagonal)
storage — each structural nonzero is counted once, padding is NOT counted
(round 1 reported stored-nnz/s over a 112×-padded block-ELL format; its
csr-equivalent rate, 0.44 Gnnz/s, is the recorded baseline).

Secondary metrics (in "extra" + stderr):
  * compiled LRSIF **Ros2** GDRE sweep at n=1357 at a defensible tolerance
    (n·eps·‖C‖ for the run dtype) with adi_iters/step recorded — the
    BASELINE.md "GDRE time-steps/sec" anchor,
  * Newton+ADI GARE wall time at n∈{1357, 5177} with the reference's
    benchmark configuration (Cyclic Heuristic(20,30,30) shifts,
    G = lowrank(1000·B), /root/reference/benchmark/benchmarks.jl:32-49).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pallas on the TPU backend requires an x32 process (see config.py); the
# benchmark runs in f32 with f32-defensible tolerances.  (The f64 regime is
# exercised by the x64 test suite and the mixed-precision refined path.)
os.environ.setdefault("DRE_X64", "0")
# Persistent XLA compile cache: the emulated-f64 kernels of the
# mixed-precision accuracy section are slow to compile (minutes at
# n=1357); caching makes reruns (and re-benchmarks) cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dre_jax_cache_tpu")

N = int(os.environ.get("BENCH_N", 79841))
Q = int(os.environ.get("BENCH_Q", 32))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
ITERS = int(os.environ.get("BENCH_ITERS", 2000))

# Round-1 csr-equivalent throughput of the same hot SpMM on the same matrix
# (block-ELL bs=128; BENCH_r01.json stderr tail) — the honest baseline.
R01_CSR_EQUIV_NNZ_S = 0.44e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_spmm(jax, jnp, np):
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil, shifted_dia
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    t0 = time.time()
    E, A, B, C = rail_surrogate(N)
    dt = jnp.dtype(DTYPE)
    # Path decision (measured on the v5e chip, round 3): the XLA lane-major
    # path wins at 12.1 vs 9.7 Gnnz/s even against the Pallas kernel WITH
    # the axpby epilogue fused in (ops/dia.py mmT_axpby).  The kernel's
    # remaining loss is the halo-padded operand copy it needs before every
    # call (BlockSpec cannot express overlapping blocks, and fusing the pad
    # away would need manual edge-case DMA both ways); XLA fuses
    # pad+SpMM+axpby into one streaming loop at ~82% of the v5e HBM roof,
    # which is the bandwidth lower bound for this product.  XLA is the
    # default; DRE_USE_PALLAS=1 measures the kernel (kept as a documented
    # experiment).
    use_pallas = os.environ.get("DRE_USE_PALLAS", "0") == "1"
    E_op, A_op = dia_pencil(E, A, dtype=np.dtype(DTYPE),
                            use_pallas=use_pallas and dt != jnp.float64)
    # union-pattern nnz = csr-equivalent work per SpMM of the combined op
    nnz_csr = int(E_op.nnz)
    F = shifted_dia(E_op, A_op, jnp.asarray(-1.0, dt))
    log(f"[bench] DIA build n={N} ndiag={len(F.offsets)} "
        f"stored={F.nnz_stored} csr-nnz={nnz_csr} "
        f"(pad ratio {F.nnz_stored/nnz_csr:.2f}x) ({time.time()-t0:.1f}s)")

    from functools import partial

    key = jax.random.PRNGKey(0)
    # Lane-major (q, N) state — the layout the Krylov inner solvers keep for
    # the whole solve (ops/blocklinear.py lane_major path), so this measures
    # the SpMM exactly as the ADI consumes it.  The affine `+ 0.01·X0` term
    # keeps iterates O(1) (a pure contraction underflows to zero and
    # flush-to-zero hardware would flatter the timing).
    Xt = jax.random.normal(key, (Q, F.N), dt)
    scale = dt.type(1.0 / max(1.0, float(abs(E_op.diag()).max()
                                         + abs(A_op.diag()).max())))

    @partial(jax.jit, static_argnames=("iters",))
    def sweep(F, Xt, X0, iters):
        def body(i, Xt):
            # Fused SpMM+axpby: identical HBM traffic on both paths (XLA
            # fuses the expression; the Pallas kernel folds the epilogue).
            return F.mmT_axpby(Xt, X0, scale, dt.type(0.01))

        return jax.lax.fori_loop(0, iters, body, Xt)

    # Two-point measurement subtracts the fixed per-dispatch overhead
    # (~25 ms through the hosted-TPU tunnel), which otherwise dominates.
    i1, i2 = ITERS // 5, ITERS
    t0 = time.time()
    jax.block_until_ready(sweep(F, Xt, Xt, i1))
    jax.block_until_ready(sweep(F, Xt, Xt, i2))
    log(f"[bench] compile {time.time()-t0:.1f}s")
    t0 = time.time()
    jax.block_until_ready(sweep(F, Xt, Xt, i1))
    t1 = time.time()
    Y = sweep(F, Xt, Xt, i2)
    jax.block_until_ready(Y)
    t2 = time.time()
    per_iter = ((t2 - t1) - (t1 - t0)) / (i2 - i1)
    csr_nnz_per_s = nnz_csr / per_iter
    bw = (nnz_csr + 2 * N * Q) * dt.itemsize / per_iter
    log(f"[bench] DIA SpMM (q={Q}, lane-major): {per_iter*1e3:.4f} ms/iter "
        f"marginal over {i2-i1} iters -> {csr_nnz_per_s/1e9:.2f} Gnnz/s "
        f"(csr-equivalent; ~{bw/1e9:.0f} GB/s effective), "
        f"dispatch overhead ~{(t1-t0) - i1*per_iter:.3f}s/call")
    return csr_nnz_per_s


def bench_gdre_ros2(jax, jnp, np, extra):
    """Compiled LRSIF Ros2 sweep, n=1357, defensible tolerance."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as sspla

    from differentialriccatiequations_jl_tpu import GDREProblem, lowrank
    from differentialriccatiequations_jl_tpu.lowrank import lr_with_capacity
    from differentialriccatiequations_jl_tpu.models.compiled import (
        _ROS2_GAMMA, CompiledConfig, solve_gdre_ros2_compiled)
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host)
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    ng, tau, nsteps = 1357, 10.0, 10
    t0 = time.time()
    Eg, Ag, Bg, Cg = rail_surrogate(ng)
    dt = jnp.dtype(DTYPE)
    E_op, A_op = dia_pencil(Eg, Ag, dtype=np.dtype(DTYPE))
    sv = heuristic_shifts_host(
        Eg, sp.csr_matrix((_ROS2_GAMMA * tau) * Ag - 0.5 * Eg), 16, 20, 20)
    shifts = jnp.asarray(np.asarray([s.real for s in sv], np.dtype(DTYPE)))
    qg = Cg.shape[0]
    L0 = sspla.splu(Eg.tocsc()).solve(np.asarray(Cg).T.copy())
    X0 = lr_with_capacity(
        lowrank(jnp.asarray(L0, dt), 0.01 * jnp.eye(qg, dtype=dt)), 96)
    prob = GDREProblem(E_op, A_op, jnp.asarray(Bg, dt), jnp.asarray(Cg, dt),
                       X0, (4500.0, 4500.0 - tau * nsteps))
    # defensible tolerance: n·eps·‖C‖ for the run dtype
    abstol = float(ng * jnp.finfo(dt).eps * np.linalg.norm(Cg))
    cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=48)
    # fused=True: whole trajectory in ONE lax.scan dispatch — the per-step
    # driver pays one ~25-30 ms tunnel round trip per step, which at this
    # size IS the step time (measured 34.6 steps/s per-step vs the fused
    # sweep below on the same chip).
    kw = dict(dt=-tau, shifts=shifts, cfg=cfg, capacity=96, abstol=abstol,
              fused=True)
    sol = solve_gdre_ros2_compiled(prob, **kw)
    jax.block_until_ready(sol.K[-1])
    t1 = time.time()
    sol = solve_gdre_ros2_compiled(prob, **kw)
    jax.block_until_ready(sol.K[-1])
    t2 = time.time()
    steps_s = nsteps / (t2 - t1)
    iters_per_step = sol.adi_iters / nsteps
    log(f"[bench] GDRE LRSIF Ros2 compiled (fused scan) n={ng} "
        f"abstol={abstol:.2e}: "
        f"cold {t1-t0:.1f}s, warm {t2-t1:.2f}s -> {steps_s:.2f} steps/s "
        f"(adi_iters/step={iters_per_step:.1f})")
    extra["gdre_ros2_steps_per_s_n1357"] = steps_s
    extra["gdre_ros2_adi_iters_per_step"] = iters_per_step
    extra["gdre_ros2_abstol"] = abstol


def bench_newton_gare(jax, jnp, np, extra, ng):
    """Newton+ADI GARE wall time, reference benchmark config
    (benchmarks.jl:32-49): Heuristic(20,30,30) shifts, G = lowrank(1000·B)."""
    from differentialriccatiequations_jl_tpu import GAREProblem, lowrank
    from differentialriccatiequations_jl_tpu.models.compiled import (
        CompiledConfig, PerStepHeuristic, solve_gare_newton_compiled)
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    t0 = time.time()
    Eg, Ag, Bg, Cg = rail_surrogate(ng)
    dt = jnp.dtype(DTYPE)
    E_op, A_op = dia_pencil(Eg, Ag, dtype=np.dtype(DTYPE))
    # Closed-loop Penzl shifts recomputed when the feedback moves (the fixed
    # open-loop buffer stalls once the G=10⁶BBᵀ feedback moves the
    # spectrum; cf. the reference re-initing shifts per inner solve,
    # newton.jl:136-142) + automatic G/Q equilibration + continuation in
    # control strength inside the solver.
    shifts = PerStepHeuristic(20, 30, 30)
    gprob = GAREProblem(E_op, A_op,
                        lowrank(jnp.asarray(1000.0 * Bg, dt)),
                        lowrank(jnp.asarray(np.asarray(Cg).T, dt)))
    reltol = float(ng * jnp.finfo(dt).eps)
    cfg = CompiledConfig(maxiters=100, compression_interval=10, r_res=48)
    kw = dict(shifts=shifts, cfg=cfg, capacity=96, reltol=reltol)
    X, info = solve_gare_newton_compiled(gprob, **kw)
    jax.block_until_ready(X.L)
    t1 = time.time()
    X, info = solve_gare_newton_compiled(gprob, **kw)
    jax.block_until_ready(X.L)
    t2 = time.time()
    rel_res = info["residuals"][-1] / info["residuals"][0]
    log(f"[bench] Newton+ADI GARE n={ng} reltol={reltol:.1e}: cold "
        f"{t1-t0:.1f}s, warm {t2-t1:.2f}s; converged={info['converged']} "
        f"newton_steps={info['newton_steps']} "
        f"shift_rebuilds={info['shift_rebuilds']} "
        f"adi_iters={info['adi_iters']} final_rel_res={rel_res:.2e}")
    # A timing of a non-converged run is not a benchmark result: record the
    # failure and leave the wall-time fields out (VERDICT r2 weak #2).
    if not info["converged"]:
        extra[f"newton_gare_failed_n{ng}"] = True
        extra[f"newton_gare_final_rel_res_n{ng}"] = rel_res
        raise RuntimeError(
            f"Newton GARE n={ng} did not converge (rel res {rel_res:.2e})")
    extra[f"newton_gare_wall_s_n{ng}"] = t2 - t1
    extra[f"newton_gare_iters_n{ng}"] = info["newton_steps"]
    extra[f"newton_gare_adi_iters_n{ng}"] = sum(info["adi_iters"])
    extra[f"newton_gare_shift_rebuilds_n{ng}"] = info["shift_rebuilds"]
    extra[f"newton_gare_final_rel_res_n{ng}"] = rel_res


def bench_newton_fgmres(jax, jnp, np, extra, ng):
    """Newton+FGMRES(capped-ADI preconditioner) GARE — the reference's
    second benchmark family (benchmarks.jl:21-31,36-49): GMRES(maxiters=5,
    maxrestarts=0) with an ADI(15) preconditioner applied per Krylov
    vector, one compiled dispatch per application."""
    from differentialriccatiequations_jl_tpu import GAREProblem, GMRES, lowrank
    from differentialriccatiequations_jl_tpu.models.compiled import (
        CappedADI, CompiledConfig, PerStepHeuristic,
        solve_gare_newton_compiled)
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    t0 = time.time()
    Eg, Ag, Bg, Cg = rail_surrogate(ng)
    dt = jnp.dtype(DTYPE)
    E_op, A_op = dia_pencil(Eg, Ag, dtype=np.dtype(DTYPE))
    gprob = GAREProblem(E_op, A_op,
                        lowrank(jnp.asarray(1000.0 * Bg, dt)),
                        lowrank(jnp.asarray(np.asarray(Cg).T, dt)))
    reltol = float(ng * jnp.finfo(dt).eps)
    cfg = CompiledConfig(maxiters=100, compression_interval=10, r_res=48)
    gmres = GMRES(maxiters=5, maxrestarts=0, ignore_initial_guess=True,
                  warn_convergence=False,
                  preconditioner=CappedADI(maxiters=15, r_in=64,
                                           capacity=192))
    kw = dict(shifts=PerStepHeuristic(20, 30, 30), cfg=cfg, capacity=96,
              reltol=reltol, inner_gmres=gmres)
    X, info = solve_gare_newton_compiled(gprob, **kw)
    jax.block_until_ready(X.L)
    t1 = time.time()
    X, info = solve_gare_newton_compiled(gprob, **kw)
    jax.block_until_ready(X.L)
    t2 = time.time()
    rel_res = info["residuals"][-1] / info["residuals"][0]
    log(f"[bench] Newton+FGMRES GARE n={ng}: cold {t1-t0:.1f}s, warm "
        f"{t2-t1:.2f}s; converged={info['converged']} "
        f"newton_steps={info['newton_steps']} final_rel_res={rel_res:.2e}")
    if not info["converged"]:
        extra[f"newton_fgmres_failed_n{ng}"] = True
        extra[f"newton_fgmres_final_rel_res_n{ng}"] = rel_res
        raise RuntimeError(
            f"Newton FGMRES n={ng} did not converge (rel res {rel_res:.2e})")
    extra[f"newton_fgmres_wall_s_n{ng}"] = t2 - t1
    extra[f"newton_fgmres_iters_n{ng}"] = info["newton_steps"]
    extra[f"newton_fgmres_final_rel_res_n{ng}"] = rel_res


def bench_accuracy_mixed(jax, jnp, np, extra):
    """Reference-class accuracy ON CHIP via mixed precision (BASELINE.md
    'match reference residual tolerances' row): f64 problem data (XLA:TPU
    software-emulated f64), f32 Krylov cores + iterative refinement
    (`RefinedKrylovSolver` through `build_dia_shift_ops`).  Records achieved
    relative residuals for both solver families at n=1357."""
    import dataclasses

    import scipy.sparse as sp
    import scipy.sparse.linalg as sspla

    from differentialriccatiequations_jl_tpu import (
        GAREProblem, GDREProblem, lowrank)
    from differentialriccatiequations_jl_tpu.lowrank import (
        lr_norm, lr_with_capacity)
    from differentialriccatiequations_jl_tpu.models.compiled import (
        _ROS2_GAMMA, CompiledConfig, PerStepHeuristic, default_dia_krylov,
        solve_gare_newton_compiled, solve_gdre_ros2_compiled)
    from differentialriccatiequations_jl_tpu.models.shifts import (
        heuristic_shifts_host)
    from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    jax.config.update("jax_enable_x64", True)  # f64 emulated on TPU
    ng, tau, nsteps = 1357, 10.0, 3
    Eg, Ag, Bg, Cg = rail_surrogate(ng)
    E_op, A_op = dia_pencil(Eg, Ag, dtype=np.float64)

    # --- GDRE Ros2, 1e-10-class stage tolerance ------------------------------
    t0 = time.time()
    sv = heuristic_shifts_host(
        Eg, sp.csr_matrix((_ROS2_GAMMA * tau) * Ag - 0.5 * Eg), 16, 20, 20)
    shifts = jnp.asarray(np.asarray([s.real for s in sv], np.float64))
    krylov = dataclasses.replace(
        default_dia_krylov(jnp.float64, shifts.dtype),
        solve_dtype="float32", refine_iters=3)
    qg = Cg.shape[0]
    L0 = sspla.splu(Eg.tocsc()).solve(np.asarray(Cg).T.copy())
    X0 = lr_with_capacity(
        lowrank(jnp.asarray(L0, jnp.float64),
                0.01 * jnp.eye(qg, dtype=jnp.float64)), 128)
    prob = GDREProblem(E_op, A_op, jnp.asarray(Bg, jnp.float64),
                       jnp.asarray(np.asarray(Cg), jnp.float64), X0,
                       (4500.0, 4500.0 - tau * nsteps))
    norm_C = float(np.linalg.norm(np.asarray(Cg)))
    abstol = 1e-10 * norm_C  # the reference's rail tolerance class
    cfg = CompiledConfig(maxiters=100, compression_interval=10, r_res=64)
    sol = solve_gdre_ros2_compiled(prob, dt=-tau, shifts=shifts, cfg=cfg,
                                   capacity=128, abstol=abstol,
                                   krylov_cfg=krylov)
    jax.block_until_ready(sol.K[-1])
    rel_gdre = sol.adi_res_max / norm_C
    log(f"[bench] mixed-precision GDRE Ros2 n={ng} ({nsteps} steps): worst "
        f"stage rel res {rel_gdre:.2e} (target 1e-10 class; "
        f"{time.time()-t0:.1f}s incl. compile)")
    extra["gdre_ros2_mixed_rel_res_n1357"] = rel_gdre

    # --- Newton GARE, reltol 1e-10 -------------------------------------------
    t0 = time.time()
    gprob = GAREProblem(
        E_op, A_op, lowrank(jnp.asarray(1000.0 * Bg, jnp.float64)),
        lowrank(jnp.asarray(np.asarray(Cg).T, jnp.float64)))
    X, info = solve_gare_newton_compiled(
        gprob, shifts=PerStepHeuristic(20, 30, 30),
        cfg=CompiledConfig(maxiters=150, compression_interval=10, r_res=64),
        capacity=128, reltol=1e-10, inner_solve_dtype="float32")
    jax.block_until_ready(X.L)
    rel_newton = info["residuals"][-1] / info["residuals"][0]
    log(f"[bench] mixed-precision Newton GARE n={ng}: converged="
        f"{info['converged']} rel res {rel_newton:.2e} (target 1e-10; "
        f"steps={info['newton_steps']}, {time.time()-t0:.1f}s incl. compile)")
    extra["newton_gare_mixed_rel_res_n1357"] = rel_newton
    extra["newton_gare_mixed_converged_n1357"] = bool(info["converged"])


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import differentialriccatiequations_jl_tpu  # noqa: F401 (x64 flag)

    log(f"[bench] devices={jax.devices()} import+init {time.time()-t0:.1f}s")

    csr_nnz_per_s = bench_spmm(jax, jnp, np)

    extra = {}
    if os.environ.get("BENCH_GDRE", "1") != "0":
        try:
            bench_gdre_ros2(jax, jnp, np, extra)
        except Exception as e:  # secondary metrics must not break the bench
            log(f"[bench] GDRE Ros2 metric failed: {e!r}")
    if os.environ.get("BENCH_NEWTON", "1") != "0":
        for ng in (1357, 5177):
            try:
                bench_newton_gare(jax, jnp, np, extra, ng)
            except Exception as e:
                log(f"[bench] Newton GARE n={ng} metric failed: {e!r}")
    if os.environ.get("BENCH_GMRES", "1") != "0":
        try:
            bench_newton_fgmres(jax, jnp, np, extra, 1357)
        except Exception as e:
            log(f"[bench] Newton FGMRES metric failed: {e!r}")
    if os.environ.get("BENCH_MIXED", "1") != "0":
        # Last: flips jax_enable_x64 on for the accuracy section.
        try:
            bench_accuracy_mixed(jax, jnp, np, extra)
        except Exception as e:
            log(f"[bench] mixed-precision accuracy metric failed: {e!r}")

    print(json.dumps({
        "metric": "adi_shifted_spmm_csr_nnz_per_s_chip_rail79841_surrogate",
        "value": csr_nnz_per_s,
        "unit": "nnz/s (csr-equivalent)",
        "vs_baseline": csr_nnz_per_s / R01_CSR_EQUIV_NNZ_S,
        "extra": extra,
    }), flush=True)


if __name__ == "__main__":
    main()
