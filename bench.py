"""Benchmark: ADI shifted-solve/SpMM throughput on the Rail-79841 surrogate.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md); the baseline is
self-measured, so ``vs_baseline`` is relative to the first recorded value of
this same metric (1.0 when no history is available).

Measured: sustained block-ELL SpMM throughput (stored-nnz/s per chip) of the
ADI hot operator ``Aᵀ + μEᵀ`` on the n=79841 FEM surrogate of the
Oberwolfach Rail profile (MORWiki is unreachable offline — see
utils/testmat.py) with a q=32 block RHS — the bandwidth-bound kernel that
dominates every solver in the stack.  Detail timings go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pallas on the TPU backend requires an x32 process (see config.py); the
# throughput benchmark runs the hot kernel in f32.
os.environ.setdefault("DRE_X64", "0")

N = int(os.environ.get("BENCH_N", 79841))
Q = int(os.environ.get("BENCH_Q", 32))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
ITERS = int(os.environ.get("BENCH_ITERS", 50))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import differentialriccatiequations_jl_tpu  # noqa: F401 (x64 flag)
    from differentialriccatiequations_jl_tpu.ops.sparse import (
        bell_pencil,
        shifted_bell,
    )
    from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate

    log(f"[bench] devices={jax.devices()} import+init {time.time()-t0:.1f}s")

    t0 = time.time()
    E, A, B, C = rail_surrogate(N)
    nnz_csr = int(E.nnz + A.nnz)
    dt = jnp.dtype(DTYPE)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    E_op, A_op = bell_pencil(E, A, bs=128, dtype=np.dtype(DTYPE),
                             use_pallas=on_tpu and dt != jnp.float64)
    log(f"[bench] build n={N} bs=128 blocks={tuple(E_op.data.shape)} "
        f"({time.time()-t0:.1f}s), csr nnz={nnz_csr}")

    F = shifted_bell(E_op, A_op, jnp.asarray(-1.0, dt))
    nnz_stored = int(F.data.size)

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (N, Q), dt)

    # constant contraction keeps the iterates bounded without inserting a
    # serializing global reduction between SpMMs
    scale = dt.type(1.0 / max(1.0, float(abs(E_op.diag()).max() + abs(A_op.diag()).max())))

    @jax.jit
    def sweep(F, X):
        # F passed as an argument (captured closures would inline the block
        # data as HLO constants — too large for the compile pipeline);
        # chain SpMMs so the timing loop is one dispatch.
        def body(i, X):
            return scale * F.mm(X)

        return jax.lax.fori_loop(0, ITERS, body, X)

    t0 = time.time()
    Y = sweep(F, X)
    Y.block_until_ready()
    log(f"[bench] compile+first sweep {time.time()-t0:.1f}s")

    t0 = time.time()
    Y = sweep(F, Y)
    Y.block_until_ready()
    elapsed = time.time() - t0
    nnz_per_s = nnz_stored * ITERS / elapsed
    log(f"[bench] {ITERS} SpMM sweeps in {elapsed:.3f}s "
        f"-> {nnz_per_s/1e9:.2f} Gnnz/s (stored), "
        f"{nnz_csr*ITERS/elapsed/1e9:.2f} Gnnz/s (csr-equivalent)")

    # Secondary metric (stderr): compiled LRSIF Ros1 GDRE sweep throughput
    # at n=1357 — the BASELINE.md "GDRE time-steps/sec" anchor.
    if os.environ.get("BENCH_GDRE", "1") != "0":
        try:
            t0 = time.time()
            import jax.numpy as jnp2
            from differentialriccatiequations_jl_tpu import GDREProblem, lowrank
            from differentialriccatiequations_jl_tpu.models.compiled import (
                CompiledConfig, solve_gdre_ros1_compiled)
            from differentialriccatiequations_jl_tpu.models.shifts import (
                heuristic_shifts_host)
            from differentialriccatiequations_jl_tpu.ops import DenseOp

            ng = 1357
            Eg, Ag, Bg, Cg = rail_surrogate(ng)
            sv = heuristic_shifts_host(Eg, Ag, 16, 20, 20)
            sv = [s.real for s in sv if abs(s.imag) < 1e-12] or [s.real for s in sv]
            shifts = jnp.asarray(np.array(sv, np.float32))
            qg = Cg.shape[0]
            L0 = np.linalg.solve(Eg.toarray(), Cg.T).astype(np.float32)
            X0 = lowrank(L0, 0.01 * np.eye(qg, dtype=np.float32))
            nsteps = 10
            probg = GDREProblem(
                DenseOp(jnp.asarray(Eg.toarray(), jnp.float32)),
                DenseOp(jnp.asarray(Ag.toarray(), jnp.float32)),
                jnp.asarray(Bg, jnp.float32), jnp.asarray(Cg, jnp.float32),
                X0, (4500.0, 4500.0 - 10.0 * nsteps))
            cfg = CompiledConfig(maxiters=60, compression_interval=10, r_res=24)
            kw = dict(dt=-10.0, shifts=shifts, cfg=cfg, capacity=128,
                      abstol=3e-4)
            sol = solve_gdre_ros1_compiled(probg, **kw)
            jax.block_until_ready(sol.K[-1])
            t1 = time.time()
            sol = solve_gdre_ros1_compiled(probg, **kw)
            jax.block_until_ready(sol.K[-1])
            t2 = time.time()
            log(f"[bench] GDRE LRSIF Ros1 compiled n={ng}: cold {t1-t0:.1f}s, "
                f"warm {t2-t1:.2f}s -> {nsteps/(t2-t1):.2f} steps/s "
                f"(adi_iters={sol.adi_iters})")
        except Exception as e:  # secondary metric must not break the bench
            log(f"[bench] GDRE secondary metric failed: {e!r}")

    # vs_baseline: ratio to the first recorded value of this metric.
    vs = 1.0
    hist_path = os.path.join(os.path.dirname(__file__), ".bench_history.json")
    try:
        hist = json.load(open(hist_path))
        if hist.get("metric_baseline"):
            vs = nnz_per_s / hist["metric_baseline"]
    except Exception:
        hist = {}
    if "metric_baseline" not in hist:
        hist["metric_baseline"] = nnz_per_s
        try:
            json.dump(hist, open(hist_path, "w"))
        except Exception:
            pass

    print(json.dumps({
        "metric": "adi_shifted_spmm_nnz_per_s_chip_rail79841_surrogate",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": vs,
    }), flush=True)


if __name__ == "__main__":
    main()
