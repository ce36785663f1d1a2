import os
os.environ.setdefault("DRE_X64", "0")
import sys, time
import jax, jax.numpy as jnp, numpy as np

from differentialriccatiequations_jl_tpu import GAREProblem, lowrank
from differentialriccatiequations_jl_tpu.models.compiled import (
    CompiledConfig, solve_gare_newton_compiled)
from differentialriccatiequations_jl_tpu.models.shifts import heuristic_shifts_host
from differentialriccatiequations_jl_tpu.ops.dia import dia_pencil
from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate
from differentialriccatiequations_jl_tpu.utils.callbacks import Observer

ng = 1357
Eg, Ag, Bg, Cg = rail_surrogate(ng)
E_op, A_op = dia_pencil(Eg, Ag, dtype=np.float32)
sv = heuristic_shifts_host(Eg, Ag, 20, 30, 30)
shifts = jnp.asarray(np.asarray([s.real for s in sv], np.float32))
gprob = GAREProblem(E_op, A_op, lowrank(jnp.asarray(1000.0 * Bg, jnp.float32)),
                    lowrank(jnp.asarray(np.asarray(Cg).T, jnp.float32)))
cfg = CompiledConfig(maxiters=200, compression_interval=10, r_res=32)

class Obs(Observer):
    def gare_step(self, i, X, res, res_norm):
        print(f"newton iter {i}: res {res_norm:.3e} t={time.time()-T0:.1f}s", flush=True)

T0 = time.time()
reltol = float(ng * jnp.finfo(jnp.float32).eps)
X, info = solve_gare_newton_compiled(gprob, shifts=shifts, cfg=cfg,
                                     capacity=160, reltol=reltol, observer=Obs())
print("done", info["residuals"], info["adi_iters"], flush=True)
