"""GDRE integration tests — the rail.jl analog on the FEM surrogate.

Mirrors /root/reference/test/rail.jl: smoke tests of dense Ros1–4
(save_state semantics, aliasing, time direction), LRSIF Ros1/Ros2 feedback
validated against the dense solver within ``‖K‖·n·eps·100``, and dt
convergence of all orders to a common limit.
"""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import (
    GDREProblem,
    Ros1,
    Ros2,
    Ros3,
    Ros4,
    lowrank,
    solve,
)
from differentialriccatiequations_jl_tpu.models import DRESolution
from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate_dense

N = 40
E, A, B, C = rail_surrogate_dense(N)
TSPAN = (4500.0, 4400.0)

_L0 = np.linalg.solve(np.asarray(E), np.asarray(C).T)
X0S = lowrank(_L0, 0.01 * np.eye(C.shape[0]))
X0 = np.asarray(dre.lr_to_dense(X0S))
PROB_DENSE = GDREProblem(E, A, B, C, X0, TSPAN)
PROB_LR = GDREProblem(E, A, B, C, X0S, TSPAN)


def dt_for(nsteps):
    return (TSPAN[1] - TSPAN[0]) / nsteps


def smoketest(prob, alg):
    sol = solve(prob, alg, dt=dt_for(1))
    assert isinstance(sol, DRESolution)
    assert len(sol.X) == 2  # boundaries only by default
    assert sol.X[0] is prob.X0  # no copy
    sol = solve(prob, alg, dt=dt_for(2), save_state=True)
    assert len(sol.t) == len(sol.X) == len(sol.K) == 3
    # time direction preserved (backwards)
    assert sol.t[0] > sol.t[-1]


@pytest.mark.parametrize("alg", [Ros1(), Ros2(), Ros3(), Ros4()])
def test_dense_smoke(alg):
    smoketest(PROB_DENSE, alg)


@pytest.mark.parametrize("alg", [Ros1(), Ros2()])
def test_lowrank_matches_dense(alg):
    ref = solve(PROB_DENSE, alg, dt=dt_for(5))
    eps = np.finfo(np.float64).eps
    tol = np.linalg.norm(np.asarray(ref.K[-1])) * N * eps * 100
    smoketest(PROB_LR, alg)
    sol = solve(PROB_LR, alg, dt=dt_for(5))
    dK = np.linalg.norm(np.asarray(ref.K[-1]) - np.asarray(sol.K[-1]))
    assert dK < tol


def test_orders_converge_to_common_limit():
    Ks = []
    for alg in [Ros1(), Ros2(), Ros3(), Ros4()]:
        sol = solve(PROB_DENSE, alg, dt=dt_for(20))
        Ks.append(np.asarray(sol.K[-1]))
    ref = Ks[-1]
    scale = np.linalg.norm(ref)
    for K in Ks[1:]:  # orders ≥ 2 agree tightly at fine dt
        assert np.linalg.norm(K - ref) / scale < 1e-4
    assert np.linalg.norm(Ks[0] - ref) / scale < 5e-2  # 1st order: looser
