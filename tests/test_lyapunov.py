"""Cross-solver GALE tests — the tiny_random oracle pattern.

Mirrors /root/reference/test/tiny_random.jl: random pencils over a
symmetric/nonsymmetric E×A grid; ADI, Kronecker, GMRES, FGMRES+ADI are
checked against the dense sign-function solver, the SciPy host oracle, and
the residual norm (tolerances from BASELINE.md).
"""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import (
    ADI,
    BartelsStewart,
    GALEProblem,
    GMRES,
    Kronecker,
    lowrank,
    lr_to_dense,
    solve,
)
from differentialriccatiequations_jl_tpu.models import residual
from differentialriccatiequations_jl_tpu.models.shifts import Cyclic, Heuristic, Projection
from differentialriccatiequations_jl_tpu.utils.testmat import (
    random_pencil,
    random_rhs_lowrank,
)

N, G = 50, 4


def delta(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / max(np.linalg.norm(a), np.linalg.norm(b))


def res_norm(prob, X):
    r = residual(prob, X)
    if hasattr(r, "L"):
        return float(dre.lr_norm(r))
    return float(np.linalg.norm(np.asarray(r)))


def make_prob(symmetric_E, symmetric_A, seed):
    E, A = random_pencil(N, symmetric_E=symmetric_E, symmetric_A=symmetric_A,
                         seed=seed)
    Gm, S = random_rhs_lowrank(N, G, seed=seed + 100)
    C = lowrank(Gm, S)  # C = 2 G Gᵀ ⪰ 0
    return GALEProblem(E, A, C), E, A


GRID = [(True, True), (True, False), (False, True), (False, False)]


@pytest.mark.parametrize("symE,symA", GRID)
def test_dense_solvers_agree(symE, symA):
    prob, E, A = make_prob(symE, symA, seed=symE * 2 + symA)
    Cd = np.asarray(lr_to_dense(prob.C))
    res0 = np.linalg.norm(Cd)

    X_sign = np.asarray(solve(prob, BartelsStewart()))
    X_host = np.asarray(solve(prob, BartelsStewart(host=True)))
    X_kron = np.asarray(solve(prob, Kronecker()))

    dense_prob = GALEProblem(E, A, Cd)
    assert res_norm(dense_prob, X_host) / res0 < 1e-10
    assert res_norm(dense_prob, X_sign) / res0 < 1e-10
    assert res_norm(dense_prob, X_kron) / res0 < 1e-8
    assert delta(X_sign, X_host) < 1e-10
    assert delta(X_kron, X_host) < 1e-8


@pytest.mark.parametrize("symE,symA", GRID)
def test_adi_vs_oracle(symE, symA):
    prob, E, A = make_prob(symE, symA, seed=10 + symE * 2 + symA)
    res0 = float(dre.lr_norm(prob.C))

    X_adi = solve(prob, ADI())
    assert res_norm(prob, X_adi) / res0 < 1e-10

    X_ref = np.asarray(solve(prob, BartelsStewart(host=True)))
    assert delta(lr_to_dense(X_adi), X_ref) < 1e-10


def test_adi_heuristic_shifts():
    prob, _, _ = make_prob(True, True, seed=21)
    res0 = float(dre.lr_norm(prob.C))
    alg = ADI(shifts=Cyclic(Heuristic(10, 10, 10)), maxiters=100)
    X = solve(prob, alg)
    assert res_norm(prob, X) / res0 < 1e-10


def test_gmres_and_fgmres():
    prob, E, A = make_prob(True, True, seed=30)
    res0 = float(dre.lr_norm(prob.C))
    X_ref = np.asarray(solve(prob, BartelsStewart(host=True)))

    X_gmres = solve(prob, GMRES(maxiters=5, reltol=1e-8))
    assert res_norm(prob, X_gmres) / res0 < 1e-8
    assert delta(lr_to_dense(X_gmres), X_ref) < 1e-8

    X_fgmres = solve(
        prob,
        GMRES(
            maxiters=3,
            maxrestarts=0,
            reltol=1e-10,
            preconditioner=ADI(
                maxiters=10,
                shifts=Cyclic(Heuristic(10, 10, 10)),
                compression_interval=20,
                warn_convergence=False,
            ),
        ),
    )
    assert res_norm(prob, X_fgmres) / res0 < 1e-10
    assert delta(lr_to_dense(X_fgmres), X_ref) < 1e-10


def test_adi_stepwise_iteration():
    # resumable solver object (test/tiny_random.jl:48-57)
    prob, _, _ = make_prob(True, True, seed=40)
    solver = dre.init(prob, ADI())
    prev = 0
    while not solver.done:
        solver.step()
        curr = solver.iters
        assert prev + 1 <= curr <= prev + 2
        prev = curr
    if solver.last_compression > 0:
        solver.compress()
    X_loop = solver.X
    X_direct = solve(prob, ADI())
    assert delta(lr_to_dense(X_loop), lr_to_dense(X_direct)) < 1e-12


def test_adi_warm_start():
    prob, _, _ = make_prob(True, True, seed=50)
    X1 = solve(prob, ADI())
    obs_steps = []

    class CountObserver(dre.models.shifts.np.ndarray if False else object):
        pass

    from differentialriccatiequations_jl_tpu.utils.callbacks import Observer

    class Counter(Observer):
        def __init__(self):
            self.steps = 0

        def observe_gale_step(self, iter, X, residual, residual_norm):
            self.steps += 1

    c = Counter()
    X2 = solve(prob, ADI(), initial_guess=X1, observer=c)
    # warm start from the solution should converge immediately
    assert c.steps <= 2
    assert res_norm(prob, X2) / float(dre.lr_norm(prob.C)) < 1e-10
