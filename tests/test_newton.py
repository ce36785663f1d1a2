"""Newton-ADI GARE tests — the rail.jl Newton analog (test/rail.jl:74-88)."""

import numpy as np
import pytest

import differentialriccatiequations_jl_tpu as dre
from differentialriccatiequations_jl_tpu import ADI, GAREProblem, Newton, lowrank, solve
from differentialriccatiequations_jl_tpu.models import residual
from differentialriccatiequations_jl_tpu.models.problems import superlinear_forcing
from differentialriccatiequations_jl_tpu.models.shifts import Cyclic, Heuristic, Projection
from differentialriccatiequations_jl_tpu.utils.testmat import rail_surrogate_dense

N = 40
E, A, B, C = rail_surrogate_dense(N)
G = lowrank(np.asarray(B))
Q = lowrank(np.asarray(C).T)
ARE = GAREProblem(E, A, G, Q)
RELTOL = 1e-10


@pytest.mark.parametrize(
    "adi_kwargs",
    [
        dict(shifts=Projection(2)),  # may produce complex shifts
        dict(shifts=Cyclic(Heuristic(10, 20, 20)), maxiters=200),
    ],
    ids=["projection", "penzl"],
)
def test_newton_adi(adi_kwargs):
    adi = ADI(ignore_initial_guess=True, **adi_kwargs)
    newton = Newton(inner_alg=adi, maxiters=10, reltol=RELTOL)
    X = solve(ARE, newton)
    res = float(dre.lr_norm(residual(ARE, X)))
    assert res < RELTOL * float(dre.lr_norm(Q))

    # cross-check against the dense residual formula (riccati/residual.jl:54-66)
    Xd = np.asarray(dre.lr_to_dense(X))
    from differentialriccatiequations_jl_tpu.models.residuals import residual_gare_dense

    resd = np.linalg.norm(np.asarray(residual_gare_dense(E, A, G, Q, Xd)))
    assert resd < 10 * RELTOL * float(dre.lr_norm(Q))


def test_newton_superlinear_forcing_and_observer():
    from differentialriccatiequations_jl_tpu.utils.callbacks import Observer

    class Rec(Observer):
        def __init__(self):
            self.norms = []
            self.meta = []

        def observe_gare_step(self, i, X, res, rn):
            self.norms.append(rn)

        def observe_gare_metadata(self, desc, md):
            self.meta.append((desc, md))

    rec = Rec()
    newton = Newton(
        inner_alg=ADI(ignore_initial_guess=True, shifts=Projection(2)),
        maxiters=12,
        reltol=RELTOL,
        inexact_forcing=superlinear_forcing,
    )
    X = solve(ARE, newton, observer=rec)
    assert rec.norms[-1] < RELTOL * float(dre.lr_norm(Q))
    assert rec.norms[-1] < rec.norms[0]
    assert any(d == "inexact" for d, _ in rec.meta)


def test_newton_fgmres():
    """Newton with an FGMRES(ADI-preconditioner) inner solver — the
    reference's second benchmark family (benchmark/benchmarks.jl:21-31)."""
    from differentialriccatiequations_jl_tpu import GMRES

    t = 8
    gmres = GMRES(
        maxiters=5,
        maxrestarts=0,
        ignore_initial_guess=True,
        # the inexact Newton intentionally under-solves inner GALEs
        warn_convergence=False,
        preconditioner=ADI(
            maxiters=t,
            shifts=Cyclic(Heuristic(t, t, t)),
            compression_interval=2 * t,
            warn_convergence=False,
        ),
    )
    newton = Newton(gmres, maxiters=12, reltol=RELTOL)
    X = solve(ARE, newton)
    res = float(dre.lr_norm(residual(ARE, X)))
    assert res < RELTOL * float(dre.lr_norm(Q))


def test_newton_rejects_nonidentity_inner():
    Gbad = lowrank(np.asarray(B), 2.0 * np.eye(B.shape[1]))
    with pytest.raises(NotImplementedError):
        solve(GAREProblem(E, A, Gbad, Q), Newton())
