"""Solver dispatch: the `init`/`solve` verbs of the reference's CommonSolve
surface (DifferentialRiccatiEquations.jl:78-102)."""

from __future__ import annotations

from ..lowrank import LowRank, lowrank, lr_compress
from .problems import (
    GALEProblem,
    GDREProblem,
    GAREProblem,
    DRESolution,
    ADI,
    BartelsStewart,
    GMRES,
    Kronecker,
    Newton,
    Ros1,
    Ros2,
    Ros3,
    Ros4,
    quadratic_forcing,
    superlinear_forcing,
)
from .residuals import residual
from .adi import ADISolver, solve_gale_adi
from .gmres import solve_gale_gmres
from .lyapunov_dense import (
    solve_gale_dense,
    solve_gale_host,
    solve_gale_kronecker,
    sign_function_cache,
)
from .newton import solve_gare_newton
from .rosenbrock_dense import solve_gdre_dense
from .rosenbrock_lowrank import (
    solve_gdre_lowrank_ros1,
    solve_gdre_lowrank_ros2,
    feedback_K,
)
from .parareal import Parareal, solve_gdre_parareal
from . import shifts


def _dense_C(C):
    return C.to_dense() if isinstance(C, LowRank) else C


def solve(prob, alg, **kwargs):
    """`solve(prob, alg; kwargs...)` — dispatch on problem/algorithm/data."""
    if isinstance(prob, GALEProblem):
        if isinstance(alg, ADI):
            return solve_gale_adi(prob, alg, **kwargs)
        if isinstance(alg, GMRES):
            return solve_gale_gmres(prob, alg, **kwargs)
        if isinstance(alg, BartelsStewart):
            kwargs.pop("observer", None)
            Cd = _dense_C(prob.C)
            if alg.host:
                return solve_gale_host(prob.E, prob.A, Cd)
            return solve_gale_dense(prob.E, prob.A, Cd, alg.maxiters)
        if isinstance(alg, Kronecker):
            kwargs.pop("observer", None)
            return solve_gale_kronecker(
                prob.E.to_dense(), prob.A.to_dense(), _dense_C(prob.C)
            )
        raise TypeError(f"no GALE solver for {alg!r}")
    if isinstance(prob, GAREProblem):
        if isinstance(alg, Newton):
            return solve_gare_newton(prob, alg, **kwargs)
        raise TypeError(f"no GARE solver for {alg!r}")
    if isinstance(prob, GDREProblem):
        if prob.is_lowrank:
            if isinstance(alg, Parareal):
                return solve_gdre_parareal(prob, alg=alg, **kwargs)
            if isinstance(alg, Ros1):
                return solve_gdre_lowrank_ros1(prob, alg, **kwargs)
            if isinstance(alg, Ros2):
                return solve_gdre_lowrank_ros2(prob, alg, **kwargs)
            raise TypeError(
                f"low-rank GDRE supports Ros1/Ros2 (README.md:130-132), got {alg!r}"
            )
        if isinstance(alg, (Ros1, Ros2, Ros3, Ros4)):
            return solve_gdre_dense(prob, alg, **kwargs)
        raise TypeError(f"no GDRE integrator for {alg!r}")
    raise TypeError(f"no solver for problem {type(prob)}")


def init(prob, alg, **kwargs):
    """`init(prob, alg)` — resumable solver object (currently: ADI on GALE,
    adi.jl:91-95)."""
    if isinstance(prob, GALEProblem) and isinstance(alg, ADI):
        return ADISolver(prob, alg, **kwargs)
    raise TypeError(f"init not supported for ({type(prob)}, {type(alg)})")


__all__ = [
    "GALEProblem", "GDREProblem", "GAREProblem", "DRESolution",
    "ADI", "BartelsStewart", "GMRES", "Kronecker", "Newton",
    "Ros1", "Ros2", "Ros3", "Ros4",
    "quadratic_forcing", "superlinear_forcing",
    "residual", "solve", "init",
    "ADISolver", "solve_gale_adi", "solve_gale_gmres",
    "solve_gale_dense", "solve_gale_host", "solve_gale_kronecker",
    "sign_function_cache", "solve_gare_newton",
    "solve_gdre_dense", "solve_gdre_lowrank_ros1", "solve_gdre_lowrank_ros2",
    "Parareal", "solve_gdre_parareal",
    "feedback_K", "shifts", "lowrank", "lr_compress",
]
