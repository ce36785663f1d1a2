"""Problem and algorithm types.

Analogs of the reference's problem structs and `@kwdef` algorithm configs:

* `GALEProblem`  — ``AᵀXE + EᵀXA = −C``          (lyapunov/types.jl:3-16)
* `GDREProblem`  — ``EᵀẊE = CᵀC + AᵀXE + EᵀXA − EᵀXBBᵀXE`` (riccati/types.jl:3-20)
* `GAREProblem`  — ``Q + AᵀXE + EᵀXA − EᵀXGXE = 0``  (riccati/types.jl:41-51)

Algorithm configs are frozen (hashable) dataclasses, mirroring the
reference's composable immutable structs whose stable `hash` doubles as an
experiment cache key (lyapunov/types.jl:34-40, test/hash.jl).  The dense vs
low-rank code path is selected by the type of the data (`LowRank` vs dense
array), like the reference's dispatch on `GDREProblem{<:LDLᵀ}` vs
`{<:Matrix}` (README.md:130-132).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..lowrank import LowRank
from ..ops.operators import as_operator


class _ProblemBase:
    pass


class GALEProblem(_ProblemBase):
    """Generalized algebraic Lyapunov equation ``AᵀXE + EᵀXA = −C``."""

    def __init__(self, E, A, C):
        self.E = as_operator(E)
        self.A = as_operator(A)
        self.C = C  # LowRank or dense array

    @property
    def n(self) -> int:
        return self.E.shape[0]

    @property
    def is_lowrank(self) -> bool:
        return isinstance(self.C, LowRank)


class GDREProblem(_ProblemBase):
    """Generalized differential Riccati equation (riccati/types.jl:11-20)."""

    def __init__(self, E, A, B, C, X0, tspan):
        self.E = as_operator(E)
        self.A = as_operator(A)
        self.B = jnp.asarray(B)
        self.C = jnp.asarray(C)
        self.X0 = X0  # LowRank or dense (n, n)
        self.tspan = (float(tspan[0]), float(tspan[1]))

    @property
    def n(self) -> int:
        return self.E.shape[0]

    @property
    def is_lowrank(self) -> bool:
        return isinstance(self.X0, LowRank)


class GAREProblem(_ProblemBase):
    """Generalized continuous-time algebraic Riccati equation.

    ``G`` and ``Q`` are `LowRank` factorizations (``G = B Bᵀ`` scaled,
    ``Q = Cᵀ C``), matching the reference's supported regime
    (newton.jl:8-9).
    """

    def __init__(self, E, A, G: LowRank, Q: LowRank):
        self.E = as_operator(E)
        self.A = as_operator(A)
        self.G = G
        self.Q = Q

    @property
    def n(self) -> int:
        return self.E.shape[0]


class DRESolution:
    """GDRE trajectory: states `X`, feedbacks `K = BᵀXE`, times `t`
    (riccati/types.jl:22-39)."""

    def __init__(self, X, K, t):
        self.X = X
        self.K = K
        self.t = t


# --- time integrators (L5) ----------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Ros1:
    """First-order Rosenbrock (implicit Euler)."""

    inner_alg: Optional[object] = None


@dataclasses.dataclass(frozen=True)
class Ros2:
    """Second-order Rosenbrock (known accuracy caveat, README.md:24-25)."""

    inner_alg: Optional[object] = None


@dataclasses.dataclass(frozen=True)
class Ros3:
    pass


@dataclasses.dataclass(frozen=True)
class Ros4:
    pass


# --- Lyapunov solvers (L4) ----------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ADI:
    """Low-rank ADI (lyapunov/types.jl:20-30).  `shifts` is a strategy from
    `models.shifts`; `inner_alg=None` routes shifted solves automatically
    (dense LU / SMW / Krylov) via `ops.shifted.default_inner_alg`."""

    maxiters: int = 100
    reltol: Optional[float] = None
    abstol: Optional[float] = None
    shifts: object = None  # default Projection(2), set in __post_init__
    ignore_initial_guess: bool = False
    inner_alg: Optional[object] = None
    compression_interval: int = 10
    compression: bool = True
    warn_convergence: bool = True
    capacity: Optional[int] = None  # static storage width for X (auto if None)

    def __post_init__(self):
        if self.shifts is None:
            from .shifts import Projection

            object.__setattr__(self, "shifts", Projection(2))


@dataclasses.dataclass(frozen=True)
class BartelsStewart:
    """Dense GALE solve, fully on device via the matrix sign function.

    TPU-native replacement for the reference's LAPACK-backed
    `MatrixEquations.lyapc` (bartels-stewart.jl:3-11): generalized Schur is
    unavailable in XLA, but the sign-function Newton iteration
    (Roberts 1980 / Benner–Quintana-Ortí 1999) is pure LU + matmul — ideal
    MXU work.  Set ``host=True`` to use a SciPy host callback instead
    (oracle/testing).
    """

    maxiters: int = 40
    host: bool = False


@dataclasses.dataclass(frozen=True)
class GMRES:
    """Matrix-valued (F)GMRES on the Lyapunov operator (gmres.jl)."""

    maxiters: int = 3
    maxrestarts: int = 0
    reltol: Optional[float] = None
    abstol: Optional[float] = None
    ignore_initial_guess: bool = False
    compression: bool = True
    preconditioner: Optional[object] = None
    # Like ADI's flag (lyapunov/types.jl:29): silence the non-convergence
    # warning when a capped GMRES runs inside an inexact Newton that
    # intentionally under-solves (benchmark/benchmarks.jl:21-31).
    warn_convergence: bool = True


@dataclasses.dataclass(frozen=True)
class Kronecker:
    """Naive n² dense Kronecker solve — testing only (kronecker.jl:5-14)."""


# --- algebraic Riccati (L5') --------------------------------------------------


def superlinear_forcing(i: int, _res) -> float:
    """η = 1/(i³+1) (newton.jl:149-156)."""
    return 1.0 / (i**3 + 1)


def quadratic_forcing(_i, residual_norm: float) -> float:
    """η = min(0.1, 0.9‖res‖) (newton.jl:158-165)."""
    return min(0.1, 0.9 * float(residual_norm))


@dataclasses.dataclass(frozen=True)
class Newton:
    """(Inexact) Kleinman–Newton with line search (riccati/types.jl:95-106).

    ``inner_alg`` is positional-first, matching the reference's
    ``Newton(inner_alg; kwargs...)`` constructor (riccati/types.jl:56-57).
    """

    inner_alg: object = None  # default ADI()
    maxiters: int = 5
    reltol: Optional[float] = None
    abstol: Optional[float] = None
    inexact: bool = True
    inexact_hybrid: bool = True
    inexact_forcing: object = quadratic_forcing
    linesearch: bool = True

    def __post_init__(self):
        if self.inner_alg is None:
            object.__setattr__(self, "inner_alg", ADI())
