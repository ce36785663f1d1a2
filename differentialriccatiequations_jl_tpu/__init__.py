"""TPU-native framework for large-scale (differential) Riccati equations.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
mpimd-csc/DifferentialRiccatiEquations.jl (reference mounted read-only at
/root/reference — cited by file:line throughout).  See SURVEY.md for the
layer map and build plan.

Public API mirrors the reference's CommonSolve verbs::

    from differentialriccatiequations_jl_tpu import (
        GDREProblem, GALEProblem, GAREProblem, solve,
        Ros1, Ros2, Ros3, Ros4, ADI, Newton, GMRES,
        lowrank, lr_compress,
    )

    sol = solve(GDREProblem(E, A, B, C, X0, (t0, tf)), Ros1(), dt=-10.0)
"""

from . import config  # noqa: F401  (enables x64 as a side effect)

from .lowrank import (
    LowRank,
    lowrank,
    lr_zero,
    lr_add,
    lr_sub,
    lr_scale,
    lr_neg,
    lr_norm,
    lr_dot,
    lr_rank,
    lr_compress,
    lr_to_dense,
    lr_with_capacity,
)
from .ops import (
    DenseOp,
    LowRankUpdateOp,
    lr_update,
    as_operator,
    BlockLinearProblem,
    Backslash,
    ShermanMorrisonWoodbury,
    Krylov,
    solve_blocklinear,
)
from .models import (
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
    Parareal,
    solve_gdre_parareal,
    solve,
    init,
    residual,
)
from .models import shifts as Shifts

__all__ = [
    "LowRank", "lowrank", "lr_zero", "lr_add", "lr_sub", "lr_scale", "lr_neg",
    "lr_norm", "lr_dot", "lr_rank", "lr_compress", "lr_to_dense",
    "lr_with_capacity",
    "DenseOp", "LowRankUpdateOp", "lr_update", "as_operator",
    "BlockLinearProblem", "Backslash", "ShermanMorrisonWoodbury", "Krylov",
    "solve_blocklinear",
    "GALEProblem", "GDREProblem", "GAREProblem", "DRESolution",
    "ADI", "BartelsStewart", "GMRES", "Kronecker", "Newton",
    "Ros1", "Ros2", "Ros3", "Ros4", "Parareal", "solve_gdre_parareal",
    "solve", "init", "residual", "Shifts",
]

__version__ = "0.1.0"
