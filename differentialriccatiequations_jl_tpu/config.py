"""Global configuration for the TPU-native DRE framework.

The reference library (mpimd-csc/DifferentialRiccatiEquations.jl) computes in
Float64 throughout and its test tolerances (1e-10 relative residuals, see
/root/reference/test/tiny_random.jl:38) require double precision.  We therefore
enable JAX x64 mode at import.  On TPU, float64 is emulated; for raw-throughput
benchmarking of the hot kernels a float32 mode is available via
``default_dtype``.

Unlike the reference, which dispatches behavior on array types (CuArray vs
Array), device placement here is controlled by `jax.sharding` — see
``parallel/``.
"""

from __future__ import annotations

import dataclasses
import os

import jax

# Double precision is load-bearing: ADI/Newton convergence tolerances are
# ~n*eps and the oracle comparisons are at 1e-10.  Opt out with DRE_X64=0
# for raw-throughput f32 benchmarking (also: Mosaic index transforms fail to
# legalize on the TPU backend under global x64 — the Pallas kernels require
# an x32 process).
X64 = os.environ.get("DRE_X64", "1") != "0"
if X64:
    jax.config.update("jax_enable_x64", True)

# On TPU the MXU multiplies f32 operands in bfloat16 by default — fatal for
# Krylov iterations (CG on FD pencils diverges/NaNs).  Force full-precision
# f32 matmuls; override with DRE_MATMUL_PRECISION for raw-throughput runs.
jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("DRE_MATMUL_PRECISION", "highest"),
)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: Default element type for problem data and solver internals.
DEFAULT_DTYPE = jnp.float64 if X64 else jnp.float32

#: Relative truncation factor used by low-rank column compression.
#: Mirrors the reference's `100 * maximum(abs, λ) * eps()` cut
#: (/root/reference/src/LDLt.jl:217).
COMPRESSION_RTOL_FACTOR = 100.0


def default_dtype():
    return DEFAULT_DTYPE


def set_default_dtype(dtype) -> None:
    global DEFAULT_DTYPE
    DEFAULT_DTYPE = jnp.dtype(dtype)


def eps(dtype=None):
    """Machine epsilon of `dtype` (default: the configured default dtype)."""
    return float(jnp.finfo(dtype or DEFAULT_DTYPE).eps)


def register_pytree_dataclass(cls=None, *, meta_fields=()):
    """Decorator: register a ``dataclasses.dataclass`` as a JAX pytree.

    Fields listed in `meta_fields` are static (part of the treedef / hashable);
    all remaining fields are traced leaves.  This is the framework's analog of
    the reference's plain Julia structs flowing through solvers.
    """

    def wrap(c):
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in fields if f not in meta_fields]
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )

    if cls is None:
        return wrap
    return wrap(cls)
