"""Linear operators: dense, sparse-plus-low-rank, and shifted pencils.

TPU-native replacement for the reference's duck-typed matrix arguments and its
`LowRankUpdate` lazy ``A + α⁻¹UV`` (/root/reference/src/LowRankUpdate.jl).
Operators are pytrees, so they flow through jit/scan/sharding; "multiple
dispatch" becomes plain Python dispatch on pytree node types *outside* traced
code.

The central contract:

* ``op.mm(X)``   — ``A @ X``  (tall-skinny ``X``: MXU-shaped matmuls)
* ``op.tmm(X)``  — ``Aᵀ @ X``
* ``op.to_dense()``
* ``restrict(op, Q)`` — ``Qᵀ A Q`` (Stuff.jl:9, util/restrict.jl:5-8)

Dense operators cover the reference's n ≤ ~8k regime where an (n,n) matmul is
a perfect MXU workload; the block-sparse operator in `sparse.py` takes over
beyond that.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import register_pytree_dataclass


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class DenseOp:
    """Dense n×n operator."""

    M: jax.Array

    @property
    def shape(self):
        return self.M.shape

    @property
    def dtype(self):
        return self.M.dtype

    @property
    def nnz(self) -> int:
        return self.M.shape[0] * self.M.shape[1]

    def mm(self, X: jax.Array) -> jax.Array:
        return self.M @ X

    def tmm(self, X: jax.Array) -> jax.Array:
        return self.M.T @ X

    def to_dense(self) -> jax.Array:
        return self.M

    def adjoint(self) -> "DenseOp":
        return DenseOp(self.M.T)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class LowRankUpdateOp:
    """Lazy ``A + α⁻¹ U V`` with low-rank ``U (n,m)``, ``V (m,n)``.

    Analog of `LowRankUpdate` (LowRankUpdate.jl:20-27).  The reference
    materializes the sum for dense ``A`` (LowRankUpdate.jl:38); here we keep
    it lazy even for dense bases so Sherman–Morrison–Woodbury solves can
    reuse a factorization of ``A`` across Rosenbrock/Newton iterations where
    only the feedback term ``B K`` changes (the reference's key trick,
    sherman-morrison-woodbury.jl:10-47).
    """

    A: object  # base operator (DenseOp / BellOp / ...)
    alpha: jax.Array  # scalar
    U: jax.Array  # (n, m)
    V: jax.Array  # (m, n)

    @property
    def shape(self):
        return self.A.shape

    @property
    def dtype(self):
        return self.A.dtype

    def mm(self, X: jax.Array) -> jax.Array:
        return self.A.mm(X) + (1.0 / self.alpha) * (self.U @ (self.V @ X))

    def tmm(self, X: jax.Array) -> jax.Array:
        return self.A.tmm(X) + (1.0 / self.alpha) * (self.V.T @ (self.U.T @ X))

    def to_dense(self) -> jax.Array:
        return self.A.to_dense() + (1.0 / self.alpha) * (self.U @ self.V)

    def adjoint(self) -> "LowRankUpdateOp":
        # (A + α⁻¹UV)ᵀ = Aᵀ + α⁻¹ Vᵀ Uᵀ  (LowRankUpdate.jl:51-54)
        return LowRankUpdateOp(self.A.adjoint(), self.alpha, self.V.T, self.U.T)


def lr_update(A, alpha, U: jax.Array, V: jax.Array) -> LowRankUpdateOp:
    """`lr_update(A, α, U, V)` = ``A + α⁻¹UV`` (LowRankUpdate.jl:30-39)."""
    if not hasattr(A, "mm"):
        A = DenseOp(jnp.asarray(A))
    return LowRankUpdateOp(A, jnp.asarray(alpha, A.dtype), U, V)


def as_operator(A):
    """Coerce a raw array to an operator; pass operators through."""
    if hasattr(A, "mm"):
        return A
    return DenseOp(jnp.asarray(A))


def restrict(op, Q: jax.Array) -> jax.Array:
    """Galerkin projection ``Qᵀ A Q`` (small output), used by projection
    shifts (shifts/projection.jl:54-66)."""
    if isinstance(op, LowRankUpdateOp):
        core = restrict(op.A, Q)
        return core + (1.0 / op.alpha) * ((Q.T @ op.U) @ (op.V @ Q))
    if hasattr(op, "tmm"):
        return Q.T @ op.mm(Q)
    return Q.T @ (op @ Q)


def lin_comb(A, c, E):
    """Operator for ``A + c·E`` (e.g. the Rosenbrock coefficient
    ``A − E/(2τ)``, lowrank_ros1.jl:39).  Low-rank updates distribute over
    the base; dense bases combine eagerly; block-sparse bases combine on
    their shared sparsity pattern."""
    A = as_operator(A)
    E = as_operator(E)
    if isinstance(A, LowRankUpdateOp):
        return LowRankUpdateOp(lin_comb(A.A, c, E), A.alpha, A.U, A.V)
    if isinstance(A, DenseOp) and isinstance(E, DenseOp):
        return DenseOp(A.M + c * E.M)
    from .dia import DiaOp, dia_lin_comb

    if isinstance(A, DiaOp):
        return dia_lin_comb(A, c, E)
    from .sparse import bell_lin_comb

    return bell_lin_comb(A, c, E)


def scale_op(A, c):
    """Operator for ``c·A``."""
    A = as_operator(A)
    if isinstance(A, LowRankUpdateOp):
        raise TypeError("scale the base and update separately")
    if isinstance(A, DenseOp):
        return DenseOp(c * A.M)
    from .dia import DiaOp, dia_scale

    if isinstance(A, DiaOp):
        return dia_scale(A, c)
    from .sparse import bell_scale

    return bell_scale(A, c)


def operator_nnz(op) -> int:
    """Number of stored entries — the unit for nnz/s throughput metrics."""
    if isinstance(op, LowRankUpdateOp):
        return operator_nnz(op.A) + op.U.size + op.V.size
    return op.nnz


def op_astype(op, dtype):
    """Cast an operator's stored data to ``dtype`` (mixed-precision inner
    solves: the reference's `uses_mixed_precision` regime, adi.jl:23-27)."""
    dtype = jnp.dtype(dtype)
    if isinstance(op, LowRankUpdateOp):
        return LowRankUpdateOp(
            op_astype(op.A, dtype),
            op.alpha.astype(dtype),
            op.U.astype(dtype),
            op.V.astype(dtype),
        )
    if isinstance(op, DenseOp):
        return DenseOp(op.M.astype(dtype))
    from .dia import DiaOp

    if isinstance(op, DiaOp):
        return dataclasses.replace(
            op, data=op.data.astype(dtype), data_t=op.data_t.astype(dtype)
        )
    from .sparse import BellOp

    if isinstance(op, BellOp):
        return dataclasses.replace(
            op,
            data=op.data.astype(dtype),
            data_t=op.data_t.astype(dtype),
            diag_=op.diag_.astype(dtype),
        )
    raise TypeError(f"cannot cast operator {type(op)}")
