"""Block linear solvers: ``A X = B`` with multiple right-hand sides.

TPU-native layer L2 (see SURVEY.md §1), replacing the reference's
`blocklinear/` (types.jl, backslash.jl, sherman-morrison-woodbury.jl).

Differences forced by the hardware:

* The reference's workhorse `Backslash` is a *sparse LU* — unavailable on
  TPU.  Here `Backslash` is a dense LU on device (MXU-friendly for the
  n ≤ ~8k regime) and `Krylov` is the matrix-free path for block-sparse
  operators (jax.scipy BiCGStab/CG/GMRES with Jacobi preconditioning).
* Factorizations are explicit *prepared solver* pytrees so one LU is reused
  across all right-hand sides and across outer iterations — the analog of
  the reference's `init`/`solve!` solver caching (blocklinear/types.jl:15-30).

`ShermanMorrisonWoodbury` solves ``(A + α⁻¹UV)X = B`` with two base solves
and one small dense solve, caching ``A⁻¹U`` and the Schur complement
``S = αI + V A⁻¹U`` (sherman-morrison-woodbury.jl:10-47).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import register_pytree_dataclass
from .operators import DenseOp, LowRankUpdateOp, as_operator


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class BlockLinearProblem:
    """``A X = B`` (blocklinear/types.jl:10-13)."""

    A: object
    B: jax.Array


# --- algorithm configs (static, hashable — analog of Julia's @kwdef structs) --


@dataclasses.dataclass(frozen=True)
class Backslash:
    """Direct dense solve via LU factorization on device."""


@dataclasses.dataclass(frozen=True)
class ShermanMorrisonWoodbury:
    """SMW for `LowRankUpdateOp` coefficients: ``(A + α⁻¹UV)X = B``.

    `outer` solves against the base operator (the reference's ``ALG``),
    `inner` the small dense Schur complement (the reference's ``alg``).
    """

    outer: object = Backslash()
    inner: object = Backslash()


@dataclasses.dataclass(frozen=True)
class Krylov:
    """Matrix-free iterative solve (for block-sparse operators).

    method: "bicgstab" (general), "cg" (symmetric definite), "gmres".
    preconditioner: "jacobi" (diagonal) or "block_jacobi" (batched LU of
    the bs×bs diagonal blocks — the natural TPU preconditioner: one
    vmapped triangular solve pair per application).
    negate: solve ``(−A)X = −B`` — lets CG run on symmetric *negative*
    definite shifted coefficients ``Aᵀ + μEᵀ`` (A stable, μ < 0).
    """

    method: str = "bicgstab"
    tol: float = 1e-12
    atol: float = 0.0
    maxiter: int = 1000
    restart: int = 40  # gmres only
    preconditioner: str = "jacobi"
    negate: bool = False
    # Mixed precision (the reference's `uses_mixed_precision` regime,
    # adi.jl:23-27): run the Krylov core in `solve_dtype` (e.g. "float32" on
    # TPU, where f64 is software-emulated), recover full-dtype accuracy with
    # `refine_iters` sweeps of iterative refinement on the residual.
    solve_dtype: str | None = None
    refine_iters: int = 2


# --- prepared solvers (pytrees) ----------------------------------------------


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class DenseLUSolver:
    lu: jax.Array
    piv: jax.Array

    def solve(self, B: jax.Array) -> jax.Array:
        B = jnp.asarray(B, self.lu.dtype)
        return jsl.lu_solve((self.lu, self.piv), B)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class DenseQRSolver:
    """Small dense solver through Householder QR (``x = R⁻¹Qᵀb``).

    The f64-on-TPU stand-in for `DenseLUSolver`: XLA:TPU's LuDecomposition
    only implements F32/C64 (the expander raises on f64 operands), while
    its square f64 QR is accurate (~3e-14 recon at 96×96, measured v5e).
    """

    q: jax.Array  # (m, m)
    r: jax.Array  # (m, m) upper triangular

    def solve(self, B: jax.Array) -> jax.Array:
        B = jnp.asarray(B, self.q.dtype)
        return jsl.solve_triangular(self.r, self.q.T @ B, lower=False)


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SMWSolver:
    """Cached SMW pieces: base solver, ``A⁻¹U``, factored Schur complement."""

    base: object  # prepared solver for A
    AinvU: jax.Array  # (n, m)
    V: jax.Array  # (m, n)
    schur: object  # prepared solver for S = αI + V A⁻¹U

    def solve(self, B: jax.Array) -> jax.Array:
        from ..utils.timers import timeit

        with timeit("smw.solve"):
            AinvB = self.base.solve(B)
            t = self.schur.solve(self.V @ AinvB)
            return AinvB - self.AinvU @ t


def _block_apply(inv: jax.Array, x: jax.Array) -> jax.Array:
    """Apply ``(nb, bs, bs)`` block inverses to column-major ``(n, q)``."""
    nb, bs, _ = inv.shape
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, q = x.shape
    xp = jnp.pad(x, ((0, nb * bs - n), (0, 0))).reshape(nb, bs, q)
    y = jnp.einsum("nab,nbq->naq", inv, xp, preferred_element_type=x.dtype)
    y = y.reshape(nb * bs, q)[:n]
    return y[:, 0] if squeeze else y


def _block_apply_t(inv: jax.Array, xt: jax.Array) -> jax.Array:
    """Apply ``(nb, bs, bs)`` block inverses in lane-major ``(q, N)``."""
    q, N = xt.shape
    nb, bs, _ = inv.shape
    xp = jnp.pad(xt, ((0, 0), (0, nb * bs - N)))
    xb = xp.reshape(q, nb, bs)
    y = jnp.einsum("nab,qnb->qna", inv, xb, preferred_element_type=xt.dtype)
    return y.reshape(q, nb * bs)[:, :N]


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class PairBlockPrec:
    """Block-Jacobi preconditioner of a *complex* shifted operator in
    stacked-real form: ``M⁻¹ = P + i·Q`` applied to lane-stacked real/imag
    states (see `ops.dia.DiaPairOp`).  ``re``/``im`` hold the (nb, bs, bs)
    real and imaginary parts of the complex block inverses."""

    re: jax.Array
    im: jax.Array

    def apply_t(self, xt: jax.Array) -> jax.Array:
        q = xt.shape[0] // 2
        xr, xi = xt[:q], xt[q:]
        return jnp.concatenate([
            _block_apply_t(self.re, xr) - _block_apply_t(self.im, xi),
            _block_apply_t(self.im, xr) + _block_apply_t(self.re, xi),
        ])

    def apply(self, x: jax.Array) -> jax.Array:
        q = x.shape[1] // 2
        xr, xi = x[:, :q], x[:, q:]
        return jnp.concatenate([
            _block_apply(self.re, xr) - _block_apply(self.im, xi),
            _block_apply(self.im, xr) + _block_apply(self.re, xi),
        ], axis=1)


@register_pytree_dataclass(meta_fields=("cfg",))
@dataclasses.dataclass(frozen=True)
class KrylovSolver:
    op: object
    prec: object  # Jacobi diag (n,), block inverses (nb, bs, bs), or
    #               a PairBlockPrec (stacked-real complex blocks)
    cfg: Krylov

    def _apply_prec(self, x: jax.Array) -> jax.Array:
        if hasattr(self.prec, "apply"):
            return self.prec.apply(x)
        if self.prec.ndim == 3:
            # Explicit block inverses applied as one batched matmul — MXU
            # work instead of the sequential batched triangular solves an
            # (lu, piv) representation would cost *per Krylov iteration*
            # (the inversion itself happens once, at `prepare` time).
            return _block_apply(self.prec, x)
        pinv = 1.0 / self.prec
        return pinv[:, None] * x if x.ndim == 2 else pinv * x

    def _apply_prec_t(self, xt: jax.Array) -> jax.Array:
        """Preconditioner in lane-major ``(q, N)`` layout (see `mmT`)."""
        if hasattr(self.prec, "apply_t"):
            return self.prec.apply_t(xt)
        q, N = xt.shape
        if self.prec.ndim == 3:
            return _block_apply_t(self.prec, xt)
        pinv = 1.0 / self.prec
        if pinv.shape[0] < N:  # diag is length n; padding rows act as I
            pinv = jnp.concatenate(
                [pinv, jnp.ones((N - pinv.shape[0],), pinv.dtype)])
        return pinv[None, :] * xt

    def solve(self, B: jax.Array) -> jax.Array:
        from jax.scipy.sparse import linalg as spla

        cfg = self.cfg
        # Scale-invariance guard: normalize the RHS so low-precision cores
        # (solve_dtype="float32") never see denormal/cancellation-prone
        # magnitudes — iterative-refinement residuals shrink by ~cfg.tol per
        # sweep and would otherwise hit sporadic CG breakdowns.
        nrm = jnp.linalg.norm(B)
        scale = jnp.where(nrm > 0, nrm, 1.0).astype(B.dtype)
        B = B / scale
        # Lane-major fast path (TPU): keep the whole Krylov iteration in
        # (q, N) layout so row shifts in the SpMM ride lanes and the
        # transposes happen once per solve, not once per matvec (~15× on
        # banded operators; see DiaOp.mmT).
        lane_major = hasattr(self.op, "mmT") and B.ndim == 2
        if lane_major:
            n_rows = B.shape[0]
            Nfull = self.op.N
            B = jnp.pad(B.T, ((0, 0), (0, Nfull - n_rows)))
            base_mv, base_prec = self.op.mmT, self._apply_prec_t
        else:
            base_mv, base_prec = self.op.mm, self._apply_prec
        if cfg.negate:
            mv = lambda x: -base_mv(x)
            B = -B
            precond = lambda x: -base_prec(x)
        else:
            mv = base_mv
            precond = base_prec
        if cfg.method == "cg":
            x, _ = spla.cg(mv, B, tol=cfg.tol, atol=cfg.atol,
                           maxiter=cfg.maxiter, M=precond)
        elif cfg.method == "gmres":
            x, _ = spla.gmres(mv, B, tol=cfg.tol, atol=cfg.atol,
                              maxiter=cfg.maxiter, restart=cfg.restart,
                              M=precond, solve_method="batched")
        else:
            x, _ = spla.bicgstab(mv, B, tol=cfg.tol, atol=cfg.atol,
                                 maxiter=cfg.maxiter, M=precond)
        if lane_major:
            x = x[:, :n_rows].T
        return x * scale


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class PairSMWSolver:
    """SMW correction for a *complex-shifted* closed-loop coefficient in
    stacked-real form: solves ``(M + α⁻¹UV)X = B`` where ``M`` is the
    complex shifted operator represented by a stacked-real ``base`` solver
    (`ops.dia.DiaPairOp` system) and ``U``/``V``/``α`` are real.

    All small dense algebra runs on the real/imag column blocks:
    ``A⁻¹U = P + iQ`` (one extra stacked solve at wrap time), Schur
    complement ``S = αI + V(P + iQ)`` factored as the real 2m×2m block
    ``[[Sr, −Si], [Si, Sr]]``.  Interfaces match `SMWSolver.solve` on
    ``(n, 2q)`` column-stacked operands."""

    base: object  # stacked-real pair solver for M
    AinvU_re: jax.Array  # (n, m)
    AinvU_im: jax.Array  # (n, m)
    V: jax.Array  # (m, n)
    schur: object  # prepared solver for the real 2m×2m block form of S

    def solve(self, B: jax.Array) -> jax.Array:
        q = B.shape[1] // 2
        AinvB = self.base.solve(B)
        Rr, Ri = AinvB[:, :q], AinvB[:, q:]
        t = self.schur.solve(
            jnp.concatenate([self.V @ Rr, self.V @ Ri], axis=0))
        m = self.V.shape[0]
        tr, ti = t[:m], t[m:]
        return jnp.concatenate([
            Rr - (self.AinvU_re @ tr - self.AinvU_im @ ti),
            Ri - (self.AinvU_re @ ti + self.AinvU_im @ tr),
        ], axis=1)


@register_pytree_dataclass(meta_fields=("iters",))
@dataclasses.dataclass(frozen=True)
class RefinedKrylovSolver:
    """Mixed-precision iterative refinement around a low-dtype Krylov core.

    ``x₀ = solve_lo(B)``; then ``iters`` sweeps of ``x += solve_lo(B − A·x)``
    with the residual evaluated against the full-precision operator.  This is
    how the f32 Pallas/MXU kernels serve the reference's 1e-10 f64 residual
    tolerances on TPU (mixed-precision awareness, adi.jl:23-27).
    """

    op_hi: object  # full-precision operator
    inner: object  # prepared KrylovSolver on the low-dtype operator
    iters: int

    def solve(self, B: jax.Array) -> jax.Array:
        lo = self.inner.op.dtype
        hi = jnp.result_type(self.op_hi.dtype, B.dtype)
        B = B.astype(hi)
        x = self.inner.solve(B.astype(lo)).astype(hi)

        def body(_, x):
            r = B - self.op_hi.mm(x)
            return x + self.inner.solve(r.astype(lo)).astype(hi)

        return jax.lax.fori_loop(0, self.iters, body, x)


def block_jacobi_inverses(blocks: jax.Array) -> jax.Array:
    """Explicit inverses of the ``(nb, bs, bs)`` diagonal blocks.

    A *preconditioner* does not need backward-stable application, so the
    blocks are inverted once here (batched LU at setup) and applied as a
    single batched matmul per Krylov iteration — MXU throughput instead of
    the 2·bs-step sequential triangular solves that `lu_solve` costs on TPU.
    Real blocks are symmetrized so CG sees an (numerically) SPD M⁻¹.
    """
    inv = jnp.linalg.inv(blocks)
    if not jnp.iscomplexobj(inv):
        inv = 0.5 * (inv + jnp.swapaxes(inv, -1, -2))
    return inv


def _extract_diag(op) -> jax.Array:
    if isinstance(op, LowRankUpdateOp):
        base = _extract_diag(op.A)
        return base + (1.0 / op.alpha) * jnp.einsum("ij,ji->i", op.U, op.V)
    if isinstance(op, DenseOp):
        return jnp.diagonal(op.M)
    return op.diag()  # sparse ops implement .diag()


def prepare(A, alg) -> object:
    """Build a prepared (factored) solver for operator ``A`` under ``alg``.

    Analog of `CommonSolve.init(::BlockLinearProblem, alg)`.
    """
    A = as_operator(A)
    if isinstance(alg, Backslash):
        if isinstance(A, LowRankUpdateOp):
            # A direct solve of a lazy update materializes; prefer SMW.
            return prepare(A, ShermanMorrisonWoodbury())
        M = A.to_dense()
        from .dia import _on_tpu

        if M.dtype == jnp.float64 and _on_tpu():
            # XLA:TPU LuDecomposition implements F32/C64 only — f64 dense
            # solves (e.g. the SMW Schur complement on the mixed-precision
            # chip path) go through Householder QR instead.
            q, r = jnp.linalg.qr(M)
            return DenseQRSolver(q=q, r=r)
        lu, piv = jsl.lu_factor(M)
        return DenseLUSolver(lu=lu, piv=piv)
    if isinstance(alg, ShermanMorrisonWoodbury):
        if not isinstance(A, LowRankUpdateOp):
            raise TypeError("SMW requires a LowRankUpdateOp coefficient")
        base = prepare(A.A, alg.outer)
        AinvU = base.solve(A.U)
        m = A.U.shape[1]
        S = A.alpha * jnp.eye(m, dtype=AinvU.dtype) + A.V @ AinvU
        schur = prepare(DenseOp(S), alg.inner)
        return SMWSolver(base=base, AinvU=AinvU, V=A.V, schur=schur)
    if isinstance(alg, Krylov):
        if alg.solve_dtype is not None:
            lo = jnp.dtype(alg.solve_dtype)
            if jnp.iscomplexobj(jnp.zeros((), A.dtype)):
                lo = jnp.result_type(lo, jnp.complex64)
            if lo != A.dtype:
                from .operators import op_astype

                inner = prepare(
                    op_astype(A, lo), dataclasses.replace(alg, solve_dtype=None)
                )
                return RefinedKrylovSolver(op_hi=A, inner=inner,
                                           iters=alg.refine_iters)
        if alg.preconditioner == "block_jacobi" and hasattr(A, "diag_blocks"):
            prec = block_jacobi_inverses(A.diag_blocks())
        else:
            prec = _extract_diag(A)
        return KrylovSolver(op=A, prec=prec, cfg=alg)
    raise TypeError(f"unknown block linear algorithm {alg!r}")


def solve_blocklinear(A, B: jax.Array, alg=Backslash()) -> jax.Array:
    """One-shot ``solve(BlockLinearProblem(A, B), alg)``."""
    return prepare(A, alg).solve(B)
