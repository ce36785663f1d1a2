"""DIA (diagonal-storage) sparse operators — the banded/stencil fast path.

The reference's matrices (Oberwolfach Rail FEM pencils; our FD surrogates,
utils/testmat.py) are *banded*: every nonzero sits on one of a handful of
structural diagonals.  Round 1 stored them block-ELL with 128×128 dense
blocks, which multiplies ~112 stored zeros per useful nonzero on a 5-point
stencil.  DIA stores exactly one vector per structural diagonal:

* ``offsets: (ndiag,)`` static ints — ``A[i, i + off_d] = data[d, i]``,
* ``data: (ndiag, n)`` — zero where ``i + off_d`` falls outside the matrix.

SpMM ``Y = A @ X`` is then ``Y[i] = Σ_d data[d, i] · X[i + off_d]`` — a
static unrolled sum of shifted elementwise multiply-adds that XLA fuses into
a single bandwidth-bound loop (no gathers, no MXU, no padding).  This is the
TPU-native analog of the reference's CSR SpMV inside its sparse LU regime
(/root/reference/src/blocklinear/backslash.jl:8-21 touches each nnz once per
solve; here each nnz is touched once per *matvec*).

Transposes store a pre-shifted copy ``data_t[d, i] = data[d, i - off_d]`` so
``AᵀX`` runs through the same kernel with negated offsets — no scatters or
index arithmetic in the hot loop (needed throughout the ADI, e.g. residual
updates adi.jl:169-171).

Scale-out: with ``mesh`` set, rows are partitioned across the 1-D device
mesh and the SpMM runs under `shard_map` with a two-`ppermute` halo exchange
of ``H = max|offset|`` boundary rows — O(H·q) bytes over ICI per product,
overlapped with the local contraction.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import register_pytree_dataclass

# Interpret-mode switch: run the Pallas kernel via the interpreter on CPU
# (production-kernel tests).  Read at trace time.
_INTERPRET = False

# Lane-block width of the Pallas kernel (tuning knob; halo overhead scales
# as 2·Hp/BN, VMEM footprint as 2·qt·(BN+2Hp)).
import os as _os

_PALLAS_BN = int(_os.environ.get("DRE_DIA_BN", "2048"))


@register_pytree_dataclass(
    meta_fields=("offsets", "n", "nnz_", "use_pallas", "mesh", "symmetric")
)
@dataclasses.dataclass(frozen=True)
class DiaOp:
    """Banded sparse matrix in diagonal storage.

    ``data``/``data_t`` may be padded beyond ``n`` (to a row multiple of the
    mesh size); padded entries are zero.  ``mesh`` (a hashable
    `jax.sharding.Mesh` or None) switches `mm`/`tmm` to the halo-exchange
    `shard_map` path.

    ``symmetric``: static tri-state structure hint set at construction
    (`dia_pencil` checks the host matrices): ``True`` ⇒ exactly symmetric,
    ``False`` ⇒ known nonsymmetric, ``None`` ⇒ unknown.  Downstream Krylov
    selection uses it — CG on the negated shifted pencil is only valid
    when the pencil is symmetric (real substitution of complex shifts on a
    nonsymmetric pencil NaN'd under CG on chip, round 5)."""

    data: jax.Array  # (ndiag, N) with N >= n
    data_t: jax.Array  # (ndiag, N): data_t[d, i] = data[d, i - offsets[d]]
    offsets: tuple  # static ints, ascending
    n: int
    nnz_: int  # structural nonzeros (csr-equivalent), set at construction
    use_pallas: bool = False
    mesh: object = None
    symmetric: object = None

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def N(self) -> int:
        return self.data.shape[1]

    @property
    def nnz(self) -> int:
        """Structural (csr-equivalent) nonzeros — the honest nnz/s unit."""
        return self.nnz_

    @property
    def nnz_stored(self) -> int:
        return self.data.size

    def diag(self) -> jax.Array:
        d0 = self.offsets.index(0) if 0 in self.offsets else None
        if d0 is None:
            return jnp.zeros((self.n,), self.dtype)
        return self.data[d0, : self.n]

    def diag_blocks(self, bs: int = 128, pad_identity: bool = True) -> jax.Array:
        """(nb, bs, bs) diagonal blocks (block-Jacobi preconditioner data).

        Couplings crossing a block boundary are dropped — standard
        block-Jacobi truncation.  ``pad_identity=False`` omits the identity
        in the padding rows (n..Np) so blocks of pencil members can be
        linearly combined (``blk(A + μE) = blk_id(A) + μ·blk_raw(E)``)
        without double-counting the regularization.
        """
        nb = -(-self.n // bs)
        Np = nb * bs
        blocks = jnp.zeros((nb, bs, bs), self.dtype)
        for d, off in enumerate(self.offsets):
            if abs(off) >= bs:
                continue
            w = jnp.pad(self.data[d, : self.n], (0, Np - self.n))
            w = w.reshape(nb, bs)
            r = np.arange(max(0, -off), bs - max(0, off))
            blocks = blocks.at[:, r, r + off].add(w[:, r])
        if pad_identity:
            # identity in the padding rows (n..Np) keeps the block LUs regular
            pad = (jnp.arange(Np).reshape(nb, bs) >= self.n).astype(self.dtype)
            r = np.arange(bs)
            blocks = blocks.at[:, r, r].add(pad)
        return blocks

    def mm(self, X: jax.Array) -> jax.Array:
        return _dia_mm(self.data, self.offsets, X, self.n,
                       self.use_pallas, self.mesh)

    def tmm(self, X: jax.Array) -> jax.Array:
        offs_t = tuple(-o for o in self.offsets)
        return _dia_mm(self.data_t, offs_t, X, self.n,
                       self.use_pallas, self.mesh)

    def mmT(self, Xt: jax.Array) -> jax.Array:
        """Lane-major SpMM: ``(A @ Xtᵀ)ᵀ`` on a ``(q, N)`` operand.

        On TPU the problem dimension must ride the 128-wide lanes: row
        shifts become cheap lane slices instead of cross-tile sublane
        relayouts (~15× on v5e).  Krylov inner solvers keep their entire
        state in this layout (ops/blocklinear.py) so the transposes happen
        once per solve, not once per SpMM.
        """
        if self.mesh is not None:
            return _dia_mm_halo(self.data, self.offsets, Xt.T, self.mesh).T
        if self.use_pallas and _on_tpu() and self.data.dtype != jnp.float64:
            return _dia_mm_pallas_t(self.data, self.offsets, Xt)
        return _dia_mm_t_xla(self.data, self.offsets, Xt)

    def mmT_axpby(self, Xt: jax.Array, Z: jax.Array, alpha, beta) -> jax.Array:
        """Fused ``α·(A @ Xtᵀ)ᵀ + β·Z`` in lane-major layout.

        On the Pallas path the epilogue is folded into the kernel (no extra
        HBM round trip after the `pallas_call` fusion barrier); on the XLA
        path the expression form lets XLA fuse it into the same streaming
        loop it already builds for the SpMM."""
        if (self.mesh is None and self.use_pallas and _on_tpu()
                and self.data.dtype != jnp.float64):
            return _dia_mm_pallas_t(self.data, self.offsets, Xt,
                                    Z=Z, coeffs=(alpha, beta))
        return alpha * self.mmT(Xt) + beta * Z

    def adjoint(self) -> "DiaOp":
        # Reverse so the (negated) offsets stay ascending.
        return DiaOp(
            data=self.data_t[::-1],
            data_t=self.data[::-1],
            offsets=tuple(-o for o in reversed(self.offsets)),
            n=self.n, nnz_=self.nnz_, use_pallas=self.use_pallas,
            mesh=self.mesh, symmetric=self.symmetric,
        )

    def to_scipy(self):
        """scipy.sparse CSR copy — host-side setup/shift helpers only.

        scipy's DIA convention indexes diagonals by *column*
        (``A[i, i+k] = data[k, i+k]``) while `DiaOp.data` indexes by row;
        the pre-shifted transpose copy ``data_t`` is exactly the column
        convention.
        """
        import scipy.sparse as sp

        data = np.asarray(self.data_t)[:, : self.n]
        return sp.dia_matrix((data, np.asarray(self.offsets, np.int64)),
                             shape=(self.n, self.n)).tocsr()

    def to_dense(self) -> jax.Array:
        n = self.n
        M = jnp.zeros((n, n), self.dtype)
        for d, off in enumerate(self.offsets):
            i0, i1 = max(0, -off), min(n, n - off)
            if i1 <= i0:
                continue
            rows = np.arange(i0, i1)
            M = M.at[rows, rows + off].add(self.data[d, i0:i1])
        return M


def _dia_mm(data, offsets, X, n, use_pallas, mesh):
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    N = data.shape[1]
    if X.shape[0] != N:
        X = jnp.pad(X, ((0, N - X.shape[0]), (0, 0)))
    if mesh is not None:
        Y = _dia_mm_halo(data, offsets, X, mesh)
    elif use_pallas and _on_tpu() and data.dtype != jnp.float64:
        Y = _dia_mm_pallas(data, offsets, X)
    else:
        Y = _dia_mm_xla(data, offsets, X)
    Y = Y[:n]
    return Y[:, 0] if squeeze else Y


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _shifted_rows(Xp, H, off, N):
    """Rows ``i + off`` of X out of the H-padded buffer (static slice)."""
    return jax.lax.slice_in_dim(Xp, H + off, H + off + N, axis=0)


def _dia_mm_xla(data, offsets, X):
    """One pad + ndiag static slices + fused multiply-adds.

    XLA fuses the whole sum into a single elementwise loop over the padded
    operand — each output row reads ndiag weights and ndiag shifted input
    rows, which is the bandwidth lower bound for this product.
    """
    N, q = X.shape
    H = max((abs(o) for o in offsets), default=0)
    Xp = jnp.pad(X, ((H, H), (0, 0)))
    out_dt = jnp.result_type(data.dtype, X.dtype)
    Y = jnp.zeros((N, q), out_dt)
    for d, off in enumerate(offsets):
        Y = Y + data[d][:, None].astype(out_dt) * _shifted_rows(
            Xp, H, off, N
        ).astype(out_dt)
    return Y


def _dia_mm_t_xla(data, offsets, Xt):
    """Lane-major XLA path: ``Y[q, i] = Σ_d w[d, i] · Xt[q, i + off_d]``.

    One aligned pad + ndiag lane-sliced multiply-adds, fused by XLA into a
    single streaming loop.  Shifts along lanes avoid the cross-tile sublane
    relayouts that make the (N, q) layout ~15× slower on TPU.
    """
    q, N = Xt.shape
    H = max((abs(o) for o in offsets), default=0)
    Xp = jnp.pad(Xt, ((0, 0), (H, H)))
    out_dt = jnp.result_type(data.dtype, Xt.dtype)
    Y = jnp.zeros((q, N), out_dt)
    for d, off in enumerate(offsets):
        Y = Y + data[d][None, :].astype(out_dt) * jax.lax.slice_in_dim(
            Xp, H + off, H + off + N, axis=1
        ).astype(out_dt)
    return Y


def _dia_mm_pallas(data, offsets, X):
    """Pallas DIA SpMM: transpose to lane-major, run the kernel, transpose
    back (use `mmT`/`_dia_mm_pallas_t` to amortize the transposes across a
    whole Krylov solve)."""
    return _dia_mm_pallas_t(data, offsets, X.T).T


def _dia_mm_pallas_t(data, offsets, Xt, Z=None, coeffs=None):
    """Pallas DIA SpMM in lane-major layout, ``Xt: (q, N) → (q, N)``.

    ``Y[:, i] = Σ_d w[d, i] · Xt[:, i + off_d]`` — the problem dimension
    rides the 128-wide lanes (shifts become lane-slices of an extended
    block), the RHS width rides the sublanes, and the diagonal weights
    broadcast over sublanes.  Pure VPU work at streaming HBM bandwidth.

    With ``Z``/``coeffs = (α, β)`` the axpby epilogue ``α·SpMM + β·Z`` is
    fused into the kernel (the scalars ride SMEM), saving the extra HBM
    round trip that a separate elementwise op would cost after the
    `pallas_call` fusion barrier.

    **Status: documented experiment, off by default.**  Measured on the v5e
    chip (q=32, n=79841, round 3): 9.7 Gnnz/s fused vs 12.1 Gnnz/s for the
    XLA lane-major path — the kernel still pays a halo-padded operand copy
    before every call (overlapping blocks are inexpressible in `BlockSpec`,
    so the operand must be re-materialized with aligned halos), while XLA
    fuses pad+SpMM+axpby into a single streaming loop at ~82% of the HBM
    roof.  Closing the gap would need manual edge-clamped DMA on both the
    input and the output so the iteration state can stay halo-padded
    persistently — parity at best for strictly more machinery, so the XLA
    path is the production default (bench.py:54-64).

    The halo-extended operand blocks overlap (stride ``BN``, width
    ``BN + 2·Hp``), which `BlockSpec` index maps cannot express, so the
    operand is DMA'd manually — **double-buffered**: VMEM scratch persists
    across (sequential) grid steps, step ``i`` waits on its own slot while
    step ``i+1``'s copy is already in flight, overlapping the HBM read with
    the compute.  The weight/output/epilogue blocks ride Mosaic's automatic
    pipeline.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiag, N = data.shape
    q = Xt.shape[0]
    qt = max(8, -(-q // 8) * 8)
    H = max((abs(o) for o in offsets), default=0)
    # Mosaic requires DMA slice offsets/widths 128-lane aligned — round the
    # halo up to the lane width (the in-register shifted reads below may be
    # unaligned; the HBM→VMEM copy may not).
    Hp = -(-H // 128) * 128
    BN = _PALLAS_BN
    while BN < 2 * Hp:
        BN *= 2
    Np = -(-N // BN) * BN
    nb = Np // BN
    fused = Z is not None

    # Halo-padded operand: (qt, Np + 2Hp) so every extended block read is an
    # in-range static-width slice.
    Xp = jnp.zeros((qt, Np + 2 * Hp), Xt.dtype)
    Xp = jax.lax.dynamic_update_slice(Xp, Xt, (0, Hp))
    Wp = jnp.pad(data, ((0, 0), (0, Np - N)))

    def kernel(*refs):
        if fused:
            ab_ref, xt_hbm, w_ref, z_ref, y_ref, xbuf, sems = refs
        else:
            xt_hbm, w_ref, y_ref, xbuf, sems = refs
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        def dma(s, blk):
            return pltpu.make_async_copy(
                xt_hbm.at[:, pl.ds(blk * BN, BN + 2 * Hp)],
                xbuf.at[s],
                sems.at[s],
            )

        @pl.when(i == 0)
        def _():
            dma(slot, i).start()

        @pl.when(i + 1 < nprog)
        def _():
            dma(nxt, i + 1).start()

        dma(slot, i).wait()
        ext = xbuf[slot]
        acc = jnp.zeros((qt, BN), y_ref.dtype)
        for d, off in enumerate(offsets):
            w = w_ref[d, :].reshape(1, BN)
            acc = acc + w * jax.lax.slice_in_dim(
                ext, Hp + off, Hp + off + BN, axis=1
            )
        if fused:
            y_ref[...] = ab_ref[0] * acc + ab_ref[1] * z_ref[...]
        else:
            y_ref[...] = acc

    in_specs = []
    operands = []
    if fused:
        # α/β ride SMEM (read once per grid step, broadcast by the VPU).
        ab = jnp.stack([jnp.asarray(coeffs[0], Xt.dtype),
                        jnp.asarray(coeffs[1], Xt.dtype)])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(ab)
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # Xp stays in HBM
        pl.BlockSpec((ndiag, BN), lambda i: (0, i)),
    ]
    operands += [Xp, Wp]
    if fused:
        Zp = jnp.zeros((qt, Np), Xt.dtype)
        Zp = jax.lax.dynamic_update_slice(Zp, Z.astype(Xt.dtype), (0, 0))
        in_specs.append(pl.BlockSpec((qt, BN), lambda i: (0, i)))
        operands.append(Zp)

    Yt = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((qt, BN), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((qt, Np), Xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, qt, BN + 2 * Hp), Xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * Np * qt,
            bytes_accessed=(ndiag * Np + 2 * Np * qt) * Xt.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(*operands)
    return Yt[:q, :N]


def _dia_mm_halo(data, offsets, X, mesh):
    """Row-sharded DIA SpMM under `shard_map` with ppermute halo exchange.

    Each shard owns ``nl = N / ndev`` rows of X/Y and the matching slice of
    every diagonal.  Neighbors exchange ``H = max|offset|`` boundary rows
    (two `ppermute`s riding ICI); the wrap-around at the global boundary is
    harmless because out-of-range diagonal weights are zero by construction.
    """
    from .. import parallel as _par  # AXIS name, avoids import cycle

    axis = _par.mesh.AXIS
    N, q = X.shape
    ndev = mesh.devices.size
    if N % ndev:
        raise ValueError(f"padded size {N} not divisible by mesh size {ndev}")
    nl = N // ndev
    H = max((abs(o) for o in offsets), default=0)
    if H > nl:
        raise ValueError(
            f"halo {H} exceeds {nl} rows per shard; use fewer devices")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
    )
    def local(data_l, X_l):
        nd = jax.lax.axis_size(axis)
        fwd = [(i, (i + 1) % nd) for i in range(nd)]
        bwd = [(i, (i - 1) % nd) for i in range(nd)]
        from_prev = jax.lax.ppermute(X_l[-H:], axis, fwd)
        from_next = jax.lax.ppermute(X_l[:H], axis, bwd)
        X_ext = jnp.concatenate([from_prev, X_l, from_next], axis=0)
        out_dt = jnp.result_type(data_l.dtype, X_l.dtype)
        Y = jnp.zeros((X_l.shape[0], X_l.shape[1]), out_dt)
        for d, off in enumerate(offsets):
            Y = Y + data_l[d][:, None].astype(out_dt) * jax.lax.slice_in_dim(
                X_ext, H + off, H + off + X_l.shape[0], axis=0
            ).astype(out_dt)
        return Y

    return local(data, X)


# --- construction (host side) -------------------------------------------------


def _dia_arrays(M_csr, offsets, n, N, dtype):
    """Scatter CSR entries into (ndiag, N) diagonal storage (vectorized)."""
    coo = M_csr.tocoo()
    coo.sum_duplicates()
    diff = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    off_arr = np.asarray(offsets, np.int64)
    d_idx = np.searchsorted(off_arr, diff)
    if (d_idx >= len(off_arr)).any() or (off_arr[d_idx] != diff).any():
        raise ValueError("matrix entry outside the supplied diagonal set")
    data = np.zeros((len(offsets), N), dtype)
    data[d_idx, coo.row] = coo.data.astype(dtype)
    data_t = np.zeros_like(data)
    for d, off in enumerate(offsets):
        if off >= 0:
            data_t[d, off:] = data[d, : N - off] if off else data[d]
        else:
            data_t[d, : N + off] = data[d, -off:]
    return data, data_t


def dia_offsets(M) -> tuple:
    """The set of structurally nonzero diagonals of a scipy sparse matrix."""
    coo = M.tocoo()
    return tuple(
        int(o) for o in np.unique(coo.col.astype(np.int64) - coo.row)
    )


def _scipy_symmetric(M) -> bool:
    """Exact symmetry of a host sparse matrix (setup-time, O(nnz))."""
    d = (M - M.T).tocoo()
    return bool(d.nnz == 0 or np.all(d.data == 0))


def dia_from_scipy(M, dtype=None, offsets=None, use_pallas: bool = False,
                   mesh=None, pad_to: int = 1) -> DiaOp:
    """Convert a scipy sparse matrix to `DiaOp` (host-side, setup only).

    ``pad_to``: pad the row dimension to a multiple (mesh shard size).
    """
    import scipy.sparse as sp

    M = sp.csr_matrix(M)
    n = M.shape[0]
    dtype = dtype or M.dtype
    offs = tuple(offsets) if offsets is not None else dia_offsets(M)
    N = -(-n // pad_to) * pad_to
    data, data_t = _dia_arrays(M, offs, n, N, dtype)
    return DiaOp(data=jnp.asarray(data), data_t=jnp.asarray(data_t),
                 offsets=offs, n=n, nnz_=int(M.nnz), use_pallas=use_pallas,
                 mesh=mesh, symmetric=_scipy_symmetric(M))


def dia_pencil(E, A, dtype=None, use_pallas: bool = False, mesh=None,
               pad_to: int = 1):
    """Build (E_op, A_op) on the **union** diagonal set so shifted combines
    ``A + cE`` are pure data arithmetic (the ADI hot path; the analog of
    `ops.sparse.bell_pencil`)."""
    import scipy.sparse as sp

    E = sp.csr_matrix(E)
    A = sp.csr_matrix(A)
    U = ((E != 0) + (A != 0)).tocsr()
    offs = dia_offsets(U)
    nnz_union = int(U.nnz)
    E_op = dia_from_scipy(E, dtype, offsets=offs, use_pallas=use_pallas,
                          mesh=mesh, pad_to=pad_to)
    A_op = dia_from_scipy(A, dtype, offsets=offs, use_pallas=use_pallas,
                          mesh=mesh, pad_to=pad_to)
    E_op = dataclasses.replace(E_op, nnz_=nnz_union)
    A_op = dataclasses.replace(A_op, nnz_=nnz_union)
    return E_op, A_op


def is_banded(M, max_diags: int = 64) -> bool:
    """Heuristic: is DIA storage efficient for this matrix?"""
    try:
        return len(dia_offsets(M)) <= max_diags
    except Exception:  # pragma: no cover
        return False


# --- algebra on shared diagonal sets -------------------------------------------


def _same_pattern(a: DiaOp, b: DiaOp) -> bool:
    return a.offsets == b.offsets and a.n == b.n and a.N == b.N


def dia_lin_comb(A: DiaOp, c, E: DiaOp) -> DiaOp:
    """``A + c·E`` for diagonal-set-sharing operators (see `dia_pencil`)."""
    if not _same_pattern(A, E):
        raise ValueError("dia_lin_comb requires operators sharing a diagonal "
                         "set (build them with dia_pencil)")
    c = jnp.asarray(c)
    dt = jnp.result_type(A.dtype, c.dtype)
    return DiaOp(
        data=A.data.astype(dt) + c * E.data.astype(dt),
        data_t=A.data_t.astype(dt) + c * E.data_t.astype(dt),
        offsets=A.offsets, n=A.n, nnz_=A.nnz_, use_pallas=A.use_pallas,
        mesh=A.mesh,
        symmetric=(True if (A.symmetric is True and E.symmetric is True)
                   else (False if (A.symmetric is False
                                   or E.symmetric is False) else None)),
    )


def dia_scale(A: DiaOp, c) -> DiaOp:
    c = jnp.asarray(c)
    dt = jnp.result_type(A.dtype, c.dtype)
    return DiaOp(data=c * A.data.astype(dt), data_t=c * A.data_t.astype(dt),
                 offsets=A.offsets, n=A.n, nnz_=A.nnz_,
                 use_pallas=A.use_pallas, mesh=A.mesh,
                 symmetric=A.symmetric)


def shifted_dia(E: DiaOp, A: DiaOp, mu) -> DiaOp:
    """Operator ``Aᵀ + μEᵀ`` as a `DiaOp` (fused data combine)."""
    return dia_lin_comb(A.adjoint(), mu, E.adjoint())


@register_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class DiaPairOp:
    """All-real stacked form of the complex shifted operator ``F + i·b·Eᵀ``
    (``F = Aᵀ + a·Eᵀ``, shift ``μ = a + b·i``) — the TPU-native ADI double
    step (SURVEY.md §7 item 4; reference complex double step
    adi.jl:181-225).

    XLA:TPU never finishes compiling the complex64 ADI while-loop, so the
    single complex solve of the double step is reformulated over ℝ: the
    complex system ``(F + i·bEᵀ)(Vr + i·Vi) = W`` is the real 2n block
    system ``[[F, −bEᵀ], [bEᵀ, F]] [Vr; Vi] = [W; 0]``.  States stay in the
    lane-major Krylov layout with real and imaginary parts **stacked along
    the lane (q) axis** — ``(2q, N)`` — so each application is four real
    DIA SpMMs (identical FLOPs/HBM traffic to one complex SpMM) and the
    while-loop stays all-real.
    """

    F: DiaOp  # Aᵀ + a·Eᵀ (real part of the shifted operator)
    Et: DiaOp  # Eᵀ
    b: jax.Array  # imaginary part of the shift (scalar)

    @property
    def dtype(self):
        return self.F.dtype

    @property
    def N(self) -> int:
        return self.F.N

    @property
    def shape(self):
        return (2 * self.F.n, 2 * self.F.n)

    def mmT(self, Xt: jax.Array) -> jax.Array:
        q = Xt.shape[0] // 2
        Xr, Xi = Xt[:q], Xt[q:]
        b = jnp.asarray(self.b, Xt.dtype)
        return jnp.concatenate([
            self.F.mmT(Xr) - b * self.Et.mmT(Xi),
            b * self.Et.mmT(Xr) + self.F.mmT(Xi),
        ])

    def mm(self, X: jax.Array) -> jax.Array:
        """Column-stacked form: ``X`` is ``(n, 2q)`` with real | imag
        column blocks (used by iterative refinement, blocklinear.py)."""
        q = X.shape[1] // 2
        Xr, Xi = X[:, :q], X[:, q:]
        b = jnp.asarray(self.b, X.dtype)
        return jnp.concatenate([
            self.F.mm(Xr) - b * self.Et.mm(Xi),
            b * self.Et.mm(Xr) + self.F.mm(Xi),
        ], axis=1)
