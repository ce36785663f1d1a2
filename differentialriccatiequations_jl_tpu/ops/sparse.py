"""Block-ELL sparse operators with Pallas TPU SpMM.

TPU-native replacement for the reference's `SparseMatrixCSC` + sparse LU
regime.  TPUs have no scatter/gather-friendly CSR kernels and no sparse
factorization; the natural format is **block-ELL**: the matrix is tiled in
``bs × bs`` blocks (bs = 128 → MXU tile), each block-row stores a fixed
number ``K`` of column-block slots:

* ``cols: (nb, K) int32``  — block-column index per slot (0 for padding),
* ``data: (nb, K, bs, bs)`` — dense blocks (zeros for padding).

SpMM ``A @ X`` with tall-skinny ``X (n, q)`` is then a stream of
``bs × bs × q`` matmuls — exactly what the MXU wants; the per-slot gather of
``X`` block-rows is expressed through a scalar-prefetch Pallas grid (the
`PrefetchScalarGridSpec` pattern) so the pipeline overlaps block streaming
with compute.  A pure-XLA gather+einsum fallback runs everywhere (CPU tests)
and is used automatically off-TPU.

Transposed products (``AᵀX``, needed throughout the ADI, e.g. residual
updates adi.jl:169-171) use an explicitly materialized transposed block
structure built at construction — no scatters in the hot loop.

Shifted pencils: operators built via `bell_pencil` share one block pattern,
so ``Aᵀ + μEᵀ`` (the ADI hot operator) is a single fused data combine.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import register_pytree_dataclass

_PALLAS_MIN_Q = 128  # lane width

# Interpret-mode switch for the Pallas kernels: lets tests run the
# *production* kernels on CPU via the Pallas interpreter.  Read at trace
# time — set before the first call in a process (tests only).
_INTERPRET = False


@register_pytree_dataclass(meta_fields=("n", "bs", "use_pallas"))
@dataclasses.dataclass(frozen=True)
class BellOp:
    """Block-ELL sparse matrix with explicit transposed structure."""

    cols: jax.Array  # (nb, K) int32
    data: jax.Array  # (nb, K, bs, bs)
    cols_t: jax.Array  # (nb, Kt) int32
    data_t: jax.Array  # (nb, Kt, bs, bs)
    diag_: jax.Array  # (n,)
    n: int
    bs: int
    use_pallas: bool = False

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nb(self) -> int:
        return self.data.shape[0]

    @property
    def nnz(self) -> int:
        """Stored entries (dense blocks) — the nnz/s throughput unit."""
        return int(self.data.size)

    def diag(self) -> jax.Array:
        return self.diag_

    def diag_blocks(self) -> jax.Array:
        """(nb, bs, bs) diagonal blocks — block-Jacobi preconditioner data."""
        nb, K, bs, _ = self.data.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (nb, K), 0)
        hit = (self.cols == row)  # padded slots point at block 0 ⇒ only
        # block-row 0 could false-positive, but its slot 0 is the true
        # diagonal there (patterns are sorted) and duplicates are summed
        # with zero data for padding.
        w = hit.astype(self.data.dtype)[..., None, None]
        return jnp.sum(self.data * w, axis=1)

    def mm(self, X: jax.Array) -> jax.Array:
        return _bell_mm(self.cols, self.data, X, self.n, self.bs,
                        self.use_pallas)

    def tmm(self, X: jax.Array) -> jax.Array:
        return _bell_mm(self.cols_t, self.data_t, X, self.n, self.bs,
                        self.use_pallas)

    def adjoint(self) -> "BellOp":
        return BellOp(cols=self.cols_t, data=self.data_t, cols_t=self.cols,
                      data_t=self.data, diag_=self.diag_, n=self.n,
                      bs=self.bs, use_pallas=self.use_pallas)

    def to_dense(self) -> jax.Array:
        nb, K, bs, _ = self.data.shape
        N = nb * bs
        M = jnp.zeros((N, N), self.dtype)

        def body(i, M):
            def inner(k, M):
                r = (jnp.asarray(i, jnp.int32) * bs).astype(jnp.int32)
                c = (self.cols[i, k] * bs).astype(jnp.int32)
                blk = self.data[i, k]
                return jax.lax.dynamic_update_slice(
                    M,
                    jax.lax.dynamic_slice(M, (r, c), (bs, bs)) + blk,
                    (r, c),
                )

            return jax.lax.fori_loop(0, K, inner, M)

        M = jax.lax.fori_loop(0, nb, body, M)
        return M[: self.n, : self.n]


def _bell_mm(cols, data, X, n, bs, use_pallas):
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    q = X.shape[1]
    nb = data.shape[0]
    N = nb * bs
    if X.shape[0] != N:
        X = jnp.pad(X, ((0, N - X.shape[0]), (0, 0)))
    if use_pallas and _on_tpu() and data.dtype != jnp.float64:
        Y = _bell_mm_pallas(cols, data, X)
    else:
        Y = _bell_mm_xla(cols, data, X)
    Y = Y[:n]
    return Y[:, 0] if squeeze else Y


@jax.jit
def _bell_mm_xla(cols, data, X):
    """Gather + batched matmul; XLA fuses this well enough off-TPU."""
    nb, K, bs, _ = data.shape
    q = X.shape[1]
    out_dt = jnp.result_type(data.dtype, X.dtype)
    Xb = X.astype(out_dt).reshape(nb, bs, q)
    gath = Xb[cols]  # (nb, K, bs, q)
    Y = jnp.einsum("ikab,ikbq->iaq", data.astype(out_dt), gath,
                   preferred_element_type=out_dt)
    return Y.reshape(nb * bs, q)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=())
def _bell_mm_pallas(cols, data, X):
    """Pallas SpMM, two layouts:

    * narrow RHS (q < 128): **transposed** layout ``Yᵀ = Xᵀ Aᵀ`` — the RHS
      rides the sublane dimension (padded to 8) and the 128-wide block rows
      ride the lanes, so no bandwidth is wasted padding q up to the lane
      width; per grid step one ``(q̃,128)×(128,128)`` MXU matmul.
    * wide RHS: direct layout ``Y[i] += data[i,k] @ X[cols[i,k]]``.

    Both use scalar-prefetched gather indices (1-D — 2-D SMEM operands fail
    to legalize in Mosaic) so the pipeline overlaps block streaming with
    compute.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, K, bs, _ = data.shape
    N = nb * bs
    q = X.shape[1]
    cols_flat = cols.reshape(-1)

    if q < _PALLAS_MIN_Q:
        qt = max(8, -(-q // 8) * 8)  # sublane multiple
        Xt = jnp.pad(X.T, ((0, qt - q), (0, 0)))  # (qt, N)
        def kernel_t(cols_ref, xt_hbm, data_ref, y_ref):
            # One grid step per block-row: the K-slot loop runs inside the
            # kernel with double-buffered manual DMA gathers of Xᵀ block
            # columns, while the pipeline streams the (K, bs, bs) data
            # slab.  Fewer, larger DMAs → near-streaming HBM traffic.
            i = pl.program_id(0)

            def body(xbuf, sem):
                def gather(slot, k):
                    j = cols_ref[i * K + k]
                    return pltpu.make_async_copy(
                        xt_hbm.at[:, pl.ds(j * bs, bs)],
                        xbuf.at[slot],
                        sem.at[slot],
                    )

                gather(0, 0).start()

                def loop(k, acc):
                    slot = k % 2

                    @pl.when(k + 1 < K)
                    def _():
                        gather((k + 1) % 2, k + 1).start()

                    gather(slot, k).wait()
                    # Yᵀ_i += Xᵀ_j · A_{i,j}ᵀ : (qt, bs) x (bs, bs)
                    return acc + jax.lax.dot_general(
                        xbuf[slot], data_ref[0, k],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=acc.dtype,
                    )

                acc0 = jnp.zeros((qt, bs), y_ref.dtype)
                y_ref[...] = jax.lax.fori_loop(0, K, loop, acc0)

            pl.run_scoped(
                body,
                xbuf=pltpu.VMEM((2, qt, bs), X.dtype),
                sem=pltpu.SemaphoreType.DMA((2,)),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # Xᵀ stays in HBM
                pl.BlockSpec((1, K, bs, bs), lambda i, c: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((qt, bs), lambda i, c: (0, i)),
        )
        Yt = pl.pallas_call(
            kernel_t,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((qt, N), X.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * nb * K * bs * bs * qt,
                bytes_accessed=data.size * data.dtype.itemsize
                + 2 * nb * K * bs * qt * X.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=_INTERPRET,
        )(cols_flat, Xt, data)
        return Yt[:q].T

    def kernel(cols_ref, data_ref, x_ref, y_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            y_ref[...] = jnp.zeros_like(y_ref)

        y_ref[...] += jnp.dot(
            data_ref[0, 0], x_ref[...], preferred_element_type=y_ref.dtype
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, K),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda i, k, c: (i, k, 0, 0)),
            pl.BlockSpec((bs, q), lambda i, k, c: (c[i * K + k], 0)),
        ],
        out_specs=pl.BlockSpec((bs, q), lambda i, k, c: (i, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, q), X.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * K * bs * bs * q,
            bytes_accessed=data.size * data.dtype.itemsize
            + 2 * nb * bs * q * X.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(cols_flat, data, X)


# --- construction (host side) -------------------------------------------------


def _block_pattern(coo, nb, bs):
    """Unique (block-row → sorted block-cols) pattern, vectorized over nnz."""
    keys = np.unique(
        (coo.row // bs).astype(np.int64) * nb + (coo.col // bs)
    )
    bi, bj = keys // nb, keys % nb
    pat = {}
    for i, j in zip(bi, bj):  # loops over *blocks* (≤ nb·K), not nnz
        pat.setdefault(int(i), []).append(int(j))
    return pat


def _build_structure(M_csr, nb, bs, pattern, dtype):
    """Scatter CSR entries into the (nb, K, bs, bs) slot buffer.

    One vectorized `np.add.at` over the nnz; the only Python loops run over
    the block pattern (≤ nb·K entries), never over matrix entries.
    """
    K = max((len(v) for v in pattern.values()), default=1)
    K = max(K, 1)
    cols = np.zeros((nb, K), np.int32)
    slot_mat = np.full((nb, nb), -1, np.int8 if K < 127 else np.int32)
    for i, js in pattern.items():
        for s, j in enumerate(sorted(js)):
            cols[i, s] = j
            slot_mat[i, j] = s
    M_csr.sum_duplicates()  # canonical ⇒ plain fancy assignment is exact
    coo = M_csr.tocoo()
    bi = coo.row // bs
    bj = coo.col // bs
    slots = slot_mat[bi, bj].astype(np.int64)
    if (slots < 0).any():
        raise ValueError("matrix entry outside the supplied block pattern")
    data = np.zeros((nb, K, bs, bs), dtype)
    data[bi, slots, coo.row % bs, coo.col % bs] = coo.data.astype(dtype)
    return jnp.asarray(cols), jnp.asarray(data)


def bell_from_scipy(M, bs: int = 128, dtype=None, pattern=None,
                    pattern_t=None, use_pallas: bool = False) -> BellOp:
    """Convert a scipy sparse matrix to `BellOp` (host-side, setup only)."""
    import scipy.sparse as sp

    M = sp.csr_matrix(M)
    n = M.shape[0]
    dtype = dtype or M.dtype
    nb = -(-n // bs)
    coo = M.tocoo()
    pat = pattern if pattern is not None else _block_pattern(coo, nb, bs)
    Mt = M.T.tocsr()
    pat_t = pattern_t if pattern_t is not None else _block_pattern(Mt.tocoo(), nb, bs)
    cols, data = _build_structure(M, nb, bs, pat, dtype)
    cols_t, data_t = _build_structure(Mt, nb, bs, pat_t, dtype)
    diag = np.zeros(n, dtype)
    d = M.diagonal()
    diag[: len(d)] = d
    return BellOp(cols=cols, data=data, cols_t=cols_t, data_t=data_t,
                  diag_=jnp.asarray(diag), n=n, bs=bs, use_pallas=use_pallas)


def bell_pencil(E, A, bs: int = 128, dtype=None, use_pallas: bool = False):
    """Build (E_op, A_op) on the **union** block pattern so shifted combines
    ``A + cE`` are pure data arithmetic (the ADI hot path)."""
    import scipy.sparse as sp

    E = sp.csr_matrix(E)
    A = sp.csr_matrix(A)
    n = E.shape[0]
    nb = -(-n // bs)
    U = (E != 0) + (A != 0)
    pat = _block_pattern(U.tocoo(), nb, bs)
    pat_t = _block_pattern(U.T.tocoo(), nb, bs)
    E_op = bell_from_scipy(E, bs, dtype, pattern=pat, pattern_t=pat_t,
                           use_pallas=use_pallas)
    A_op = bell_from_scipy(A, bs, dtype, pattern=pat, pattern_t=pat_t,
                           use_pallas=use_pallas)
    return E_op, A_op


# --- algebra on shared patterns ----------------------------------------------


def _same_pattern(a: BellOp, b: BellOp) -> bool:
    return a.cols.shape == b.cols.shape and a.n == b.n and a.bs == b.bs


def bell_lin_comb(A: BellOp, c, E: BellOp) -> BellOp:
    """``A + c·E`` for pattern-sharing operators (see `bell_pencil`)."""
    if not _same_pattern(A, E):
        raise ValueError("bell_lin_comb requires pattern-sharing operators "
                         "(build them with bell_pencil)")
    c = jnp.asarray(c)
    dt = jnp.result_type(A.dtype, c.dtype)
    return BellOp(
        cols=A.cols,
        data=A.data.astype(dt) + c * E.data.astype(dt),
        cols_t=A.cols_t,
        data_t=A.data_t.astype(dt) + c * E.data_t.astype(dt),
        diag_=A.diag_.astype(dt) + c * E.diag_.astype(dt),
        n=A.n, bs=A.bs, use_pallas=A.use_pallas,
    )


def bell_scale(A: BellOp, c) -> BellOp:
    c = jnp.asarray(c)
    dt = jnp.result_type(A.dtype, c.dtype)
    return BellOp(cols=A.cols, data=c * A.data.astype(dt), cols_t=A.cols_t,
                  data_t=c * A.data_t.astype(dt), diag_=c * A.diag_.astype(dt),
                  n=A.n, bs=A.bs, use_pallas=A.use_pallas)


def shifted_bell(E: BellOp, A: BellOp, mu):
    """Operator ``Aᵀ + μEᵀ`` as a `BellOp` (fused data combine)."""
    return bell_lin_comb(A.adjoint(), mu, E.adjoint())
