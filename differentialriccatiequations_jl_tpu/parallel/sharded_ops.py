"""Row-sharded block-ELL SpMM with explicit halo exchange.

The spatial-scaling kernel (SURVEY.md §7 step 9): the block-row dimension is
partitioned across the 1-D device mesh; FEM/FD operators are banded at the
block level, so each shard only needs ``H`` halo block-rows of the operand
from each neighbor.  The halo moves with two `ppermute`s over ICI —
O(H·bs·q) bytes per step, overlapped by XLA with the local contraction —
instead of the all-gather jit would insert for a plain sharded gather.

Construction rebases the global block-column indices to halo-extended local
coordinates on the host; the mapped function then needs no index arithmetic
beyond a local gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import BellOp
from .mesh import AXIS


class ShardedBellSpmm:
    """Callable ``Y = A @ X`` for a row-sharded banded `BellOp`.

    Parameters
    ----------
    mesh : 1-D device mesh.
    op : the (host/global) `BellOp`; its block bandwidth must not exceed the
        halo width `halo` (validated at construction).
    transpose : build the product with the transposed structure (``AᵀX``).
    """

    def __init__(self, mesh: Mesh, op: BellOp, halo: int | None = None,
                 transpose: bool = False):
        self.mesh = mesh
        nd = mesh.devices.size
        cols = np.asarray(op.cols_t if transpose else op.cols)
        data = op.data_t if transpose else op.data
        nb, K, bs, _ = data.shape
        if nb % nd != 0:
            raise ValueError(f"nb={nb} must be divisible by mesh size {nd}")
        nbl = nb // nd
        rows = np.arange(nb)[:, None]
        band = np.abs(cols - rows)
        # padded slots point at block 0 with all-zero data; exclude them
        # from the bandwidth estimate.
        real = np.asarray(jnp.abs(data).sum(axis=(2, 3))) > 0
        real_band = int(band[real].max()) if real.any() else 0
        H = real_band if halo is None else halo
        if real_band > H:
            raise ValueError(
                f"block bandwidth {real_band} exceeds halo {H}")
        self.halo = H = max(1, H)
        if H > nb // nd:
            raise ValueError(
                f"halo {H} exceeds the {nb // nd} block-rows per shard; "
                "use fewer devices or the all-gather path")
        # neutralize padded slots: point them at the local diagonal so the
        # rebased index stays in range (data is zero there anyway)
        cols = np.where(real, cols, rows)
        shard_start = (rows // nbl) * nbl
        cols_reb = cols - shard_start + H
        if (cols_reb < 0).any() or (cols_reb >= nbl + 2 * H).any():
            raise ValueError(
                "operator bandwidth exceeds one shard + halo; increase mesh "
                "block size or use the all-gather path")
        row_sh = NamedSharding(mesh, P(AXIS, *([None] * (data.ndim - 1))))
        self.data = jax.device_put(data, row_sh)
        self.cols_reb = jax.device_put(
            jnp.asarray(cols_reb, jnp.int32),
            NamedSharding(mesh, P(AXIS, None)),
        )
        self.n = op.n
        self.bs = bs
        self.nbl = nbl
        self.nd = nd
        self.N = nb * bs

        H_ = self.halo
        bs_ = bs

        @partial(
            jax.jit,
            static_argnames=(),
        )
        def _apply(data_sh, cols_sh, X):
            @partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(AXIS, None, None, None), P(AXIS, None),
                          P(AXIS, None)),
                out_specs=P(AXIS, None),
            )
            def local(data_l, cols_l, X_l):
                q = X_l.shape[1]
                nd_i = jax.lax.axis_size(AXIS)
                # halo exchange: my tail → next shard's "prev" halo, my head
                # → previous shard's "next" halo.
                fwd = [(i, (i + 1) % nd_i) for i in range(nd_i)]
                bwd = [(i, (i - 1) % nd_i) for i in range(nd_i)]
                from_prev = jax.lax.ppermute(X_l[-H_ * bs_:], AXIS, fwd)
                from_next = jax.lax.ppermute(X_l[:H_ * bs_], AXIS, bwd)
                X_ext = jnp.concatenate([from_prev, X_l, from_next], axis=0)
                Xb = X_ext.reshape(-1, bs_, q)
                gath = Xb[cols_l]  # (nbl, K, bs, q)
                Y = jnp.einsum("ikab,ikbq->iaq", data_l, gath,
                               preferred_element_type=X_l.dtype)
                return Y.reshape(-1, q)

            return local(data_sh, cols_sh, X)

        self._apply = _apply

    def __call__(self, X: jax.Array) -> jax.Array:
        X = jnp.asarray(X)
        squeeze = X.ndim == 1
        if squeeze:
            X = X[:, None]
        if X.shape[0] != self.N:
            X = jnp.pad(X, ((0, self.N - X.shape[0]), (0, 0)))
        Y = self._apply(self.data, self.cols_reb, X)[: self.n]
        return Y[:, 0] if squeeze else Y
