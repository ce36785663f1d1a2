"""Device-mesh sharding for the DRE solver stack.

The reference has no distributed computing (SURVEY.md §2 checklist); its
device abstraction is Adapt.jl array conversion at explicit seams.  Here the
single abstraction is a 1-D `jax.sharding.Mesh` over the pod slice with the
problem dimension **row-partitioned** — the library's scaling axis analog of
sequence/tensor parallelism (SURVEY.md §5):

* matrix operators (dense ``(n, n)`` or block-ELL data ``(nb, K, bs, bs)``)
  are sharded along rows: ``P("x", None)`` / ``P("x", None, None, None)``;
* tall-skinny factors ``L (n, r)``, residual factors ``W (n, q)``:
  ``P("x", None)``;
* small inner factors ``D (r, r)``, feedback ``K (m, n)``, Schur
  complements: replicated.

With these in-shardings, jitting the compiled Ros1/ADI step lets XLA insert
the collectives (psum for tall-matmul contractions, all-gathers for the
block-row gathers) over ICI.  Hand-tuned halo exchange for the structured
SpMM is the follow-up optimization (shard_map + ppermute).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lowrank import LowRank
from ..ops.operators import DenseOp, LowRankUpdateOp
from ..ops.sparse import BellOp

AXIS = "x"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def row_sharded(mesh: Mesh, *dims_after: int):
    return NamedSharding(mesh, P(AXIS, *([None] * len(dims_after))))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_operator(mesh: Mesh, op):
    """Place an operator with row-partitioned layout."""
    from ..ops.dia import DiaOp
    import dataclasses as _dc

    if isinstance(op, DiaOp):
        # diagonal storage: the row dimension is the *column* axis of data;
        # attach the mesh so mm/tmm run the halo-exchange shard_map path.
        sh = NamedSharding(mesh, P(None, AXIS))
        if op.N % mesh.devices.size:
            raise ValueError(
                f"DiaOp padded size {op.N} not divisible by mesh size "
                f"{mesh.devices.size}; build with pad_to=mesh size")
        return _dc.replace(
            op,
            data=jax.device_put(op.data, sh),
            data_t=jax.device_put(op.data_t, sh),
            mesh=mesh,
        )
    if isinstance(op, DenseOp):
        return DenseOp(jax.device_put(op.M, NamedSharding(mesh, P(AXIS, None))))
    if isinstance(op, LowRankUpdateOp):
        return LowRankUpdateOp(
            shard_operator(mesh, op.A),
            jax.device_put(op.alpha, replicated(mesh)),
            jax.device_put(op.U, NamedSharding(mesh, P(AXIS, None))),
            jax.device_put(op.V, NamedSharding(mesh, P(None, AXIS))),
        )
    if isinstance(op, BellOp):
        sh_blocks = NamedSharding(mesh, P(AXIS, None, None, None))
        rep = replicated(mesh)
        return BellOp(
            cols=jax.device_put(op.cols, rep),
            data=jax.device_put(op.data, sh_blocks),
            cols_t=jax.device_put(op.cols_t, rep),
            data_t=jax.device_put(op.data_t, sh_blocks),
            diag_=jax.device_put(op.diag_, NamedSharding(mesh, P(AXIS))),
            n=op.n,
            bs=op.bs,
            use_pallas=op.use_pallas,
        )
    raise TypeError(f"cannot shard operator {type(op)}")


def shard_lowrank(mesh: Mesh, X: LowRank) -> LowRank:
    return LowRank(
        L=jax.device_put(X.L, NamedSharding(mesh, P(AXIS, None))),
        D=jax.device_put(X.D, replicated(mesh)),
        k=jax.device_put(X.k, replicated(mesh)),
    )


def shard_tall(mesh: Mesh, M: jax.Array) -> jax.Array:
    return jax.device_put(M, NamedSharding(mesh, P(AXIS, None)))


def shard_replicated(mesh: Mesh, M) -> jax.Array:
    return jax.device_put(jnp.asarray(M), replicated(mesh))
