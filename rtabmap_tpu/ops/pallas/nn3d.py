"""Pallas TPU kernel: fused 3-D nearest-neighbor search (ICP inner loop).

The ICP correspondence search (reference: PCL kd-tree inside
RegistrationIcp, /root/reference/corelib/src/RegistrationIcp.cpp:314)
re-designed as a fused streaming kernel, the L2 sibling of
``vocab_knn``: the (Qb, B) squared-distance tile is three outer
differences on the VPU (a contraction depth of 3 would waste the MXU),
the running best (dist, index) lives in VMEM scratch across the
B-grid dimension, and the distance matrix never touches HBM. Points ride
in transposed (3, N) layout so the minor dimension is the long one
(Mosaic wants 128-multiples there). The lax.scan formulation this
replaces was measured 200x slower for the analogous vocabulary kernel —
scan-carried state forces an HBM round trip per block.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _kernel(q_ref, d_ref, pen_ref, od_ref, oi_ref, best_d, best_i):
    import jax.experimental.pallas as pl

    jb = pl.program_id(1)
    nb = pl.num_programs(1)
    B = d_ref.shape[1]

    @pl.when(jb == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    qx = q_ref[0, :][:, None]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]
    bx = d_ref[0, :][None, :]
    by = d_ref[1, :][None, :]
    bz = d_ref[2, :][None, :]
    d2 = ((qx - bx) ** 2 + (qy - by) ** 2 + (qz - bz) ** 2
          + pen_ref[0, :][None, :])
    m = jnp.min(d2, axis=1)
    mi = jnp.argmin(d2, axis=1).astype(jnp.int32) + jb * B
    better = m < best_d[0, :]
    best_d[0, :] = jnp.where(better, m, best_d[0, :])
    best_i[0, :] = jnp.where(better, mi, best_i[0, :])

    @pl.when(jb == nb - 1)
    def _done():
        od_ref[:] = best_d[:]
        oi_ref[:] = best_i[:]


@partial(jax.jit, static_argnames=("qblock", "dblock", "interpret"))
def pallas_nn3d(query_t, dst_t, dst_valid, qblock: int = 512,
                dblock: int = 2048, interpret: bool = False):
    """query_t (3, Q) f32, dst_t (3, N) f32, dst_valid (N,) ->
    (dist2 (Q,), idx (Q,)). Q % qblock == 0 and N % dblock == 0."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = query_t.shape[1]
    N = dst_t.shape[1]
    assert Q % qblock == 0 and N % dblock == 0, (Q, qblock, N, dblock)
    pen = jnp.where(dst_valid, 0.0, jnp.inf).astype(jnp.float32)[None, :]

    d, i = pl.pallas_call(
        _kernel,
        grid=(Q // qblock, N // dblock),
        in_specs=[
            pl.BlockSpec((3, qblock), lambda iq, jb: (0, iq)),
            pl.BlockSpec((3, dblock), lambda iq, jb: (0, jb)),
            pl.BlockSpec((1, dblock), lambda iq, jb: (0, jb)),
        ],
        out_specs=[
            pl.BlockSpec((1, qblock), lambda iq, jb: (0, iq)),
            pl.BlockSpec((1, qblock), lambda iq, jb: (0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, Q), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, qblock), jnp.float32),
            pltpu.VMEM((1, qblock), jnp.int32),
        ],
        interpret=interpret,
    )(query_t, dst_t, pen)
    return d[0], i[0]


def nn3d_ok(n_query: int, n_dst: int, qblock: int = 512,
            dblock: int = 2048) -> bool:
    platform = jax.devices()[0].platform
    return (platform in ("tpu", "axon") and n_query % qblock == 0
            and n_dst % dblock == 0)
