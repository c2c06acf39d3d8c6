"""Pallas TPU kernel for the all-vs-all conjunction coarse pass.

The XLA coarse pass (:func:`astroz_tpu.screening._coarse_block_min`)
scans the time axis carrying an (N, block) min-matrix through HBM every
step — ~240 read+write round trips of a ~100 MB carry per block, plus a
count-fetch round trip per 2048-column block through the remote-TPU
tunnel. This kernel keeps the (bi, bj) min-tile resident in VMEM across
the whole time loop and emits the full (N, W) min-distance matrix in
ONE program: HBM traffic drops from O(T * N * W) to
O(N * W + tiles * T * (bi + bj)) and the per-block dispatch round trips
collapse to one.

Unlike the XLA path's Gram expansion (|ri|^2+|rj|^2-2ri.rj, chosen to
ride the MXU), the in-kernel arithmetic is the DIRECT difference
(xi-xj)^2+(yi-yj)^2+(zi-zj)^2 on the VPU: same flop count once the
cross term can't be batched into a big matmul, and exact to f32
rounding — no cancellation guard band, so the coarse mask is already
the refine-precision hit set (the refine pass only recovers argmin-t
for the survivors).

The i-side satellites must broadcast along sublanes, so the driver
feeds the kernel a pre-transposed (N, T) copy of each position plane
(one XLA transpose per screen, ~40 MB); the j-side streams the natural
(T, N) planes. Time is padded to a multiple of the 256-step chunk by
repeating epochs (idempotent under min) and chunked as the innermost
grid dimension, accumulating into the resident output tile
(``pl.when(tc == 0)`` init — the standard Mosaic reduction pattern).

Upper-triangle tiles only: a tile whose global column range contains no
j > i pair skips its compute entirely (predicated on a prefetched j0
scalar so one compile serves every column chunk of a blocked screen);
its output stays +inf and never survives the threshold mask.

Reference analogue: the spatial-hash coarse screen
(conjunction.zig:11-138) — same coarse->exact structure, TPU-dense.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tile shape: (sublanes = i satellites, lanes = j satellites)
I_BLOCK = 256
J_BLOCK = 512
#: time steps resident per grid step (lane width of the i-side blocks)
TIME_CHUNK = 256


def _kernel(j0_ref, xiT, yiT, ziT, xj, yj, zj, out):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tc = pl.program_id(2)

    @pl.when(tc == 0)
    def _init():
        out[:] = jnp.full(out.shape, jnp.inf, jnp.float32)

    # skip tiles wholly at-or-below the diagonal: no (gi < gj) pair.
    # Constants ride as i32 products of program ids — bare python ints
    # can promote to i64 under x64 and crash the Mosaic lowering.
    gj_max = j0_ref[0] + (j + 1) * jnp.int32(J_BLOCK) - 1
    gi_min = i * jnp.int32(I_BLOCK)

    @pl.when(gj_max > gi_min)
    def _compute():
        def step(t, dmin):
            dx = xiT[:, pl.ds(t, 1)] - xj[pl.ds(t, 1), :]
            dy = yiT[:, pl.ds(t, 1)] - yj[pl.ds(t, 1), :]
            dz = ziT[:, pl.ds(t, 1)] - zj[pl.ds(t, 1), :]
            return jnp.minimum(dmin, dx * dx + dy * dy + dz * dz)

        out[:] = lax.fori_loop(0, TIME_CHUNK, step, out[:],
                               unroll=False)


@partial(jax.jit, static_argnames=("width", "interpret"))
def _coarse_chunk(riT, r, j0, width: int, interpret: bool = False):
    """Min-over-time squared distances of ALL i rows vs one column chunk.

    riT: (3, Npad, Tp) transposed planes; r: (3, Tp, Npad) planes;
    j0: i32 scalar array, first column of the chunk (multiple of
    J_BLOCK). Returns (Npad, width) f32.
    """
    _, n_pad, t_pad = riT.shape
    rj = lax.dynamic_slice_in_dim(r, j0, width, axis=2)
    grid = (n_pad // I_BLOCK, width // J_BLOCK, t_pad // TIME_CHUNK)

    def i_map(i, j, tc, j0_ref):
        return (i, tc)

    def j_map(i, j, tc, j0_ref):
        return (tc, j)

    ispec = pl.BlockSpec((I_BLOCK, TIME_CHUNK), i_map)
    jspec = pl.BlockSpec((TIME_CHUNK, J_BLOCK), j_map)
    out_spec = pl.BlockSpec((I_BLOCK, J_BLOCK),
                            lambda i, j, tc, j0_ref: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[ispec] * 3 + [jspec] * 3,
        out_specs=out_spec)
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, width), jnp.float32),
        interpret=interpret,
    )(j0.reshape(1), *riT, *rj)


@partial(jax.jit, static_argnames=("n_pad", "t_pad"))
def _stage(r_planes, park0, n_pad: int, t_pad: int):
    """Pad (3, T, N) planes to (3, Tp, Npad) + build the (3, Npad, Tp)
    transposed i-side copy. Time pads repeat epochs modulo T (idempotent
    under min); satellite pads park at distinct far points continuing
    the caller's park sequence from index ``park0``."""
    _, t, n = r_planes.shape
    if t_pad != t:
        idx = jnp.arange(t_pad, dtype=jnp.int32) % jnp.int32(t)
        r_planes = r_planes[:, idx, :]
    if n_pad != n:
        park = (1.0e7 + 1.0e6 * (park0 + jnp.arange(n_pad - n,
                                                    dtype=jnp.float32))
                )[None, None, :] + jnp.zeros((3, t_pad, 1), jnp.float32)
        r_planes = jnp.concatenate([r_planes, park], axis=2)
    return r_planes, jnp.swapaxes(r_planes, 1, 2)


def coarse_min_all(r_planes, *, max_bytes: int = 2 << 30,
                   interpret: bool = False):
    """Yield ``(j0, dmin)`` column chunks of the all-vs-all coarse pass.

    r_planes: (3, T, N) f32 TEME position planes (failed lanes already
    parked by the caller). dmin chunks are (Npad, chunk_width) f32
    min-over-time squared distances; entries at or below the diagonal
    and on padding lanes are +inf or huge. Chunk width is chosen so one
    output buffer stays under ``max_bytes``.
    """
    _, t, n = r_planes.shape
    lcm = max(I_BLOCK, J_BLOCK)
    n_pad = -(-n // lcm) * lcm
    t_pad = -(-t // TIME_CHUNK) * TIME_CHUNK
    r, riT = _stage(jnp.asarray(r_planes, jnp.float32),
                    jnp.float32(n), n_pad, t_pad)
    width = max(J_BLOCK, min(n_pad, (max_bytes // (4 * n_pad))
                             // J_BLOCK * J_BLOCK))
    for j0 in range(0, n_pad, width):
        w = min(width, n_pad - j0)
        yield j0, _coarse_chunk(riT, r, jnp.asarray(j0, jnp.int32), w,
                                interpret)
