"""Pallas TPU kernels for the separable squared EDT.

Why this exists (measured, see RESULTS.md):

- The pure-XLA min-plus chain in ``nvfpcc_tpu.grids.edt`` does not fuse on
  TPU — XLA materializes every shifted slice (~58x the grid in HBM: 82 GB
  for a 704^3 grid -> OOM) plus layout-copy transposes from the axis swaps.
- Worse, the TPU lowering MISCOMPILES for some shapes: phantom-too-small
  distances (171/200 brute-force probes wrong on a 192^3 grid) while the
  same program is correct on CPU. These kernels are the trusted TPU path;
  the grids builder additionally probe-checks against brute force.

Design: one pass per axis. The pass axis is processed in segments of
``SEG`` elements with a ``radius`` halo on both sides; the input is
pre-padded by ``radius`` (value = cap) so halo reads never leave bounds.
Each kernel instance DMAs its (8, SEG+2R, 128)-shaped halo window from HBM
into VMEM scratch, runs the windowed parabola min-plus along the segment,
and writes the (8, SEG, 128) center to the output block. The min-plus uses
the iterative propagation p_d(i) = p_{d-1}(i∓1) + (2d-1) — two live tiles
for any radius. HBM traffic per pass ~= (1 + 2R/SEG) reads + 1 write of the
grid; no temporaries, no transposes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SEG = 128  # segment length along the pass axis
_B0 = 8  # block extent, first non-pass axis (sublane-friendly)
_B1 = 128  # block extent, second non-pass axis (lane-friendly)


def _shift1(a, axis: int, forward: bool, fill):
    """Shift a tile by ONE along ``axis``; vacated boundary takes ``fill``."""
    L = a.shape[axis]
    edge_shape = list(a.shape)
    edge_shape[axis] = 1
    edge = jnp.full(edge_shape, fill, a.dtype)
    if forward:
        body = jax.lax.slice_in_dim(a, 0, L - 1, axis=axis)
        return jnp.concatenate([edge, body], axis=axis)
    body = jax.lax.slice_in_dim(a, 1, L, axis=axis)
    return jnp.concatenate([body, edge], axis=axis)


def _minplus_dir(f, out, axis: int, radius: int, cap, forward: bool):
    """Fold p_d(i) = f(i∓d) + d^2 into ``out`` via p_d = shift1(p) + (2d-1)."""

    def body(d, carry):
        out, p = carry
        p = _shift1(p, axis, forward, cap) + (2 * d - 1)
        return jnp.minimum(out, p), p

    out, _ = jax.lax.fori_loop(1, radius + 1, body, (out, f))
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_plan(axis: int, shape, radius: int):
    """(block_sizes, window_sizes, halo, grid), ARRAY axis order.

    Mosaic DMA slices must be tile-aligned (8 on sublanes, 128 on lanes), so
    the halo is rounded up to the axis alignment; the lane axis (2) is never
    chunked along the pass direction — its window spans the full padded
    extent from lane 0 (always aligned)."""
    bs = [0, 0, 0]
    if axis == 2:
        halo = _round_up(radius, 128)
        bs = [_B0, _B0, shape[2]]
        win = [_B0, _B0, _round_up(shape[2] + radius, 128) + halo]
    else:
        halo = _round_up(radius, 8)
        # lane dim (2) must be a whole number of 128-lane tiles for the DMA
        bs = [_B0, _B0, _B1]
        bs[axis] = min(_SEG, _round_up(shape[axis], 8))
        win = list(bs)
        win[axis] += 2 * halo
    grid = tuple(pl.cdiv(shape[a], bs[a]) for a in range(3))
    return bs, win, halo, grid


def _pass_kernel(in_hbm, out_ref, scratch, sem, *, axis, radius, cap, bs, win, front):
    """One halo window: DMA in, min-plus along ``axis``, write center.

    The padded input's front padding equals the (aligned) halo, so window i
    of the pass axis starts at element i*seg of the PADDED array — always
    tile-aligned; output element j of block i sits at window offset
    ``front + j``."""
    idx = []
    for a in range(3):
        if pl.num_programs(a) == 1:
            start = 0  # constant — trivially tile-aligned for Mosaic
        else:
            start = pl.multiple_of(pl.program_id(a) * bs[a], bs[a])
        idx.append(pl.ds(start, win[a]))
    dma = pltpu.make_async_copy(in_hbm.at[idx[0], idx[1], idx[2]], scratch, sem)
    dma.start()
    dma.wait()

    x = jnp.minimum(scratch[:], cap)
    out = _minplus_dir(x, x, axis, radius, cap, True)
    out = _minplus_dir(x, out, axis, radius, cap, False)
    out_ref[:] = jax.lax.slice_in_dim(out, front, front + bs[axis], axis=axis)


def _make_pass(axis: int, shape, radius: int, interpret: bool):
    bs, win, halo, grid = _block_plan(axis, shape, radius)
    cap = radius * radius + 1

    def run(x):
        pad = [(0, 0)] * 3
        for a in range(3):
            cover = grid[a] * bs[a] - shape[a]
            if a == axis:
                # front halo; behind: block coverage + enough for the last
                # window's reach
                back = win[a] - bs[a] - halo + cover
                pad[a] = (halo, back)
            else:
                pad[a] = (0, cover)
        xp = jnp.pad(x, pad, constant_values=cap)
        return pl.pallas_call(
            partial(
                _pass_kernel,
                axis=axis,
                radius=radius,
                cap=int(cap),
                bs=tuple(bs),
                win=tuple(win),
                front=halo,
            ),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                tuple(bs), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM(tuple(win), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xp)

    return run


@partial(jax.jit, static_argnames=("radius", "interpret"))
def squared_edt_3d_pallas(occ, radius: int, interpret: bool = False):
    """Exact (window-clamped) squared EDT — Pallas TPU path.

    Same contract as ``grids.edt.squared_edt_3d``: int32 squared distances,
    saturated at radius^2 + 1. Requires every grid dim to be a multiple
    of 8 (the builder guarantees this).
    """
    shape = occ.shape
    if any(d % 8 for d in shape):
        raise ValueError(f"grid dims must be multiples of 8, got {shape}")
    cap = jnp.int32(radius * radius + 1)
    f = jnp.where(occ.astype(bool), jnp.int32(0), cap)
    f = _make_pass(2, shape, radius, interpret)(f)
    f = _make_pass(1, shape, radius, interpret)(f)
    f = _make_pass(0, shape, radius, interpret)(f)
    return f
