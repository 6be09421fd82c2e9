"""Pallas TPU bilinear-warp kernel (tile-decomposed gather).

XLA lowers the warp's 2-D gather to a scalar-core loop (~40 ms for a
1088x1920x3 frame on v5e, memory-latency bound).  This kernel keeps the
whole source plane resident in VMEM and rebuilds the gather from
primitives Mosaic vectorizes:

* horizontal: ``tpu.dynamic_gather`` (via jnp.take_along_axis axis=1)
  works only *within* a 128-lane tile on this toolchain, so a full-width
  row gather is decomposed into W/128 tile gathers + selects;
* vertical: displacements are bounded to +-V_RADIUS rows (flows are
  clamped accordingly — motion search ranges are bounded in any real
  codec), and the row dimension is handled by a select-accumulate over
  the 2*V_RADIUS+1 possible integer row offsets using ``pltpu.roll``.

out[y, x] = src[sy, sx] bilinear, with sx unrestricted (border-clamped)
and |sy - y| <= V_RADIUS.

The kernel processes one (channel, row-block) grid cell at a time; the
source plane block is the full H x W channel slice (re-used across the
row grid).  Correctness is tested in interpreter mode on CPU and against
the XLA warp; TPU compilation of dynamic_gather requires lane tiles of
exactly 128, which the W-padding to PAD_MULTIPLE=64 does not guarantee,
so the public entry point falls back to the XLA warp for unsupported
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

V_RADIUS = 16  # max vertical displacement in rows (flow is clamped)
LANE = 128


def _pick_row_block(h: int):
    """Largest divisor of h in [8, 256] (the kernel's row-block grid),
    or None if none exists (then callers fall back to the XLA warp)."""
    for hb in range(min(h, 256), 7, -1):
        if h % hb == 0:
            return hb
    return None


def _hgather_tiles(rows: jax.Array, xi: jax.Array) -> jax.Array:
    """out[y, x] = rows[y, xi[y, x]] for xi in [0, W), W a multiple of 128.

    Decomposed into per-lane-tile dynamic gathers + selects so each
    take_along_axis stays within one 128-lane tile.
    """
    H, W = rows.shape
    n_tiles = W // LANE
    out = jnp.zeros_like(rows)
    tile_of = xi // LANE
    local = xi - tile_of * LANE
    for t in range(n_tiles):
        tile = rows[:, t * LANE:(t + 1) * LANE]
        idx = jnp.clip(jnp.where(tile_of == t, local, 0), 0, LANE - 1)
        # idx spans the full row; gather each output lane-tile from `tile`
        part = jnp.concatenate(
            [jnp.take_along_axis(tile, idx[:, s * LANE:(s + 1) * LANE], axis=1)
             for s in range(n_tiles)], axis=1)
        out = jnp.where(tile_of == t, part, out)
    return out


def _warp_plane_kernel(src_ref, sx_ref, sy_ref, out_ref, *, true_h: int):
    """One channel plane: src [H + 2*(V_RADIUS+1), W] edge-padded OUTSIDE
    the kernel (Mosaic does not lower jnp.pad); sx, sy [HB, W] sample
    coords for this row block; out [HB, W]."""
    import jax.experimental.pallas as pl

    H = true_h
    W = src_ref.shape[1]
    HB = out_ref.shape[0]
    blk = pl.program_id(1) * HB

    sx = sx_ref[:]
    sy = sy_ref[:]

    x0 = jnp.floor(sx)
    wx = sx - x0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)

    y0 = jnp.floor(sy)
    wy = sy - y0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)

    row_ids = blk + jax.lax.broadcasted_iota(jnp.int32, (HB, W), 0)
    # Integer row offset of the TOP bilinear row, clamped to the radius.
    d = jnp.clip(y0i - row_ids, -V_RADIUS, V_RADIUS)

    acc = jnp.zeros((HB, W), out_ref.dtype)
    for off in range(-V_RADIUS, V_RADIUS + 2):
        # Rows at offset `off` for this block, read from the pre-padded
        # source ref: rows_off[y, x] = src[clip(y + blk + off), x]
        rows_off = src_ref[pl.ds(blk + off + V_RADIUS + 1, HB), :]
        h0 = _hgather_tiles(rows_off, x0i)
        h1 = _hgather_tiles(rows_off, x1i)
        hinterp = h0 + (h1 - h0) * wx
        # This offset contributes as the top row (weight 1-wy) when
        # d == off, and as the bottom row (weight wy) when d == off - 1.
        acc = acc + jnp.where(d == off, (1.0 - wy) * hinterp, 0.0)
        acc = acc + jnp.where(d == off - 1, wy * hinterp, 0.0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_pallas(x: jax.Array, flow: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Pallas bilinear warp; x [B,H,W,C], flow [B,H,W,2].

    Vertical flow is clamped to +-V_RADIUS (the XLA warp clamps only at
    the border).  Requires W % 128 == 0; callers fall back to ops.warp
    otherwise.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    if W % LANE != 0:
        raise ValueError(f"W={W} must be a multiple of {LANE}")

    HB = _pick_row_block(H)
    if HB is None:
        raise ValueError(f"H={H} has no row-block divisor in [8, 256]")

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    sx = jnp.clip(xx[None] + flow[..., 0], 0.0, W - 1)
    sy = jnp.clip(yy[None] + jnp.clip(flow[..., 1], -V_RADIUS + 1, V_RADIUS - 1),
                  0.0, H - 1)

    pad_n = V_RADIUS + 1

    def one(xb, sxb, syb):
        def one_ch(src):
            src_p = jnp.pad(src, ((pad_n, pad_n), (0, 0)), mode="edge")
            return pl.pallas_call(
                functools.partial(_warp_plane_kernel, true_h=H),
                out_shape=jax.ShapeDtypeStruct((H, W), src.dtype),
                grid=(1, H // HB),
                in_specs=[
                    pl.BlockSpec((H + 2 * pad_n, W), lambda c, i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((HB, W), lambda c, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((HB, W), lambda c, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((HB, W), lambda c, i: (i, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(src_p, sxb, syb)

        return jnp.stack([one_ch(xb[..., c]) for c in range(C)], axis=-1)

    return jax.vmap(one)(x, sx, sy)
