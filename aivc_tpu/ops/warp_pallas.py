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


# ---------------------------------------------------------------------------
# Windowed warp for BOUNDED flows (ModelConfig.flow_bound > 0)
# ---------------------------------------------------------------------------
# The unbounded warp must gather from anywhere in the frame, which on TPU
# costs one latency-bound gather row per pixel (~16 ns: ~33 ms per 1080p
# frame, the top encode stage in the round-3 profile).  With |flow| <= FB
# both sample rows and columns live in a small window around the output
# tile, so the gather decomposes into primitives Mosaic runs at vector
# rate:
#
#   * the byte-packed u32 source plane (ops/warp.py:pack_yuv_u32) is
#     pre-sliced into overlapping [HB + 2*MR, 384] windows (3 lane
#     tiles: output column tiles j-1, j, j+1) — contiguous row-block
#     copies, bandwidth-bound, NOT index-bound;
#   * horizontal: per-lane-tile take_along_axis (within-tile dynamic
#     gather) + selects over the 3 column tiles;
#   * vertical: a static select-accumulate over the 2*FB + 4 possible
#     integer row offsets; the 4 bilinear corners ride PACKED through
#     the selects and unpack once at the end, so one kernel call warps
#     all 3 channels.
#
# The result is BIT-IDENTICAL to ops/warp.py:warp_packed on the same
# (packed, flow) inputs whenever |flow| <= FB: both evaluate the same
# unpack + FMA expression tree in f32, and every gather index they
# produce coincides — warp_packed is simultaneously the CPU fallback
# and the differential test oracle (tests/test_warp_bounded.py).

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MR = 40          # row margin: covers FB + 1 <= 39, multiple of 8
FB_MAX = 38


def _win_hgather(rows_off: jax.Array, xl: jax.Array) -> jax.Array:
    """rows_off [HB, 384] (3 lane tiles), xl [HB, 128] local columns in
    [0, 384) -> out[r, x] = rows_off[r, xl[r, x]]."""
    out = jnp.zeros(xl.shape, rows_off.dtype)
    tile_of = xl >> 7
    for t in range(3):
        tile = rows_off[:, t * LANE:(t + 1) * LANE]
        idx = jnp.clip(xl - t * LANE, 0, LANE - 1)
        part = jnp.take_along_axis(tile, idx, axis=1)
        out = jnp.where(tile_of == t, part, out)
    return out


def _warp_bounded_kernel(hb, fb, w_img, src_ref, sx_ref, sy_ref, out_ref):
    sx = sx_ref[0]                                   # [HB, 128] global f32
    sy = sy_ref[0]
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1_in = x0 + 1 < w_img                           # x1 border clamp
    j = pl.program_id(2)
    xl0 = x0 - (j * LANE - LANE)                     # local in [0, 384)
    xl1 = jnp.minimum(xl0 + 1, 383)
    rloc = jax.lax.broadcasted_iota(jnp.int32, (hb, LANE), 0)
    i = pl.program_id(1)
    d = y0 - (i * hb + rloc)                         # in [-(fb+1), fb+1]

    # Vertical select-accumulate, restructured for scoped VMEM: Mosaic
    # does NOT reuse stack across statically unrolled iterations (the
    # 68-offset unroll OOM'd at 20.6 MB on v5e), but a real fori_loop
    # body's stack IS reused.  Offsets are walked in aligned 8-row
    # blocks: the outer fori slices [hb + 8, 384] at an 8-aligned
    # dynamic start, the inner static loop covers the 8 sub-offsets.
    ob = -(((fb + 1) + 7) // 8) * 8                  # aligned lower bound
    n_outer = ((fb + 2) - ob + 8) // 8               # cover [ob, fb+2]
    zero = jnp.zeros((hb, LANE), jnp.int32)

    def outer(qi, carry):
        top0, top1, bot0, bot1 = carry
        start = _MR + ob + 8 * qi
        blk = src_ref[0, 0, 0,
                      pl.ds(pl.multiple_of(start, 8), hb + 8),
                      :].astype(jnp.int32)
        for sub in range(8):
            o = ob + 8 * qi + sub                    # traced scalar
            rows_off = blk[sub:sub + hb, :]
            h0 = _win_hgather(rows_off, xl0)
            h1 = _win_hgather(rows_off, xl1)
            h1 = jnp.where(x1_in, h1, h0)
            sel_t = d == o
            sel_b = d == (o - 1)                     # bottom row y0 + 1;
            # at the image bottom the window's edge padding already holds
            # the replicated last row, so no extra clamp is needed.
            top0 = jnp.where(sel_t, h0, top0)
            top1 = jnp.where(sel_t, h1, top1)
            bot0 = jnp.where(sel_b, h0, bot0)
            bot1 = jnp.where(sel_b, h1, bot1)
        return top0, top1, bot0, bot1

    top0, top1, bot0, bot1 = jax.lax.fori_loop(
        0, n_outer, outer, (zero, zero, zero, zero))

    outs = []
    for ch in range(3):
        sh = 8 * ch
        v00 = ((top0 >> sh) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        v01 = ((top1 >> sh) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        v10 = ((bot0 >> sh) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        v11 = ((bot1 >> sh) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        outs.append(top + (bot - top) * wy)
    # Channel rides a LEADING output dim: with channels minor the output
    # layout is T(8,128) over (W, 3) and XLA pads 3 -> 128, a 42.7x HBM
    # expansion — 7.97 GB per 1080p 8-frame warp, OOM with the two warps
    # of a B-frame wave resident (caught on hardware; the caller
    # moveaxes back to channel-last).
    for ch in range(3):
        out_ref[0, ch] = outs[ch]


def _windows(src: jax.Array, hb: int) -> jax.Array:
    """Padded plane [B, H + 2*MR, Wp + 256] -> overlapping window tensor
    [B, n_i, n_j, hb + 2*MR, 384].  Built from whole-row-block slices:
    contiguous copies at HBM bandwidth (~1 ms per 1080p 8-frame wave),
    NOT per-element gathers."""
    B, Hp, Wp2 = src.shape
    H = Hp - 2 * _MR
    n_i = H // hb
    n_j = (Wp2 - 2 * LANE) // LANE
    rows = []
    for i in range(n_i):
        cols = []
        for jj in range(n_j):
            cols.append(src[:, i * hb:i * hb + hb + 2 * _MR,
                            jj * LANE:jj * LANE + 3 * LANE])
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


@functools.partial(jax.jit, static_argnames=("fb", "interpret"))
def warp_bounded_pallas(packed: jax.Array, flow: jax.Array, fb: int,
                        interpret: bool = False) -> jax.Array:
    """Windowed bounded-flow warp.  packed: u32 [B, H, W] (pack_yuv_u32);
    flow: f32 [B, H, W, 2] with |flow| <= fb (callers produce bounded
    flows via ModelConfig.flow_bound); returns f32 [B, H, W, 3] in [0,1].

    Requires fb <= FB_MAX and H a multiple of 8; W is padded to a
    multiple of 128 internally.  Bit-identical to warp_packed.
    """
    if fb > FB_MAX:
        raise ValueError(f"flow bound {fb} > {FB_MAX}")
    B, H, W = packed.shape
    if H % 8:
        raise ValueError("H must be a multiple of 8")
    # hb = 32 keeps the kernel's scoped-VMEM stack well under the 16 MB
    # limit (hb = 64 measured 16.11 MB on v5e — 112 KB over).
    hb = 32 if H % 32 == 0 else 8
    wpad = (-W) % LANE
    Wp = W + wpad

    u, v = (flow if isinstance(flow, tuple)
            else (flow[..., 0], flow[..., 1]))
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    sx = jnp.clip(xx[None] + u.astype(jnp.float32), 0.0, W - 1)
    sy = jnp.clip(yy[None] + v.astype(jnp.float32), 0.0, H - 1)
    if wpad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, wpad)), mode="edge")
        sx = jnp.pad(sx, ((0, 0), (0, 0), (0, wpad)), mode="edge")
        sy = jnp.pad(sy, ((0, 0), (0, 0), (0, wpad)), mode="edge")

    src = jnp.pad(packed, ((0, 0), (_MR, _MR), (LANE, LANE)), mode="edge")
    wins = _windows(src, hb)

    grid = (B, H // hb, Wp // LANE)
    wr = hb + 2 * _MR
    out = pl.pallas_call(
        functools.partial(_warp_bounded_kernel, hb, fb, W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, wr, 3 * LANE),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, LANE), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, LANE), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, hb, LANE),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, H, Wp), jnp.float32),
        interpret=interpret,
    )(wins, sx, sy)
    return jnp.moveaxis(out[:, :, :, :W], 1, -1)
