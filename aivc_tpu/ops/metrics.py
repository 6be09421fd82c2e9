"""Quality metrics: PSNR, SSIM, MS-SSIM (JAX, jit-friendly).

Numerics follow the reference torch implementation
(reference: src/func_util/ms_ssim.py): 11-tap Gaussian window with
sigma=1.5, VALID convolution, 5 scales with weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], reflection-padding to even
dimensions before each 2x2 average-pool downscale, and the
numerically-pinned final combination prod(mcs[:-1]**w) * (mssim[-1]**w)
(reference: ms_ssim.py:139-148).  YUV metrics weight each plane by its
pixel count (reference: src/func_util/math_func.py:69-88).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(mse: jax.Array, max_value: float = 1.0) -> jax.Array:
    return 20.0 * jnp.log10(max_value) - 10.0 * jnp.log10(mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    g = jnp.array(
        [math.exp(-((i - size // 2) ** 2) / (2.0 * sigma ** 2)) for i in range(size)],
        dtype=jnp.float32,
    )
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(x: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise VALID 2-D filter on NHWC input."""
    C = x.shape[-1]
    k = window[:, :, None, None]                       # HWIO with I=1
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def ssim(img1: jax.Array, img2: jax.Array, val_range: float = 1.0,
         window_size: int = 11):
    """SSIM mean and contrast-sensitivity of NHWC images
    (reference: ms_ssim.py:37-91)."""
    H, W = img1.shape[1], img1.shape[2]
    real_size = min(window_size, H, W)
    window = _gaussian_window(real_size).astype(img1.dtype)

    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window) - mu1_mu2

    C1 = (0.01 * val_range) ** 2
    C2 = (0.03 * val_range) ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return jnp.mean(ssim_map), cs


def _reflect_pad_to_even(x: jax.Array) -> jax.Array:
    pad_h = x.shape[1] % 2
    pad_w = x.shape[2] % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    return x


def _avg_pool2(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def msssim(img1: jax.Array, img2: jax.Array, val_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM of NHWC images (reference: ms_ssim.py:94-150)."""
    weights = jnp.array(MSSSIM_WEIGHTS, dtype=img1.dtype)
    mssim, mcs = [], []
    for _ in range(len(MSSSIM_WEIGHTS)):
        sim, cs = ssim(img1, img2, val_range=val_range)
        mssim.append(sim)
        mcs.append(cs)
        img1 = _avg_pool2(_reflect_pad_to_even(img1))
        img2 = _avg_pool2(_reflect_pad_to_even(img2))
    # Clamp before the fractional powers: negative contrast terms
    # (possible for heavily distorted images) would produce NaN, and a
    # clamp at exactly 0 still yields an infinite pow-gradient (d x^w at
    # x=0), NaN-ing training with the MS-SSIM loss.  The epsilon floor
    # keeps gradients finite and leaves any sane input's value unchanged.
    # The reference exposes the same hazard behind its 'normalize' flag
    # (ms_ssim.py:130-134).
    mssim_t = jnp.maximum(jnp.stack(mssim), 1e-4)
    mcs_t = jnp.maximum(jnp.stack(mcs), 1e-4)
    pow1 = mcs_t ** weights
    pow2 = mssim_t ** weights
    # prod(pow1[:-1]) * pow2[-1], the CLIC-aligned form (ms_ssim.py:139-148)
    return jnp.prod(pow1[:-1]) * pow2[-1]


def yuv_mse(a: Dict[str, jax.Array], b: Dict[str, jax.Array]) -> jax.Array:
    """Pixel-count-weighted MSE over a YUV dict of NHWC planes
    (reference: math_func.py:53-66)."""
    se = 0.0
    n = 0
    for k in ("y", "u", "v"):
        se = se + jnp.sum((a[k] - b[k]) ** 2)
        n += a[k].size
    return se / n


def yuv_psnr(a, b, max_value: float = 1.0) -> jax.Array:
    return psnr(yuv_mse(a, b), max_value)


def yuv_msssim(a, b, max_value: float = 1.0) -> jax.Array:
    """Pixel-count-weighted per-plane MS-SSIM (reference: math_func.py:69-88)."""
    total = 0.0
    n = 0
    for k in ("y", "u", "v"):
        total = total + msssim(a[k], b[k], val_range=max_value) * a[k].size
        n += a[k].size
    return total / n


def msssim_db(ms: jax.Array) -> jax.Array:
    return -10.0 * jnp.log10(1.0 - ms)
