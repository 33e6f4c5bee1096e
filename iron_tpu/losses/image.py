"""Image-space losses: Gaussian-pyramid L2 and masked SSIM.

Behavioral specs from reference `models/image_losses.py`:
  * PyramidL2Loss (13-48): 5 levels; each level = 7x7 Gaussian(sigma=1)
    depthwise conv (padding 3) then 2x average pool; loss = sum over levels
    of sum(diff^2) / (H_l * W_l) using the *original* H,W divided by 2^l
    as the normalizer;
  * ssim_loss_fn (97-158): separable 11x11 Gaussian(sigma=1.5) windows,
    valid-conv SSIM map, mean over channels; with a mask, the map is
    constant-padded back to input size and the mask is eroded by the
    window before averaging; returns 1 - mean.

TPU-first: convolutions via lax.conv_general_dilated with feature_group_count
(depthwise) so XLA maps them to the conv unit; erosion via reduce_window min.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _gauss7x7() -> np.ndarray:
    """7x7 Gaussian(sigma=1.0) filter matching scipy.ndimage.gaussian_filter
    of a centered dirac (image_losses.py:17-21)."""
    # 1-D Gaussian with radius 3 (scipy truncate=4.0 covers it at sigma=1)
    x = np.arange(-3, 4)
    g = np.exp(-x ** 2 / 2.0)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _gauss1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv2d(x: jnp.ndarray, kern2d: np.ndarray, padding) -> jnp.ndarray:
    """x [B,C,H,W], kern2d [kh,kw] applied per channel."""
    C = x.shape[1]
    kh, kw = kern2d.shape
    k = jnp.asarray(kern2d)[None, None].repeat(C, axis=0)  # [C,1,kh,kw]
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                                 "VALID") / 4.0


def pyramid_l2_loss(pred_img: jnp.ndarray, trgt_img: jnp.ndarray) -> jnp.ndarray:
    """pred/trgt [B,C,H,W] -> scalar (image_losses.py:29-48)."""
    h, w = pred_img.shape[-2:]
    g = _gauss7x7()
    diff = pred_img - trgt_img
    loss = jnp.sum(diff ** 2) / (h * w)
    for lvl in range(1, 5):
        diff = _avg_pool2(_depthwise_conv2d(diff, g, [(3, 3), (3, 3)]))
        loss = loss + jnp.sum(diff ** 2) / ((h / 2.0 ** lvl) * (w / 2.0 ** lvl))
    return loss


def _erode(mask: jnp.ndarray, win: int) -> jnp.ndarray:
    """Binary erosion by a win x win ones kernel; mask [B,1,H,W] float."""
    return jax.lax.reduce_window(mask, jnp.inf, jax.lax.min,
                                 (1, 1, win, win), (1, 1, 1, 1),
                                 [(0, 0), (0, 0), (win // 2, win // 2), (win // 2, win // 2)])


def ssim_loss(X: jnp.ndarray, Y: jnp.ndarray, mask: jnp.ndarray | None = None,
              data_range: float = 1.0, win_size: int = 11, win_sigma: float = 1.5,
              K=(0.01, 0.03)) -> jnp.ndarray:
    """1 - masked-mean SSIM, inputs [B,C,H,W] (image_losses.py:97-158).

    With a mask, the valid-conv ssim map is padded with 1.0 back to input
    size and averaged over the eroded mask — but as a fixed-shape masked
    mean (no boolean compaction).
    """
    C = X.shape[1]
    K1, K2 = K
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    g1 = _gauss1d(win_size, win_sigma)
    kern = np.outer(g1, g1)

    f = lambda img: _depthwise_conv2d(img, kern, "VALID")
    mu1, mu2 = f(X), f(Y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = f(X * X) - mu1_sq
    sigma2_sq = f(Y * Y) - mu2_sq
    sigma12 = f(X * Y) - mu1_mu2

    cs = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs
    ssim_map = jnp.mean(ssim_map, axis=1, keepdims=True)

    if mask is None:
        return 1.0 - jnp.mean(ssim_map)

    pad = win_size // 2
    ssim_full = jnp.pad(ssim_map, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                        constant_values=1.0)
    m = _erode(mask.astype(jnp.float32), win_size) > 0.5
    m = m.astype(ssim_full.dtype)
    mean = jnp.sum(ssim_full * m) / jnp.clip(jnp.sum(m), 1.0)
    return 1.0 - mean


def psnr(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """PSNR with optional mask (render_volume.py:384 convention)."""
    if mask is None:
        mse = jnp.mean((pred - target) ** 2)
    else:
        m = mask.astype(pred.dtype)
        mse = jnp.sum(((pred - target) ** 2) * m) / (jnp.sum(m) * pred.shape[-1] + 1e-5)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-12))
