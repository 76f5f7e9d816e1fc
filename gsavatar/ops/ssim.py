"""SSIM with the 3DGS 11x11 Gaussian window (parity: utils/loss_utils.py:27-67).

Images are HWC float. The separable Gaussian window runs as two depthwise
convs (XLA lowers these to efficient TPU convolutions); SAME zero padding
matches torch's conv2d padding=window//2."""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache()
def _window(window_size: int, sigma: float):
    x = np.arange(window_size)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _blur(img, window_size: int):
    """Depthwise separable Gaussian blur. img (H, W, C)."""
    g = jnp.asarray(_window(window_size, 1.5))
    C = img.shape[-1]
    x = img[None].transpose(0, 3, 1, 2)                    # NCHW
    kh = jnp.tile(g.reshape(1, 1, -1, 1), (C, 1, 1, 1))    # (C,1,K,1)
    kw = jnp.tile(g.reshape(1, 1, 1, -1), (C, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ('NCHW', 'OIHW', 'NCHW'))
    pad = window_size // 2
    x = lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=C)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=C)
    return x.transpose(0, 2, 3, 1)[0]


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over an (H, W, C) image pair, matching the reference's
    constants (C1=0.01^2, C2=0.03^2) and mean reduction."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / \
        ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()
