"""LPIPS perceptual distance (VGG16 backbone) in JAX.

Parity target: the `lpips` package as used for the training perceptual loss
(train.py:64,127-138) and eval metric (utils/general_utils.py:276-292).
Architecture: VGG16 conv stack, unit-normalized activations at
relu{1_2,2_2,3_3,4_3,5_3}, learned 1x1 "lin" weights, spatial mean, layer
sum; inputs scaled from [0,1] to [-1,1] (normalize=True) then shifted/scaled
by the ImageNet constants.

Weight sources, in priority order:
  1. An exported .npz bundle (from the torch lpips checkpoint via
     `export_weights_from_torch`) at GSAVATAR_LPIPS_WEIGHTS or
     weights/lpips_vgg.npz — bit-parity with the reference's metric.
  2. A deterministic randomly-initialized VGG (`random_weights(seed)`):
     He-init convs, uniform 1/C lin weights. This image has no
     torchvision/lpips weights and no network egress, so this fallback keeps
     the perceptual loss LIVE by default. Random-feature VGG is a known
     reasonable perceptual distance (structurally identical metric, different
     filters); absolute LPIPS values are NOT comparable to the reference's —
     a documented delta (COMPONENTS.md). Callers can query `weights_kind()`
     to report which source is active, or set GSAVATAR_LPIPS_FALLBACK=0 to
     disable the fallback (then `available()` is False without a bundle)."""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, n_convs) per block
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATHS = (os.environ.get('GSAVATAR_LPIPS_WEIGHTS', ''),
                  'weights/lpips_vgg.npz')


@functools.lru_cache()
def _load_weights_cached(path_key: str):
    for p in (path_key,) if path_key else _DEFAULT_PATHS:
        if p and os.path.exists(p):
            data = dict(np.load(p))
            return {k: jnp.asarray(v) for k, v in data.items()}
    return None


@functools.lru_cache()
def random_weights(seed: int = 0):
    """Deterministic random VGG16 + LPIPS-lin weights (fallback source #2).
    He-normal convs; lin weights uniform 1/C (a plain per-layer mean)."""
    rng = np.random.default_rng(seed)
    out = {}
    i, in_ch = 0, 3
    for ch, n in _BLOCKS:
        for _ in range(n):
            fan_in = in_ch * 9
            out[f'conv{i}_w'] = jnp.asarray(
                rng.normal(0.0, np.sqrt(2.0 / fan_in),
                           (ch, in_ch, 3, 3)).astype(np.float32))
            out[f'conv{i}_b'] = jnp.zeros((ch,), jnp.float32)
            in_ch = ch
            i += 1
    for li, (ch, _) in enumerate(_BLOCKS):
        out[f'lin{li}_w'] = jnp.full((1, ch, 1, 1), 1.0 / ch, jnp.float32)
    return out


def _fallback_enabled() -> bool:
    return os.environ.get('GSAVATAR_LPIPS_FALLBACK', '1') != '0'


def get_weights(path: Optional[str] = None):
    """Best-available weights: exported bundle else random fallback else
    None."""
    w = _load_weights_cached(path or '')
    if w is not None:
        return w
    if _fallback_enabled():
        return random_weights()
    return None


def weights_kind(path: Optional[str] = None) -> Optional[str]:
    if _load_weights_cached(path or '') is not None:
        return 'exported'
    if _fallback_enabled():
        return 'random'
    return None


def available(path: Optional[str] = None) -> bool:
    return get_weights(path) is not None


def _conv(x, w, b):
    """x NCHW, w (out,in,kh,kw) torch layout."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return y + b.reshape(1, -1, 1, 1)


def _vgg_features(x, wts):
    feats = []
    i = 0
    for bi, (ch, n) in enumerate(_BLOCKS):
        for ci in range(n):
            x = _conv(x, wts[f'conv{i}_w'], wts[f'conv{i}_b'])
            x = jax.nn.relu(x)
            i += 1
        feats.append(x)
        if bi < len(_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), 'VALID')
    return feats


def lpips(img1, img2, weights=None, normalize: bool = True):
    """img (H, W, 3) in [0,1] (normalize=True) or [-1,1]. Returns scalar."""
    wts = weights or get_weights()
    if wts is None:
        raise RuntimeError("LPIPS weights not available "
                           "(see gsavatar/ops/lpips.py docstring)")

    def prep(im):
        x = jnp.transpose(im, (2, 0, 1))[None]          # NCHW
        if normalize:
            x = 2.0 * x - 1.0
        return (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) \
            / jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    f1 = _vgg_features(prep(img1), wts)
    f2 = _vgg_features(prep(img2), wts)
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = wts[f'lin{li}_w']                          # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin.reshape(1, -1, 1, 1),
                                         axis=1))
    return total


def export_weights_from_torch(out_path: str = 'weights/lpips_vgg.npz'):
    """Convert a torch `lpips.LPIPS(net='vgg')` checkpoint into our npz
    bundle. Requires torchvision weights locally (not present in this image —
    run wherever the reference environment exists)."""
    import lpips as lpips_torch  # type: ignore
    m = lpips_torch.LPIPS(net='vgg')
    out = {}
    convs = [l for l in m.net.slice1] + [l for l in m.net.slice2] \
        + [l for l in m.net.slice3] + [l for l in m.net.slice4] \
        + [l for l in m.net.slice5]
    i = 0
    for layer in convs:
        if layer.__class__.__name__ == 'Conv2d':
            out[f'conv{i}_w'] = layer.weight.detach().numpy()
            out[f'conv{i}_b'] = layer.bias.detach().numpy()
            i += 1
    for li, lin in enumerate(m.lins):
        out[f'lin{li}_w'] = lin.model[-1].weight.detach().numpy()
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    np.savez(out_path, **out)
    return out_path
