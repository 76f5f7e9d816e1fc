"""LPIPS perceptual distance (VGG16 and AlexNet backbones) in JAX.

Parity target: the `lpips` package as used for the training perceptual loss
(train.py:64,127-138), the ZJU eval metric (LPIPS-VGG,
utils/general_utils.py:276-292) and the PeopleSnapshot eval metric
(LPIPS-Alex, utils/general_utils.py:294-312). Architecture: backbone conv
stack, unit-normalized activations at 5 tap points, learned 1x1 "lin"
weights, spatial mean, layer sum; inputs scaled from [0,1] to [-1,1]
(normalize=True) then shifted/scaled by the ImageNet constants.

Weight sources, in priority order:
  1. An exported .npz bundle (from the torch lpips checkpoint via
     `export_weights_from_torch`) at GSAVATAR_LPIPS_WEIGHTS (vgg) /
     GSAVATAR_LPIPS_WEIGHTS_ALEX or weights/lpips_{net}.npz — bit-parity
     with the reference's metric. The export path (slice walking, key
     naming, forward semantics) is verified against a real torch module
     with random weights in tests/test_lpips_export.py, so it is
     known-correct the day pretrained weights appear.
  2. A deterministic randomly-initialized backbone (`random_weights`):
     He-init convs, uniform 1/C lin weights. This image has no
     torchvision/lpips weights and no network egress, so this fallback
     keeps the perceptual TRAINING loss live by default. Random-feature
     nets are a known reasonable perceptual distance (structurally the same
     metric, different filters) but absolute values are NOT comparable to
     the reference's — eval therefore reports the metric under the key
     `lpips_rand` (never `lpips`) when this source is active, and
     training() logs `lpips_weights` into metrics.jsonl at run start.
     Set GSAVATAR_LPIPS_FALLBACK=0 to disable the fallback entirely (then
     `available()` is False without a bundle)."""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# backbone specs: stages are the 5 tap points; each stage optionally
# max-pools its input then applies convs (out_ch, kernel, stride, pad),
# each followed by ReLU. VGG16: torchvision features, taps at
# relu{1_2,2_2,3_3,4_3,5_3}. Alex: torchvision alexnet.features, taps at
# relu1..relu5 (the slices of lpips.pretrained_networks.alexnet).
_NETS = {
    'vgg': [
        {'pool': None, 'convs': [(64, 3, 1, 1), (64, 3, 1, 1)]},
        {'pool': (2, 2), 'convs': [(128, 3, 1, 1), (128, 3, 1, 1)]},
        {'pool': (2, 2), 'convs': [(256, 3, 1, 1)] * 3},
        {'pool': (2, 2), 'convs': [(512, 3, 1, 1)] * 3},
        {'pool': (2, 2), 'convs': [(512, 3, 1, 1)] * 3},
    ],
    'alex': [
        {'pool': None, 'convs': [(64, 11, 4, 2)]},
        {'pool': (3, 2), 'convs': [(192, 5, 1, 2)]},
        {'pool': (3, 2), 'convs': [(384, 3, 1, 1)]},
        {'pool': None, 'convs': [(256, 3, 1, 1)]},
        {'pool': None, 'convs': [(256, 3, 1, 1)]},
    ],
}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _default_paths(net: str):
    env = 'GSAVATAR_LPIPS_WEIGHTS' if net == 'vgg' \
        else f'GSAVATAR_LPIPS_WEIGHTS_{net.upper()}'
    return (os.environ.get(env, ''), f'weights/lpips_{net}.npz')


@functools.lru_cache()
def _load_weights_cached(path_key: str, net: str):
    for p in (path_key,) if path_key else _default_paths(net):
        if p and os.path.exists(p):
            data = dict(np.load(p))
            return {k: jnp.asarray(v) for k, v in data.items()}
    return None


@functools.lru_cache()
def random_weights(seed: int = 0, net: str = 'vgg'):
    """Deterministic random backbone + LPIPS-lin weights (fallback source
    #2). He-normal convs; lin weights uniform 1/C (a per-layer mean)."""
    rng = np.random.default_rng(seed)
    out = {}
    i, in_ch = 0, 3
    taps = []
    for stage in _NETS[net]:
        for ch, k, _, _ in stage['convs']:
            fan_in = in_ch * k * k
            out[f'conv{i}_w'] = jnp.asarray(
                rng.normal(0.0, np.sqrt(2.0 / fan_in),
                           (ch, in_ch, k, k)).astype(np.float32))
            out[f'conv{i}_b'] = jnp.zeros((ch,), jnp.float32)
            in_ch = ch
            i += 1
        taps.append(in_ch)
    for li, ch in enumerate(taps):
        out[f'lin{li}_w'] = jnp.full((1, ch, 1, 1), 1.0 / ch, jnp.float32)
    return out


def _fallback_enabled() -> bool:
    return os.environ.get('GSAVATAR_LPIPS_FALLBACK', '1') != '0'


def get_weights(path: Optional[str] = None, net: str = 'vgg'):
    """Best-available weights: exported bundle else random fallback else
    None."""
    w = _load_weights_cached(path or '', net)
    if w is not None:
        return w
    if _fallback_enabled():
        return random_weights(net=net)
    return None


def weights_kind(path: Optional[str] = None,
                 net: str = 'vgg') -> Optional[str]:
    if _load_weights_cached(path or '', net) is not None:
        return 'exported'
    if _fallback_enabled():
        return 'random'
    return None


def metric_key(net: str = 'vgg') -> Optional[str]:
    """Eval-metric name for the active weight source: 'lpips' only for
    exported (reference-comparable) weights, 'lpips_rand' for the random
    fallback, None when LPIPS is off entirely."""
    kind = weights_kind(net=net)
    if kind == 'exported':
        return 'lpips'
    if kind == 'random':
        return 'lpips_rand'
    return None


def available(path: Optional[str] = None, net: str = 'vgg') -> bool:
    return get_weights(path, net) is not None


def _conv(x, w, b, stride, pad):
    """x NCHW, w (out,in,kh,kw) torch layout."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return y + b.reshape(1, -1, 1, 1)


def _net_features(x, wts, net: str, compute_dtype=None):
    """On TPU the backbone runs in bfloat16 (activations AND weights): the
    (1,64,256,256) f32 activation buffers between conv fusions were
    ~3 ms/step of pure HBM traffic, and the perceptual term is a 1e-2
    weighted trained-feature distance — half precision is well inside its
    noise floor. Feature maps are cast back to f32 for the normalize /
    diff / lin head so the metric value stays f32. CPU (tests, exports)
    keeps f32 end to end."""
    if compute_dtype is None:
        forced = os.environ.get('GSAVATAR_LPIPS_DTYPE')
        if forced:
            # bench precision gate: trace the same training loss with a
            # forced backbone dtype to measure the bf16-vs-f32 delta
            compute_dtype = jnp.dtype(forced)
        else:
            compute_dtype = (jnp.bfloat16
                             if jax.default_backend() in ('tpu', 'axon')
                             else jnp.float32)
    x = x.astype(compute_dtype)
    feats = []
    i = 0
    for stage in _NETS[net]:
        if stage['pool'] is not None:
            k, s = stage['pool']
            # init must be a concrete scalar (a traced init breaks the
            # reduce_window autodiff rule); the weak-typed python float
            # follows x's dtype
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
                'VALID')
        for ch, kk, st, pd in stage['convs']:
            x = _conv(x, wts[f'conv{i}_w'].astype(compute_dtype),
                      wts[f'conv{i}_b'].astype(compute_dtype), st, pd)
            x = jax.nn.relu(x)
            i += 1
        # tap features stay in compute dtype: the (1,64,256,256) f32
        # buffers between the head's normalize/diff passes were ~2 ms/step
        # of pure HBM traffic (round-5 trace); the head accumulates its
        # sums in f32 regardless (lpips() dtype= args)
        feats.append(x)
    return feats


def lpips(img1, img2, weights=None, normalize: bool = True,
          net: str = 'vgg', compute_dtype=None):
    """img (H, W, 3) in [0,1] (normalize=True) or [-1,1]. Returns scalar.

    compute_dtype: backbone precision. None = platform default (bf16 on
    TPU for the 1e-2-weighted TRAINING loss, f32 elsewhere). Validation /
    eval metric entry points pass jnp.float32 explicitly so reported
    val/test LPIPS carries no bf16 backbone noise relative to the
    reference's f32 torch LPIPS (ADVICE r4)."""
    wts = weights if weights is not None else get_weights(net=net)
    if wts is None:
        raise RuntimeError("LPIPS weights not available "
                           "(see gsavatar/ops/lpips.py docstring)")

    def prep(im):
        x = jnp.transpose(im, (2, 0, 1))[None]          # NCHW
        if normalize:
            x = 2.0 * x - 1.0
        return (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) \
            / jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

    f1 = _net_features(prep(img1), wts, net, compute_dtype=compute_dtype)
    f2 = _net_features(prep(img2), wts, net, compute_dtype=compute_dtype)
    total = 0.0
    for li, (a, b) in enumerate(zip(f1, f2)):
        # channel-norm sums accumulate in f32 even when the features ride
        # bf16; the normalized features stay in compute dtype so the big
        # activation buffers are written once at half width
        na = jax.lax.rsqrt(jnp.sum((a * a).astype(jnp.float32), axis=1,
                                   keepdims=True) + 1e-10)
        nb = jax.lax.rsqrt(jnp.sum((b * b).astype(jnp.float32), axis=1,
                                   keepdims=True) + 1e-10)
        d = (a * na.astype(a.dtype) - b * nb.astype(b.dtype)) ** 2
        lin = wts[f'lin{li}_w'].astype(d.dtype)          # (1, C, 1, 1)
        total = total + jnp.mean(
            jnp.sum((d * lin.reshape(1, -1, 1, 1)).astype(jnp.float32),
                    axis=1))
    return total


def export_weights_from_module(m, out_path: str):
    """Convert a torch `lpips.LPIPS` module (any backbone) into our npz
    bundle. Walks the five feature slices in order collecting Conv2d
    weights, then the five lin heads. Verified against a torch forward in
    tests/test_lpips_export.py."""
    out = {}
    i = 0
    for si in range(1, 6):
        for layer in getattr(m.net, f'slice{si}'):
            if layer.__class__.__name__ == 'Conv2d':
                out[f'conv{i}_w'] = layer.weight.detach().numpy()
                out[f'conv{i}_b'] = layer.bias.detach().numpy()
                i += 1
    for li, lin in enumerate(m.lins):
        out[f'lin{li}_w'] = lin.model[-1].weight.detach().numpy()
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    np.savez(out_path, **out)
    return out_path


def export_weights_from_torch(out_path: str = 'weights/lpips_vgg.npz',
                              net: str = 'vgg'):
    """Convert a torch `lpips.LPIPS(net=...)` checkpoint into our npz
    bundle. Requires torchvision weights locally (not present in this
    image — run wherever the reference environment exists)."""
    import lpips as lpips_torch  # type: ignore
    return export_weights_from_module(lpips_torch.LPIPS(net=net), out_path)
