"""Evaluation metrics.

Parity: utils/general_utils.py:221-312 of the reference — the ZJU-MoCap
Evaluator (PSNR = -10 log10 MSE, scikit-image-style SSIM over a mask bbox,
LPIPS-VGG) and the PeopleSnapshot PSEvaluator (torchmetrics-style
PSNR/SSIM data_range=1 + LPIPS-Alex). The LPIPS term is keyed by the
active weight source: 'lpips' only with an exported pretrained bundle
(reference-comparable values), 'lpips_rand' with the documented
random-backbone fallback (a one-time warning is printed), absent when
LPIPS is off entirely (ops/lpips.py docstring)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gsavatar.ops import lpips as lpips_mod
from gsavatar.ops.ssim import ssim as ssim_3dgs

_warned_random = set()


def _warn_random_once(net: str):
    if net not in _warned_random:
        _warned_random.add(net)
        print(f"[gsavatar] LPIPS-{net}: no exported pretrained weights — "
              f"reporting the random-backbone metric as 'lpips_rand' "
              f"(NOT comparable to published LPIPS numbers).", flush=True)


def psnr(img, gt, valid_mask=None):
    value = (img - gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    return float(-10.0 * jnp.log10(jnp.mean(value)))


def _bbox_of_mask(mask: np.ndarray):
    ys, xs = np.where(mask > 0)
    if len(ys) == 0:
        return 0, mask.shape[0], 0, mask.shape[1]
    return ys.min(), ys.max() + 1, xs.min(), xs.max() + 1


def ssim_masked(img, gt, valid_mask=None):
    """SSIM over the mask bounding box (general_utils.py:253-273 crops with
    cv2.boundingRect before scoring)."""
    img = np.asarray(img)
    gt = np.asarray(gt)
    if valid_mask is not None:
        y0, y1, x0, x1 = _bbox_of_mask(np.asarray(valid_mask))
        img = img[y0:y1, x0:x1]
        gt = gt[y0:y1, x0:x1]
    return float(ssim_3dgs(jnp.asarray(img), jnp.asarray(gt)))


class Evaluator:
    """ZJU-MoCap metric bundle (general_utils.py:221-236): LPIPS-VGG over
    the mask bounding box."""

    lpips_net = 'vgg'

    def __call__(self, img, gt, valid_mask=None):
        out = {'psnr': psnr(img, gt, valid_mask),
               'ssim': ssim_masked(img, gt, valid_mask)}
        key = lpips_mod.metric_key(self.lpips_net)
        if key is not None:
            if key == 'lpips_rand':
                _warn_random_once(self.lpips_net)
            a, b = jnp.asarray(img), jnp.asarray(gt)
            if valid_mask is not None:
                y0, y1, x0, x1 = _bbox_of_mask(np.asarray(valid_mask))
                a, b = a[y0:y1, x0:x1], b[y0:y1, x0:x1]
            # metric path pins f32 — the bf16 TPU default is training-loss
            # only (ops/lpips.py, ADVICE r4)
            out[key] = float(lpips_mod.lpips(a, b, net=self.lpips_net,
                                             compute_dtype=jnp.float32))
        return out


class PSEvaluator(Evaluator):
    """PeopleSnapshot metric bundle (general_utils.py:294-312). Same PSNR
    formula at data_range=1; SSIM without mask cropping; LPIPS uses the
    Alex backbone like the reference's PSEvaluator."""

    lpips_net = 'alex'

    def __call__(self, img, gt, valid_mask=None):
        out = {'psnr': psnr(img, gt),
               'ssim': float(ssim_3dgs(jnp.asarray(img), jnp.asarray(gt)))}
        key = lpips_mod.metric_key(self.lpips_net)
        if key is not None:
            if key == 'lpips_rand':
                _warn_random_once(self.lpips_net)
            out[key] = float(lpips_mod.lpips(jnp.asarray(img),
                                             jnp.asarray(gt),
                                             net=self.lpips_net,
                                             compute_dtype=jnp.float32))
        return out


def get_evaluator(dataset_name: str):
    return PSEvaluator() if dataset_name == 'people_snapshot' else Evaluator()
