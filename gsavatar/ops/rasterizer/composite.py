"""Per-tile front-to-back alpha compositing — XLA implementation.

The sequential front-to-back transmittance recursion of the CUDA kernel is
re-expressed as an associative prefix-sum in log space: for slot k in a tile,
    T_k = exp( sum_{j<k} log(1 - alpha_j) ),
so the entire composite becomes (cumsum over K) + (batched matmul over K for
the color accumulation), both of which map perfectly onto the TPU VPU/MXU —
no sequential per-splat loop. Early-termination parity with the CUDA kernel
(SURVEY.md §2.9) is kept exactly:
  * splats with projected power > 0 or alpha < 1/255 are skipped (no T update);
  * alpha is clamped to 0.99;
  * a contribution is dropped — and the pixel permanently terminated — when it
    would push T below 1e-4; the background blends with the *frozen* T.
A lax.scan over fixed-size K-chunks bounds memory; everything is autodiff-able
so the backward pass (including d/d means2D for densification) comes from XLA.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .project import TILE

_LOG_TERM = math.log(1e-4)    # transmittance early-stop threshold
_MIN_ALPHA = 1.0 / 255.0
_MAX_ALPHA = 0.99


class CompositeResult(NamedTuple):
    image: jnp.ndarray        # (H, W, 3)
    alpha: jnp.ndarray        # (H, W) = 1 - final transmittance
    final_T: jnp.ndarray      # (H, W)


def _tile_pixel_coords(grid_x: int, grid_y: int, dtype=jnp.float32):
    """Pixel coordinates for every tile: (num_tiles, TILE*TILE) x/y.

    The CUDA kernel samples at integer pixel coordinates (pixf = (x, y))."""
    num_tiles = grid_x * grid_y
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = (t % grid_x).astype(dtype)
    ty = (t // grid_x).astype(dtype)
    p = jnp.arange(TILE * TILE, dtype=jnp.int32)
    px = (p % TILE).astype(dtype)
    py = (p // TILE).astype(dtype)
    pix_x = tx[:, None] * TILE + px[None, :]
    pix_y = ty[:, None] * TILE + py[None, :]
    return pix_x, pix_y


def composite(tile_gauss_idx, means2d, conics, colors, opacities,
              background, grid_x: int, grid_y: int, width: int, height: int,
              chunk: int = 64) -> CompositeResult:
    """tile_gauss_idx (num_tiles, K); per-gaussian arrays over N; background
    (3,). Returns the cropped (height, width) image/alpha."""
    num_tiles, K = tile_gauss_idx.shape
    assert K % chunk == 0, (K, chunk)
    P = TILE * TILE
    pix_x, pix_y = _tile_pixel_coords(grid_x, grid_y)

    opac = opacities.reshape(-1)

    def step(carry, idx_chunk):
        cum_log_T, log_T_frozen, color_acc = carry
        # gather per-slot gaussian data: (num_tiles, chunk, ...)
        safe = jnp.maximum(idx_chunk, 0)
        live = idx_chunk >= 0
        m2d = means2d[safe]            # (T, C, 2)
        con = conics[safe]             # (T, C, 3)
        col = colors[safe]             # (T, C, 3)
        op = opac[safe]                # (T, C)

        dx = m2d[..., 0][:, :, None] - pix_x[:, None, :]   # (T, C, P)
        dy = m2d[..., 1][:, :, None] - pix_y[:, None, :]
        a = con[..., 0][:, :, None]
        b = con[..., 1][:, :, None]
        c = con[..., 2][:, :, None]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(_MAX_ALPHA, op[:, :, None] * jnp.exp(power))
        skip = (power > 0.0) | (alpha < _MIN_ALPHA) | (~live[:, :, None])
        log1m = jnp.where(skip, 0.0, jnp.log1p(-alpha))

        cum = cum_log_T[:, None, :] + jnp.cumsum(log1m, axis=1)  # incl. (T,C,P)
        include = cum >= _LOG_TERM
        T_before = jnp.exp(cum - log1m)
        w = jnp.where(include & ~skip, alpha * T_before, 0.0)    # (T, C, P)

        color_acc = color_acc + jnp.einsum(
            'tcp,tcd->tpd', w, col, preferred_element_type=jnp.float32)
        chunk_min = jnp.min(jnp.where(include & ~skip, cum, jnp.inf), axis=1)
        log_T_frozen = jnp.where(jnp.isfinite(chunk_min), chunk_min,
                                 log_T_frozen)
        return (cum[:, -1, :], log_T_frozen, color_acc), None

    from gsavatar.parallel.context import hint
    init = (hint(jnp.zeros((num_tiles, P), jnp.float32), 'model'),
            hint(jnp.zeros((num_tiles, P), jnp.float32), 'model'),
            hint(jnp.zeros((num_tiles, P, 3), jnp.float32), 'model'))
    idx_chunks = tile_gauss_idx.reshape(num_tiles, K // chunk, chunk) \
                               .transpose(1, 0, 2)
    idx_chunks = hint(idx_chunks, None, 'model')
    (cum_log_T, log_T_frozen, color_acc), _ = jax.lax.scan(
        step, init, idx_chunks)

    final_T = jnp.exp(log_T_frozen)                          # (T, P)
    out = color_acc + final_T[..., None] * background[None, None, :]

    # (num_tiles, P, ch) -> (H_pad, W_pad, ch) -> crop
    def untile(x, ch):
        x = x.reshape(grid_y, grid_x, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(grid_y * TILE, grid_x * TILE, ch)[:height, :width]

    image = untile(out, 3)
    final_T_img = untile(final_T[..., None], 1)[..., 0]
    return CompositeResult(image=image, alpha=1.0 - final_T_img,
                           final_T=final_T_img)
