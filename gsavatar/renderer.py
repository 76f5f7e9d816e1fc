"""render() — the full per-frame forward pass.

Parity: gaussian_renderer/__init__.py:59-153 of the reference: convert the
canonical gaussians through the avatar stack, then rasterize with precomputed
colors and python-side covariance (the reference's configured default,
configs/config.yaml:89-92). One rasterizer pass yields both the color image
and the opacity image (the reference runs the CUDA kernel twice)."""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.core.gaussians import Gaussians
from gsavatar.ops.rasterizer import RasterizeConfig, rasterize


class RenderPackage(NamedTuple):
    render: Any              # (H, W, 3)
    opacity_render: Any      # (H, W)
    viewspace_grad_hook: Any  # (N, 2) zeros the caller differentiates against
    visibility_filter: Any   # (N,) bool
    radii: Any               # (N,) int32
    loss_reg: Any            # dict
    deformed_gaussians: Any  # Gaussians
    colors: Any              # (N, 3)
    pair_overflow: Any
    tile_overflow: Any
    rect_dropped: Any
    n_pairs: Any             # () int32 real (tile,splat) pair count
    max_rect_side: Any       # () int32 pre-clamp max tiles-per-axis

    @property
    def render_chw(self):
        return jnp.transpose(self.render, (2, 0, 1))


def render(converter, conv_params, gaussians: Gaussians, camera, iteration,
           raster_config: RasterizeConfig, background,
           *, train: bool = False, rng: Optional[jax.Array] = None,
           scaling_modifier: float = 1.0, means2d_offset=None,
           override_color=None, nr_cache=None) -> RenderPackage:
    deformed, loss_reg, colors = converter.apply(
        conv_params, gaussians, camera, iteration, train=train, rng=rng,
        nr_cache=nr_cache)

    if override_color is not None:
        colors = override_color

    cov3d = deformed.get_covariance(scaling_modifier)
    opacity = deformed.get_opacity

    if means2d_offset is None:
        means2d_offset = jnp.zeros_like(deformed.get_xyz[:, :2])

    res = rasterize(
        deformed.get_xyz, colors, opacity, cov3d,
        viewmatrix=camera.world_view_transform,
        full_projmatrix=camera.full_proj_transform,
        tanfovx=camera.tanfovx, tanfovy=camera.tanfovy,
        background=background, config=raster_config,
        active=deformed.alive, means2d_offset=means2d_offset)

    return RenderPackage(
        render=res.image, opacity_render=res.alpha,
        viewspace_grad_hook=means2d_offset,
        visibility_filter=res.radii > 0, radii=res.radii,
        loss_reg=loss_reg, deformed_gaussians=deformed, colors=colors,
        pair_overflow=res.pair_overflow, tile_overflow=res.tile_overflow,
        rect_dropped=res.rect_dropped, n_pairs=res.n_pairs,
        max_rect_side=res.max_rect_side)
