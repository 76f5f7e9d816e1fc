"""Public differentiable rasterizer API.

Replaces the reference's `GaussianRasterizer` call
(gaussian_renderer/__init__.py:100-129) with a single fused-by-XLA pipeline:
project -> tile-assign -> sort -> composite. One call returns the color image
AND the alpha/opacity image (the reference needs a second full rasterizer pass
for that — we read it off the same transmittance accumulator for free).

Differentiability contract (SURVEY.md §2.9): gradients flow to means3d,
colors, opacities, cov3d, and — through `means2d_offset`, a zeros tensor the
caller passes in — to the 2D screen means in the same NDC*half-size units the
CUDA kernel reports (used for densification stats).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import struct

from . import composite as _composite
from . import project as _project
from . import tiling as _tiling
from .project import TILE


def resolve_backend(name: str = 'auto') -> str:
    """'auto' -> fused pallas kernels when the default device is a TPU
    (incl. the axon tunnel platform), XLA dense-scan path otherwise."""
    if name != 'auto':
        return name
    import jax
    return 'pallas' if jax.default_backend() in ('tpu', 'axon') else 'xla'


@struct.dataclass
class RasterizeConfig:
    width: int = struct.field(pytree_node=False, default=512)
    height: int = struct.field(pytree_node=False, default=512)
    max_pairs: int = struct.field(pytree_node=False, default=2 ** 21)
    per_tile_capacity: int = struct.field(pytree_node=False, default=512)
    chunk: int = struct.field(pytree_node=False, default=64)
    # static per-splat tile window (pairs path): splats overlapping more
    # than max_rect tiles per axis have a centered clamped window (dropped
    # tiles counted in rect_dropped)
    max_rect: int = struct.field(pytree_node=False, default=8)
    # 'pallas' = fused per-tile kernels (pallas_composite.py, TPU speed
    # path, no per-tile capacity); 'xla' = dense-matrix scan (composite.py,
    # reference path, runs anywhere); 'pallas_interpret' = pallas kernels in
    # interpreter mode (CPU testing)
    backend: str = struct.field(pytree_node=False, default='xla')

    @property
    def grid_x(self) -> int:
        return (self.width + TILE - 1) // TILE

    @property
    def grid_y(self) -> int:
        return (self.height + TILE - 1) // TILE


class RasterizeResult(NamedTuple):
    image: jnp.ndarray          # (H, W, 3)
    alpha: jnp.ndarray          # (H, W)
    radii: jnp.ndarray          # (N,) int32; >0 == visible
    n_pairs: jnp.ndarray        # () int32
    pair_overflow: jnp.ndarray  # () int32
    tile_overflow: jnp.ndarray  # () int32
    rect_dropped: jnp.ndarray   # () int32 (pairs backend max_rect clamp)
    # () int32 max tiles-per-axis any visible splat spans BEFORE clamping —
    # the training driver sizes the static rect window (config.max_rect)
    # from this observation (train.py pair/rect ladder)
    max_rect_side: jnp.ndarray = jnp.zeros((), jnp.int32)


def rasterize(means3d, colors, opacities, cov3d, *, viewmatrix,
              full_projmatrix, tanfovx, tanfovy, background,
              config: RasterizeConfig, active=None,
              means2d_offset=None) -> RasterizeResult:
    """means3d (N,3); colors (N,3) precomputed RGB; opacities (N,1) or (N,);
    cov3d (N,6) upper-triangular world covariance; matrices row-vector
    convention (Camera fields); background (3,); active (N,) bool arena mask;
    means2d_offset (N,2) zeros hook for screen-space gradients."""
    proj = _project.project(
        means3d, cov3d, viewmatrix, full_projmatrix, tanfovx, tanfovy,
        config.width, config.height, active=active,
        means2d_offset=means2d_offset)

    vis = proj.tiles_touched > 0
    side = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0],
                       proj.rect_max[:, 1] - proj.rect_min[:, 1])
    max_side = jnp.max(jnp.where(vis, side, 0)).astype(jnp.int32)

    if config.backend.startswith('pallas'):
        return _rasterize_pairs(proj, colors, opacities, background, config,
                                max_side)

    assign = _tiling.build_tile_assignment(
        proj, config.grid_x, config.grid_y, config.max_pairs,
        config.per_tile_capacity)

    # under a sharding scope (parallel/context.py) the dense tile matrix is
    # laid out over `model`: each shard composites its own tile rows; XLA
    # all-gathers the (model-sharded) projected splat arrays to tile owners
    from gsavatar.parallel.context import hint
    tile_gauss_idx = hint(assign.tile_gauss_idx, 'model')

    comp = _composite.composite(
        tile_gauss_idx, proj.means2d, proj.conics, colors, opacities,
        background, config.grid_x, config.grid_y, config.width, config.height,
        chunk=config.chunk)

    return RasterizeResult(
        image=comp.image, alpha=comp.alpha, radii=proj.radii,
        n_pairs=assign.n_pairs, pair_overflow=assign.pair_overflow,
        tile_overflow=assign.tile_overflow,
        rect_dropped=jnp.zeros((), jnp.int32), max_rect_side=max_side)


def _untile(x, grid_x, grid_y, width, height):
    """(num_tiles, 16*16, ch) -> (height, width, ch)."""
    ch = x.shape[-1]
    x = x.reshape(grid_y, grid_x, TILE, TILE, ch)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(grid_y * TILE, grid_x * TILE, ch)[:height, :width]


def _rasterize_pairs(proj, colors, opacities, background, config,
                     max_side):
    from . import pairs as _pairs
    from . import pallas_composite as _pc

    # chunk rows of tail padding (the kernel's last DMA may overrun the
    # final tile range) + lane padding to a full 128-lane tile happen
    # inside build_pairs' custom gather, whose VJP consumes the raw padded
    # gradient buffer directly (no pad/slice transpose passes)
    pa = _pairs.build_pairs(proj, colors, opacities, config.grid_x,
                            config.grid_y, config.max_pairs,
                            max_rect=config.max_rect,
                            pad_rows=config.chunk, lanes=_pc.PAIR_LANES)
    pair_data = pa.pair_data

    num_tiles = config.grid_x * config.grid_y
    interpret = config.backend.endswith('interpret')
    # under a ('data','model') mesh the fused compositor is partitioned
    # over `model` via shard_map: each shard composites its contiguous
    # tile-range slice (pairs are tile-sorted, so every shard's work is one
    # contiguous pair span); the backward psums per-shard pair gradients
    from gsavatar.parallel.context import active_mesh
    mesh = active_mesh()
    if (mesh is not None and mesh.shape.get('model', 1) > 1
            and num_tiles % mesh.shape['model'] == 0):
        f = _pc.make_composite_pairs_sharded(
            num_tiles, config.grid_x, mesh, chunk=config.chunk,
            interpret=interpret)
    else:
        f = _pc.make_composite_pairs(
            num_tiles, config.grid_x, chunk=config.chunk,
            interpret=interpret)
    raw = f(pair_data, pa.tile_start)                       # (T, 8, 256)

    acc = _untile(raw[:, 0:3, :].transpose(0, 2, 1), config.grid_x,
                  config.grid_y, config.width, config.height)
    final_T = _untile(raw[:, 4:5, :].transpose(0, 2, 1), config.grid_x,
                      config.grid_y, config.width, config.height)
    img = acc + final_T * background[None, None, :]
    alpha = _untile(raw[:, 3:4, :].transpose(0, 2, 1), config.grid_x,
                    config.grid_y, config.width, config.height)[..., 0]
    return RasterizeResult(
        image=img, alpha=alpha, radii=proj.radii, n_pairs=pa.n_pairs,
        pair_overflow=pa.pair_overflow,
        tile_overflow=jnp.zeros((), jnp.int32),
        rect_dropped=pa.rect_dropped, max_rect_side=max_side)
