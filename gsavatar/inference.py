"""Inference-only scene for checkpoint playback (no dataset required).

Parity: scene/__init__.py:160-225 of the reference (DuckDuckScene): metadata
comes from a single SMPL npz (canonical star-pose recipe of
get_cano_smpl_verts, scene/__init__.py:108-141), the cameras_extent is the
hard-coded ZJU constant, and the converter is built lazily at checkpoint
load with frame_dict sized from the checkpoint's texture latent table."""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.core import gaussians as G
from gsavatar.data import base as data_base
from gsavatar.models.converter import build_converter
from gsavatar.ops.rasterizer import RasterizeConfig
from gsavatar.renderer import render
from gsavatar.smpl.body_model import find_assets
from gsavatar.utils import ply as ply_io


def metadata_from_smpl_npz(npz_path: Optional[str], assets, padding=0.1):
    """Canonical metadata from one ZJU-format model npz (or from the raw
    template when no npz exists)."""
    if npz_path and os.path.exists(npz_path):
        minimal_shape = data_base.fix_symmetry(
            np.load(npz_path)['minimal_shape'])
    else:
        minimal_shape = assets.v_template.copy()
    md = data_base.canonicalize(minimal_shape, assets, padding=padding)
    md['cameras_extent'] = data_base.ZJU_CAMERAS_EXTENT
    md['frame_dict'] = None
    return md


class InferenceScene:
    def __init__(self, cfg, smpl_npz: Optional[str] = None,
                 assets=None, width: Optional[int] = None,
                 height: Optional[int] = None):
        self.cfg = cfg
        self.assets = assets or find_assets(cfg.get('body_models_dir'))
        self.metadata = metadata_from_smpl_npz(smpl_npz, self.assets)
        self.cameras_extent = self.metadata['cameras_extent']
        gcfg = cfg.model.gaussian
        self.use_sh = bool(gcfg.use_sh)
        self.max_sh_degree = int(gcfg.get('sh_degree', 3))
        h, w = (height or cfg.dataset.img_hw[0],
                width or cfg.dataset.img_hw[1])
        r = cfg.get('rasterizer', None)
        from gsavatar.ops.rasterizer import resolve_backend
        self.raster_config = RasterizeConfig(
            width=int(w), height=int(h),
            max_pairs=int(r.get('max_pairs', 2 ** 21)) if r else 2 ** 21,
            per_tile_capacity=int(r.get('per_tile_capacity', 512)) if r else 512,
            chunk=int(r.get('chunk', 64)) if r else 64,
            backend=resolve_backend(
                str(r.get('backend', 'auto')) if r else 'auto'))
        self.background = jnp.zeros(3)
        self.converter = None
        self.conv_params = None
        self.gauss_params = None
        self.gauss_aux = None

    def load_checkpoint(self, path: str):
        """Restore arena + converter params from an orbax checkpoint saved by
        Scene.save_checkpoint. frame_dict is sized from the checkpoint's
        latent tables (scene/__init__.py:216-225)."""
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        self.gauss_params = jax.tree.map(jnp.asarray,
                                         restored['gauss_params'])
        self.gauss_aux = jax.tree.map(jnp.asarray, restored['gauss_aux'])
        # rebuild typed structs (orbax returns plain dicts)
        self.gauss_params = G.GaussianParams(**{
            k: jnp.asarray(v) for k, v in restored['gauss_params'].items()})
        self.gauss_aux = G.GaussianAux(**{
            k: jnp.asarray(v) for k, v in restored['gauss_aux'].items()})
        conv_params = restored['conv_params']

        # frame_dict from the texture latent embedding rows
        try:
            n = np.asarray(conv_params['params']['texture']['latent']
                           ['embedding']).shape[0]
        except (KeyError, TypeError):
            n = 1
        self.metadata['frame_dict'] = {i: i for i in range(n)}
        self.converter = build_converter(self.cfg, self.metadata,
                                         assets=self.assets)
        self.conv_params = jax.tree.map(jnp.asarray, conv_params)
        return self

    def load_ply(self, path: str, capacity: Optional[int] = None):
        """Static-gaussian playback from a 3DGS ply export."""
        data = ply_io.load_gaussian_ply(path, self.max_sh_degree)
        n = data['xyz'].shape[0]
        cap = capacity or n
        params = G.empty_params(cap, self.use_sh, self.max_sh_degree)
        aux = G.empty_aux(cap)
        params = params.replace(**{
            k: getattr(params, k).at[:n].set(jnp.asarray(v))
            for k, v in data.items()})
        aux = aux.replace(alive=aux.alive.at[:n].set(True))
        self.gauss_params, self.gauss_aux = params, aux
        self.metadata['frame_dict'] = {0: 0}
        self.converter = build_converter(self.cfg, self.metadata,
                                         assets=self.assets)
        return self

    def render_frame(self, camera, iteration: Optional[int] = None):
        it = iteration if iteration is not None \
            else int(self.cfg.opt.iterations)
        gview = G.make_view(self.gauss_params, self.gauss_aux,
                            active_sh_degree=self.max_sh_degree if self.use_sh
                            else 0,
                            max_sh_degree=self.max_sh_degree,
                            use_sh=self.use_sh)
        if not hasattr(self, '_nr_cache'):
            # canonical positions are frozen at inference: precompute the
            # hash-grid encoding once (models/converter.compute_nr_cache)
            from gsavatar.models.converter import compute_nr_cache
            self._nr_cache = compute_nr_cache(self.converter,
                                              self.conv_params, gview)
        pkg = render(self.converter, self.conv_params, gview, camera,
                     jnp.int32(it), self.raster_config, self.background,
                     nr_cache=self._nr_cache)
        return pkg
