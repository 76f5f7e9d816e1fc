"""Scene orchestration: datasets + arena + converter + optimizers + ckpts.

Parity: scene/__init__.py of the reference (Scene), reorganized functionally:
the Scene owns host-side objects (datasets, metadata, module definitions,
optimizer definitions) while all device state lives in a TrainState pytree
that the jitted step functions consume and return."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gsavatar.config import Config
from gsavatar.core import densify as densify_mod
from gsavatar.core import gaussians as G
from gsavatar.core import optim as arena_optim
from gsavatar.data import load_dataset
from gsavatar.models.converter import GaussianConverter, build_converter
from gsavatar.ops.rasterizer import RasterizeConfig
from gsavatar.ops.sampling import sample_skinning_pool
from gsavatar.smpl.body_model import find_assets
from gsavatar.utils import transforms as T


@struct.dataclass
class TrainState:
    gauss_params: G.GaussianParams
    gauss_aux: G.GaussianAux
    gauss_adam: arena_optim.ArenaAdamState
    conv_params: Any
    conv_opt: Any
    rng: Any


def converter_optimizer(cfg, iterations: int) -> optax.GradientTransformation:
    """Single Adam over the converter with per-group LRs + per-step
    exponential decay + latent weight decay + global-norm clip
    (models/gaussian_converter.py:22-39,61-67)."""
    opt = cfg.opt
    gamma = float(opt.lr_ratio) ** (1.0 / iterations)

    def group(lr, wd=0.0):
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15))
        chain.append(optax.scale_by_schedule(
            lambda t: -float(lr) * gamma ** t))
        return optax.chain(*chain)

    wd = float(opt.get('latent_weight_decay', 0.05))
    transforms = {
        'rigid': group(opt.get('rigid_lr', 0.0)),
        'non_rigid': group(opt.get('non_rigid_lr', 0.0)),
        'nr_latent': group(opt.get('nr_latent_lr', 0.0), wd),
        'pose_correction': group(opt.get('pose_correction_lr', 0.0)),
        'texture': group(opt.get('texture_lr', 0.0)),
        'tex_latent': group(opt.get('tex_latent_lr', 0.0), wd),
        # the 'subject' collection (models/subject.py) carries per-subject
        # constants — stacked/sharded/checkpointed but never trained
        'frozen': optax.set_to_zero(),
    }

    def label_fn(params):
        def label(path):
            names = [str(p) for p in path]
            if names and names[0] == 'subject':
                return 'frozen'
            top = names[1] if names and names[0] == 'params' else names[0]
            is_latent = any(n == 'latent' for n in names)
            if top == 'rigid':
                return 'rigid'
            if top == 'non_rigid':
                return 'nr_latent' if is_latent else 'non_rigid'
            if top == 'pose_correction':
                return 'pose_correction'
            if top == 'texture':
                return 'tex_latent' if is_latent else 'texture'
            return 'non_rigid'

        return jax.tree_util.tree_map_with_path(
            lambda path, _: label([getattr(k, 'key', getattr(k, 'idx', ''))
                                   for k in path]), params)

    grad_clip = float(cfg.opt.get('grad_clip', 0.0))
    mt = optax.multi_transform(transforms, label_fn)
    if grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), mt)
    return mt


class Scene:
    def __init__(self, cfg: Config, seed: int = 0):
        self.cfg = cfg
        self.mode = cfg.get('mode', 'train')

        self.train_dataset = load_dataset(cfg.dataset, split='train')
        self.metadata = self.train_dataset.metadata
        split = {'train': 'val', 'test': 'test',
                 'predict': 'predict'}[self.mode]
        self.test_dataset = load_dataset(cfg.dataset, split=split)
        self.cameras_extent = float(self.metadata['cameras_extent'])

        gcfg = cfg.model.gaussian
        self.use_sh = bool(gcfg.use_sh)
        self.max_sh_degree = int(gcfg.get('sh_degree', 3))
        self.feature_dim = int(gcfg.get('feature_dim', 32))
        self.capacity = int(gcfg.get('capacity', 1 << 17))

        # SMPL assets (reference layout or synthetic fallback; the synthetic
        # dataset carries its own)
        if hasattr(self.train_dataset, 'assets'):
            self.assets = self.train_dataset.assets
        else:
            self.assets = find_assets(cfg.get('body_models_dir'),
                                      self.metadata.get('gender', 'neutral'))

        self.converter: GaussianConverter = build_converter(
            cfg, self.metadata, assets=self.assets)

        h, w = cfg.dataset.img_hw
        r = cfg.get('rasterizer', Config({}))
        from gsavatar.ops.rasterizer import resolve_backend
        self.raster_config = RasterizeConfig(
            width=int(w), height=int(h),
            max_pairs=int(r.get('max_pairs', 2 ** 21)),
            per_tile_capacity=int(r.get('per_tile_capacity', 512)),
            chunk=int(r.get('chunk', 64)),
            max_rect=int(r.get('max_rect', 8)),
            backend=resolve_backend(str(r.get('backend', 'auto'))))

        self.background = jnp.asarray(
            [1.0, 1.0, 1.0] if cfg.dataset.white_background else [0.0, 0.0, 0.0])

        # skinning-loss sample pool (ops/sampling.py docstring)
        md = self.metadata
        pool_pts, pool_w = sample_skinning_pool(
            md['smpl_verts'], md['faces'], md['skinning_weights'],
            pool_size=int(cfg.opt.get('skinning_pool_size', 65536)))
        aabb = md['aabb']
        self.skinning_pool_pts = jnp.asarray(
            np.asarray(aabb.normalize(jnp.asarray(pool_pts), sym=True)))
        self.skinning_pool_w = jnp.asarray(pool_w)
        self.n_reg_pts = int(cfg.opt.get('n_reg_pts', 1024))

        # xyz LR schedule (gaussian_model.py:217-228)
        opt = cfg.opt
        self.xyz_lr_fn = T.expon_lr_schedule(
            lr_init=float(opt.position_lr_init) * self.cameras_extent,
            lr_final=float(opt.position_lr_final) * self.cameras_extent,
            lr_delay_mult=float(opt.position_lr_delay_mult),
            max_steps=int(opt.position_lr_max_steps))

        self._seed = seed

    # ------------------------------------------------------------------
    def _init_fn_and_args(self):
        """(jittable init fn, example args). Hoisted so init_state and the
        checkpoint-restore template share one function: init_state jits it
        once (cached on self), load_checkpoint only eval_shapes it."""
        cfg = self.cfg
        points, colors = self.train_dataset.readPointCloud()
        # static (non-pytree) Camera metadata must be hashable for jit:
        # real-data loaders put a numpy K and per-frame labels there
        # (normalized exactly like device_camera does)
        cam0 = self.train_dataset[0].replace(frame_id=0, cam_id=0,
                                             image_name='', K=None)
        if not hasattr(self, 'conv_tx'):
            self.conv_tx = converter_optimizer(cfg, int(cfg.opt.iterations))
        seed = self._seed

        def _init(points, colors, cam0):
            gauss_params, gauss_aux = G.create_from_pcd(
                points, colors, self.capacity, self.use_sh,
                self.max_sh_degree, self.feature_dim)
            gauss_adam = arena_optim.init_adam(gauss_params)

            rng = jax.random.PRNGKey(seed)
            rng, init_key = jax.random.split(rng)
            gview = G.make_view(gauss_params, gauss_aux,
                                active_sh_degree=0,
                                max_sh_degree=self.max_sh_degree,
                                use_sh=self.use_sh)
            conv_params = self.converter.init(init_key, gview, cam0, 0)
            conv_opt = self.conv_tx.init(conv_params)
            return TrainState(gauss_params=gauss_params, gauss_aux=gauss_aux,
                              gauss_adam=gauss_adam, conv_params=conv_params,
                              conv_opt=conv_opt, rng=rng)

        args = (jnp.asarray(points, jnp.float32),
                jnp.asarray(colors, jnp.float32), cam0)
        return _init, args

    def init_state(self) -> TrainState:
        """Build the full TrainState in ONE jitted computation.

        Running flax `Module.init` + optax init eagerly dispatches thousands
        of tiny ops; on a tunneled TPU backend each pays a host round-trip
        (measured ~4 min for the full avatar stack). One jit = one compile +
        one execution. The jitted callable is cached on self so repeat calls
        hit the in-memory jit cache."""
        fn, args = self._init_fn_and_args()
        if not hasattr(self, '_init_jit'):
            self._init_jit = jax.jit(fn)
        return self._init_jit(*args)

    def state_template(self):
        """TrainState pytree of jax.ShapeDtypeStructs — a restore template
        obtained WITHOUT compiling or running the init graph."""
        fn, args = self._init_fn_and_args()
        return jax.eval_shape(fn, *args)

    def device_camera(self, idx: int, split: str = 'train'):
        """Camera pytree with leaves resident on device, cached per index.

        Dataset items carry numpy leaves; passing them straight into the
        jitted step re-uploads the ~3.5 MB image+mask EVERY iteration — on a
        tunneled TPU backend that transfer dwarfs the compute. The cache
        device_puts each camera once (bounded FIFO)."""
        if not hasattr(self, '_cam_cache'):
            self._cam_cache = {}
        cache = self._cam_cache.setdefault(split, {})
        if idx not in cache:
            dataset = (self.train_dataset if split == 'train'
                       else self.test_dataset)
            cam = dataset[idx]
            # normalize per-frame STATIC metadata (frame_id/cam_id/
            # image_name/K are non-pytree fields): distinct values would
            # retrace the jitted step for EVERY camera. Nothing in the
            # compute path reads them — the traced identities the model
            # consumes (latent_idx, pose_idx, in_frame_dict) are leaves.
            cam = cam.replace(frame_id=0, cam_id=0, image_name='', K=None)
            cache[idx] = jax.device_put(jax.tree.map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray)
                else x, cam))
            limit = int(self.cfg.get('camera_cache_size', 256))
            while len(cache) > limit:
                cache.pop(next(iter(cache)))
        return cache[idx]

    def bucket_for(self, n_alive: int) -> int:
        """Alive-prefix bucket: n_alive rounded up to opt.bucket_granularity
        (0 disables bucketing -> full capacity). Trade-off: finer granularity
        shrinks EVERY per-gaussian stage (4096 leaves <8% padding at the
        bench's 50k vs 14.7% at 8192 — measured ~3 ms/step) but compiles
        more step variants over a long run; the persistent compilation
        cache absorbs repeats."""
        g = int(self.cfg.opt.get('bucket_granularity', 4096))
        if g <= 0:
            return self.capacity
        import math
        return min(self.capacity, max(g, int(math.ceil(n_alive / g)) * g))

    def gauss_lrs(self, iteration):
        """Per-field LRs for the arena Adam (gaussian_model.py:206-216)."""
        opt = self.cfg.opt
        feature_ratio = 20.0 if self.use_sh else 1.0
        return {
            'xyz': self.xyz_lr_fn(iteration),
            'features_dc': float(opt.feature_lr),
            'features_rest': float(opt.feature_lr) / feature_ratio,
            'opacity': float(opt.opacity_lr),
            'scaling': float(opt.scaling_lr),
            'rotation': float(opt.rotation_lr),
        }

    def active_sh_degree(self, iteration: int) -> int:
        """SH degree ramp: +1 every 1000 iters up to max (train.py:92-94)."""
        if not self.use_sh:
            return 0
        return min(iteration // 1000, self.max_sh_degree)

    # -- checkpointing (scene/__init__.py:86-105) ----------------------
    def save_checkpoint(self, state: TrainState, iteration: int,
                        save_dir: str):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(save_dir, f"ckpt{iteration}"))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {
            'gauss_params': state.gauss_params, 'gauss_aux': state.gauss_aux,
            'gauss_adam': state.gauss_adam, 'conv_params': state.conv_params,
            'conv_opt': state.conv_opt, 'rng': state.rng,
            'iteration': iteration,
        }, force=True)
        return path

    def load_checkpoint(self, path: str) -> tuple:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        template = self.state_template()
        item = {
            'gauss_params': template.gauss_params,
            'gauss_aux': template.gauss_aux,
            'gauss_adam': template.gauss_adam,
            'conv_params': template.conv_params,
            'conv_opt': template.conv_opt, 'rng': template.rng,
            'iteration': 0,
        }
        try:
            restored = ckptr.restore(os.path.abspath(path), item=item)
        except Exception:
            # checkpoints written before a state field existed (e.g.
            # GaussianAux.nn_ix) fail the strict template restore — fall
            # back to a raw restore merged onto the template by path,
            # zero-filling missing leaves (training() refreshes nn_ix
            # after every resume, so a zero fill is safe)
            restored = _merge_raw_checkpoint(
                ckptr.restore(os.path.abspath(path)), item)
            print(f"[gsavatar] checkpoint {path}: structure predates the "
                  f"current TrainState — missing fields zero-filled "
                  f"(lenient restore)", flush=True)
        state = TrainState(
            gauss_params=restored['gauss_params'],
            gauss_aux=restored['gauss_aux'],
            gauss_adam=restored['gauss_adam'],
            conv_params=restored['conv_params'],
            conv_opt=restored['conv_opt'], rng=restored['rng'])
        return state, int(restored['iteration'])


def _merge_raw_checkpoint(raw: dict, template):
    """Merge an orbax RAW restore (nested string-keyed dicts) onto a
    template pytree (dataclasses / namedtuples / dicts of
    ShapeDtypeStructs), looking each template leaf up by its key path and
    zero-filling leaves the checkpoint does not contain. Lets old
    checkpoints load after TrainState grows a field."""
    from jax.tree_util import (DictKey, FlattenedIndexKey, GetAttrKey,
                               SequenceKey, tree_flatten_with_path,
                               tree_unflatten)

    def key_str(k):
        if isinstance(k, GetAttrKey):
            return k.name
        if isinstance(k, DictKey):
            return str(k.key)
        if isinstance(k, SequenceKey):
            return str(k.idx)
        if isinstance(k, FlattenedIndexKey):
            return str(k.key)
        return str(k)

    leaves, treedef = tree_flatten_with_path(template)
    out = []
    for path, leaf in leaves:
        node = raw
        for k in path:
            if not isinstance(node, dict) or key_str(k) not in node:
                node = None
                break
            node = node[key_str(k)]
        if node is None:
            out.append(jnp.zeros(getattr(leaf, 'shape', ()),
                                 getattr(leaf, 'dtype', jnp.float32)))
        else:
            out.append(jnp.asarray(node))
    return tree_unflatten(treedef, out)
