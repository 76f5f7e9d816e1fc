"""Multi-subject batched training (BASELINE config 5; SURVEY §7 step 6).

The reference trains ONE avatar per run (train.py:49); there is nothing to
port. Multi-subject batching is the TPU-native scale-out of that workload:
S independent subject optimizations compiled into ONE SPMD program whose
TrainState carries a leading subject axis sharded over the mesh `data`
axis — a subject per chip (or device group) with zero cross-subject
communication by construction, so scaling is embarrassingly parallel
modulo one dispatch.

Mechanics:
  * every per-subject model constant (canonical AABB, SMPL tables) rides
    the 'subject' variable collection (models/subject.py), so the stacked
    conv_params vary per vmap lane;
  * per-subject skinning pools ride as stacked step inputs
    (train.make_loss_fn pool_override);
  * the step body IS train.make_step_core — the single-subject step
    vmapped, so the two cannot drift (tests/test_multi_subject.py pins
    per-subject trajectories to the single-subject driver's);
  * densify / opacity reset / KNN refresh are the single-subject jitted
    bodies vmapped the same way; the shared `bucket` is the max over
    subjects so every lane keeps one static shape.

Static-compatibility contract (asserted): same architecture, arena
capacity, image size, frame count (latent/pose rows), rasterizer config.
Free to differ: canonical geometry, datasets/cameras, pose-init values,
point-cloud init, skinning pools.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsavatar.config import Config
from gsavatar.core import densify as densify_mod
from gsavatar.scene import Scene, TrainState


def subject_scene_cfg(cfg, overrides: dict) -> Config:
    """One subject's single-subject config: the base cfg with the subject's
    dataset overrides applied and the multi-subject routing removed."""
    d = cfg.to_dict()
    d.setdefault('parallel', {})
    d['parallel'] = dict(d['parallel'], subjects=None, data=0, model=0)
    for k, v in dict(overrides or {}).items():
        d['dataset'][k] = v
    return Config(d)


class MultiSubjectScene:
    """S single-subject Scenes + the stacked-state helpers."""

    def __init__(self, cfg, seed: int = 0):
        subs = list(cfg.parallel.get('subjects') or [])
        if not subs:
            raise ValueError("cfg.parallel.subjects must be a non-empty "
                             "list of per-subject dataset overrides")
        self.cfg = cfg
        self.scenes: List[Scene] = [
            Scene(subject_scene_cfg(cfg, ov), seed=seed + i)
            for i, ov in enumerate(subs)]
        s0 = self.scenes[0]
        for i, s in enumerate(self.scenes[1:], 1):
            assert s.capacity == s0.capacity, (i, 'capacity')
            assert s.use_sh == s0.use_sh, (i, 'use_sh')
            assert s.max_sh_degree == s0.max_sh_degree, (i, 'sh_degree')
            assert s.raster_config == s0.raster_config, (i, 'raster_config')
            assert len(s.train_dataset) == len(s0.train_dataset), \
                (i, 'train length')
            assert s.skinning_pool_pts.shape == s0.skinning_pool_pts.shape, \
                (i, 'pool')
        self.n_subjects = len(self.scenes)

    def init_states(self) -> TrainState:
        """Stacked TrainState: identical shapes per subject -> one compiled
        init graph executed S times, stacked on a leading axis."""
        return stack_states([s.init_state() for s in self.scenes])

    def bucket_for(self, n_alive_max: int) -> int:
        return self.scenes[0].bucket_for(n_alive_max)


def stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked, i: int):
    return jax.tree.map(lambda x: x[i], stacked)


def _subject_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P('data'))


def _constrain(tree, sharding):
    if sharding is None:
        return tree
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), tree)


def make_multi_subject_step(ms: MultiSubjectScene,
                            mesh: Optional[Mesh] = None):
    """vmap(single-subject step) over the stacked subject axis, sharded
    over the mesh `data` axis when a mesh is given. The `model` axis is not
    composed here — each subject runs whole on its device group (subjects
    at this workload's size fit one chip; revisit if arenas outgrow HBM)."""
    from gsavatar.train import make_step_core
    if mesh is not None and mesh.shape.get('model', 1) != 1:
        raise ValueError("multi-subject training shards subjects over "
                         "'data'; use model=1")
    core = make_step_core(ms.scenes[0])
    pool_pts = jnp.stack([s.skinning_pool_pts for s in ms.scenes])
    pool_w = jnp.stack([s.skinning_pool_w for s in ms.scenes])
    sh = _subject_sharding(mesh)

    @functools.partial(jax.jit,
                       static_argnames=('active_sh_degree', 'bucket',
                                        'pair_bucket', 'rect_window'),
                       donate_argnums=(0,))
    def ms_step(stacked_state, stacked_cameras, iteration, weights, xyz_lr,
                active_sh_degree: int = 0, bucket: int = 0,
                pair_bucket: int = 0, rect_window: int = 0):
        stacked_state = _constrain(stacked_state, sh)
        stacked_cameras = _constrain(stacked_cameras, sh)
        pp = _constrain(pool_pts, sh)
        pw = _constrain(pool_w, sh)

        def one(state, camera, p, w):
            return core(state, camera, iteration, weights, xyz_lr,
                        active_sh_degree=active_sh_degree, bucket=bucket,
                        pair_bucket=pair_bucket, rect_window=rect_window,
                        pool_override=(p, w))

        new_states, metrics = jax.vmap(one)(stacked_state, stacked_cameras,
                                            pp, pw)
        return _constrain(new_states, sh), metrics

    def place(stacked_state, stacked_cameras):
        if sh is None:
            return stacked_state, stacked_cameras
        put = lambda t: jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sh), t)
        return put(stacked_state), put(stacked_cameras)

    return ms_step, place


def make_multi_subject_densify(ms: MultiSubjectScene,
                               mesh: Optional[Mesh] = None):
    scene0 = ms.scenes[0]
    opt = scene0.cfg.opt
    sh = _subject_sharding(mesh)

    @jax.jit
    def densify_step(stacked_state, key, use_screen_size_prune):
        stacked_state = _constrain(stacked_state, sh)

        def one(state):
            params, aux, adam, info = densify_mod.densify_and_prune(
                state.gauss_params, state.gauss_aux, state.gauss_adam, key,
                grad_threshold=float(opt.densify_grad_threshold),
                min_opacity=float(opt.opacity_threshold),
                extent=scene0.cameras_extent,
                percent_dense=float(opt.percent_dense),
                use_screen_size_prune=use_screen_size_prune)
            return state.replace(gauss_params=params, gauss_aux=aux,
                                 gauss_adam=adam), info

        out, info = jax.vmap(one)(stacked_state)
        return _constrain(out, sh), info

    @jax.jit
    def opacity_reset_step(stacked_state):
        def one(state):
            params, adam = densify_mod.reset_opacity(
                state.gauss_params, state.gauss_adam,
                state.gauss_aux.alive)
            return state.replace(gauss_params=params, gauss_adam=adam)
        return _constrain(jax.vmap(one)(stacked_state), sh)

    @functools.partial(jax.jit, static_argnames=('bucket',))
    def refresh_knn(stacked_state, bucket: int):
        from gsavatar.core import gaussians as G
        from gsavatar.ops import knn

        def one(state):
            xyz = state.gauss_params.xyz[:bucket]
            alive = state.gauss_aux.alive[:bucket]
            ix = knn.knn_self(xyz, G.K_NEIGHBORS, mask=alive)
            return state.replace(gauss_aux=state.gauss_aux.replace(
                nn_ix=state.gauss_aux.nn_ix.at[:bucket].set(ix)))

        return _constrain(jax.vmap(one)(stacked_state), sh)

    return densify_step, opacity_reset_step, refresh_knn


def training_multi_subject(cfg, max_iterations=None, log_every: int = 10,
                           progress: bool = True):
    """Multi-subject training driver: `cfg.parallel.subjects = [{dataset
    overrides}, ...]` (optionally `parallel.data = D` to shard the subject
    axis over D devices; S % D == 0). Mirrors training()'s schedule —
    weights C(), SH ramp, densify window, opacity resets, ladder, per-
    subject frame sampling without replacement — with all S subjects
    advancing one iteration per dispatch. Returns (ms_scene, stacked
    state, logger)."""
    from gsavatar import train as train_mod
    from gsavatar.parallel import mesh as mesh_mod
    from gsavatar.parallel.shard import stack_cameras

    seed = max(int(cfg.get('seed', -1)), 0)
    ms = MultiSubjectScene(cfg, seed=seed)
    S = ms.n_subjects
    opt = cfg.opt
    iterations = int(max_iterations or opt.iterations)

    mesh = None
    mesh_data = int(cfg.parallel.get('data', 0) or 0)
    if mesh_data > 1:
        mesh_mod.initialize_distributed()
        if S % mesh_data != 0:
            raise ValueError(f"subjects ({S}) must be divisible by "
                             f"parallel.data ({mesh_data})")
        mesh = mesh_mod.make_mesh(mesh_data, data=mesh_data, model=1)

    ms_step, place = make_multi_subject_step(ms, mesh)
    densify_step, opacity_reset_step, refresh_knn = \
        make_multi_subject_densify(ms, mesh)

    state = ms.init_states()

    exp_dir = cfg.get('exp_dir') or os.path.join(
        'exp', str(cfg.get('name', 'run')) + '-ms')
    logger = None
    if jax.process_index() == 0:
        os.makedirs(exp_dir, exist_ok=True)
        from gsavatar.utils.logging import MetricLogger
        logger = MetricLogger(os.path.join(exp_dir, 'metrics.jsonl'))

    scene0 = ms.scenes[0]
    n_alive0 = int(np.asarray(state.gauss_aux.alive).sum(axis=1).max())
    bucket = ms.bucket_for(n_alive0)

    densify_until = int(opt.densify_until_iter)
    densify_from = int(opt.densify_from_iter)
    densify_interval = int(opt.densification_interval)
    opacity_reset_interval = int(opt.opacity_reset_interval)
    gauss_delay = int(cfg.model.gaussian.get('delay', 0))
    white_bg = bool(cfg.dataset.white_background)

    raster_auto = bool(cfg.rasterizer.get('auto_size', True))
    cfg_max_pairs = int(cfg.rasterizer.max_pairs)
    cfg_max_rect = int(cfg.rasterizer.get('max_rect', 8))
    pair_bucket = rect_window = 0
    ladder_every = min(log_every, 10)

    # per-subject frame sampling matches each subject's single-subject run:
    # same rng seed recipe (training() seeds default_rng(seed); subject i's
    # scene was built with seed+i)
    rngs = [np.random.default_rng(seed + i) for i in range(S)]
    stacks: List[list] = [[] for _ in range(S)]

    def next_frame_idx(i):
        if not stacks[i]:
            stacks[i] = list(range(len(ms.scenes[i].train_dataset)))
        return stacks[i].pop(int(rngs[i].integers(len(stacks[i]))))

    test_interval = int(cfg.get('test_interval', 0) or 0)
    max_val_frames = cfg.get('max_val_frames')
    validations = [train_mod.make_validation(s) for s in ms.scenes]

    t0 = time.time()
    for iteration in range(1, iterations + 1):
        weights = train_mod.loss_weights(cfg, iteration)
        in_window, do_densify, do_reset, use_ss = train_mod.schedule_flags(
            iteration, densify_until=densify_until,
            densify_from=densify_from, densify_interval=densify_interval,
            opacity_reset_interval=opacity_reset_interval,
            gauss_delay=gauss_delay, white_bg=white_bg)
        weights['_in_densify_window'] = 1.0 if in_window else 0.0
        xyz_lr = float(scene0.xyz_lr_fn(iteration))
        deg = scene0.active_sh_degree(iteration)

        batch = stack_cameras([ms.scenes[i].train_dataset[next_frame_idx(i)]
                               for i in range(S)])
        state, batch = place(state, batch)
        state, metrics = ms_step(state, batch, jnp.int32(iteration), weights,
                                 xyz_lr, active_sh_degree=deg, bucket=bucket,
                                 pair_bucket=pair_bucket,
                                 rect_window=rect_window)

        if (test_interval > 0 and iteration % test_interval == 0):
            for i, validation in enumerate(validations):
                res = validation(unstack_state(state, i), iteration, None,
                                 exp_dir, max_val_frames=max_val_frames,
                                 bucket=bucket)
                if logger:
                    logger.log(iteration, {f'subject{i}/{k}': v
                                           for k, v in res.items()})

        if do_densify:
            key = jax.random.PRNGKey(iteration)
            state, dinfo = densify_step(state, key, use_ss)
            n_alive = np.asarray(dinfo['n_alive'])
            if logger:
                logger.log(iteration, {'densify/n_alive': n_alive.tolist()})
            bucket = ms.bucket_for(int(n_alive.max()))
            state = refresh_knn(state, bucket=bucket)
        if do_reset:
            state = opacity_reset_step(state)

        if iteration % log_every == 0 or iteration == 1:
            m = jax.device_get(metrics)          # (S,) per metric
            row = {}
            for k, v in m.items():
                v = np.asarray(v)
                row[k] = float(v.mean())
                for i in range(S):
                    row[f'subject{i}/{k}'] = float(v[i])
            row['iter_time'] = (time.time() - t0) / log_every * 1000.0
            if logger:
                logger.log(iteration, row)
            if raster_auto:
                # worst subject sizes the shared arena (max-like stats)
                tp = float(np.max(np.asarray(m['raster/n_pairs'])
                                  + np.asarray(m['overflow/pairs'])))
                pair_bucket = train_mod.pair_ladder(tp, cfg_max_pairs)
                rect_window = train_mod.rect_ladder(
                    float(np.max(np.asarray(m['raster/max_rect_side']))),
                    cfg_max_rect)
            if progress and (iteration % (log_every * 10) == 0
                             or iteration == 1):
                print(f"[{iteration}/{iterations}] S={S} "
                      f"loss={row['loss/total_loss']:.5f} "
                      f"psnr={row['psnr']:.2f} "
                      f"({row['iter_time']:.0f} ms/it)", flush=True)
            t0 = time.time()

    # per-subject checkpoints (reference semantics: final iteration always)
    if jax.process_index() == 0:
        for i, s in enumerate(ms.scenes):
            s.save_checkpoint(unstack_state(state, i), iterations,
                              os.path.join(exp_dir, f'subject{i}'))
    return ms, state, logger
