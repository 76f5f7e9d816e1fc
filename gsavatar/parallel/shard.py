"""Sharded multi-chip training step.

Builds a pjit-ted batched train step over a ('data', 'model') mesh:

  * the camera batch (stacked pytree) is sharded over `data`; the per-camera
    loss is the SAME assembly as the single-chip step (train.make_loss_fn),
    so multi-chip training carries every term — perceptual, opacity entropy,
    regularizers — and the densification statistics;
  * parameters and optimizer state are replicated; gradient reduction over
    `data` is the psum XLA inserts from the sharded-batch mean;
  * inside each data shard, sharding hints (parallel/context.py) lay the
    Gaussian arena over `model` for the geometry/deformation stages and the
    dense tile matrix over `model` for compositing (ops/rasterizer/api.py,
    composite.py) — XLA SPMD places the all-gather of projected splats
    between the two layouts (the "regroup to tile owners" exchange);
  * densification stats: per-camera screen-space gradients are recovered
    from the batch-mean loss by scaling with B, then reduced over the batch
    exactly as B sequential reference iterations would (sum of grad norms,
    visibility-count denom, max radii).

Multi-host: call `initialize_distributed()` (parallel/mesh.py) before
building the mesh; jax.distributed wires the hosts and `jax.devices()`
returns the global device set. This is the `dryrun_multichip` path and the
scale-out template; on one chip it degenerates to the single-device step."""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsavatar.core import densify as densify_mod
from gsavatar.core import gaussians as G
from gsavatar.core import optim as arena_optim
from gsavatar.parallel.context import hint, sharding_scope
from gsavatar.scene import Scene, TrainState


def stack_cameras(cameras):
    """Stack a list of Camera pytrees into one batched pytree. Static
    (non-pytree) label fields — frame_id, image_name, cam_id, K — differ
    per frame and would break tree_map's treedef equality AND key a fresh
    jit trace per distinct value, so they are normalized to constants
    (exactly like Scene.device_camera); the traced per-frame identities
    the model actually consumes (latent_idx, pose_idx, in_frame_dict) are
    leaves and stack normally."""
    cameras = [c.replace(frame_id=0, cam_id=0, image_name='', K=None)
               for c in cameras]
    return jax.tree.map(lambda *xs: np.stack(xs), *cameras)


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree over every mesh device. Uses
    make_array_from_callback so it also works multi-process (each process
    materializes only its addressable shards)."""
    sh = NamedSharding(mesh, P())

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def put_batch(batch, mesh: Mesh):
    """Place a host-stacked camera batch (leading dim B) sharded over the
    mesh `data` axis. Multi-process: every process passes the SAME global
    batch (the driver's frame sampler is seeded identically on all
    processes); each device keeps only its row slice."""
    sh = NamedSharding(mesh, P('data'))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, batch)


def make_sharded_train_step(scene: Scene, mesh: Mesh):
    """Must be created AND first-called inside `sharding_scope(mesh)` so the
    rasterizer's tile-sharding hints are traced active."""
    from gsavatar.train import make_loss_fn
    loss_core = make_loss_fn(scene)
    gauss_delay = int(scene.cfg.model.gaussian.get('delay', 0))

    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P('data'))

    @functools.partial(jax.jit,
                       static_argnames=('active_sh_degree', 'bucket',
                                        'pair_bucket', 'rect_window'),
                       donate_argnums=(0,))
    def train_step(state: TrainState, cameras, iteration, weights, xyz_lr,
                   active_sh_degree: int = 0, bucket: int = 0,
                   pair_bucket: int = 0, rect_window: int = 0):
        if not bucket:
            bucket = int(state.gauss_params.xyz.shape[0])
        r_cfg = scene.raster_config
        if pair_bucket:
            r_cfg = r_cfg.replace(max_pairs=pair_bucket)
        if rect_window:
            r_cfg = r_cfg.replace(max_rect=rect_window)
        rng, step_key = jax.random.split(state.rng)
        B = cameras.image.shape[0]
        keys = jax.random.split(step_key, B)

        sl = lambda tree: jax.tree.map(lambda x: x[:bucket], tree)
        params_b = sl(state.gauss_params)
        alive_b = state.gauss_aux.alive[:bucket]
        nn_ix_b = state.gauss_aux.nn_ix[:bucket]

        def loss_fn(conv_params, gauss_params, means2d_offsets):
            # arena rows over `model` for the geometry stages; the batch of
            # camera pytrees is `data`-sharded so the vmap splits over data
            gp = jax.tree.map(lambda x: hint(x, 'model'), gauss_params)

            def one(camera, key, m2d):
                k_noise, k_skin = jax.random.split(key)
                return loss_core(conv_params, gp, alive_b, nn_ix_b, m2d,
                                 camera, iteration, weights, k_noise, k_skin,
                                 active_sh_degree, raster_cfg=r_cfg)

            (losses, (metrics, radii)) = jax.vmap(one)(
                cameras, keys, means2d_offsets)
            # batch reduction respects each metric's semantics: the ladder
            # (train.py) sizes the pair arena / rect window for the WORST
            # camera in the batch, so max-like stats reduce with max and
            # dropped-work counters with sum — a jnp.mean here would
            # persistently under-size the arena for any camera above the
            # batch mean (silent splat cropping; ADVICE r4). Losses/psnr
            # keep the batch mean.
            def reduce_metric(key, v):
                if key.startswith('overflow/'):
                    return jnp.sum(v)
                if key in ('raster/n_pairs', 'raster/max_rect_side'):
                    return jnp.max(v)
                return jnp.mean(v)
            red_metrics = {k: reduce_metric(k, v) for k, v in metrics.items()}
            return jnp.mean(losses), (red_metrics, radii)

        means2d_zero = jnp.zeros((B, bucket, 2))
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (metrics, radii)), (g_conv, g_gauss, g_means2d) = grad_fn(
            state.conv_params, params_b, means2d_zero)

        # converter optimizer (same transform chain as single-chip)
        updates, conv_opt = scene.conv_tx.update(
            g_conv, state.conv_opt, state.conv_params)
        conv_params = jax.tree.map(lambda p, u: p + u, state.conv_params,
                                   updates)

        # arena adam over the bucket prefix
        lrs = dict(scene.gauss_lrs(0))
        lrs['xyz'] = xyz_lr
        apply_gauss = iteration >= gauss_delay
        adam_b = arena_optim.ArenaAdamState(
            m=sl(state.gauss_adam.m), v=sl(state.gauss_adam.v),
            step=state.gauss_adam.step)
        params_b_new, adam_b_new = arena_optim.adam_step(
            params_b, g_gauss, adam_b, lrs, alive_b, apply=apply_gauss)
        wb = lambda full, b: jax.tree.map(
            lambda f, x: f.at[:bucket].set(x), full, b)
        gauss_params = wb(state.gauss_params, params_b_new)
        gauss_adam = arena_optim.ArenaAdamState(
            m=wb(state.gauss_adam.m, adam_b_new.m),
            v=wb(state.gauss_adam.v, adam_b_new.v), step=adam_b_new.step)

        # densification stats: g_means2d is d(mean loss)/d offsets — scale
        # by B to recover per-camera gradients (reference accumulates one
        # camera per iteration; a B-batch equals B reference iterations)
        in_window = weights.get('_in_densify_window', 0.0) > 0

        def accumulate(aux):
            def body(i, a):
                return densify_mod.add_stats_prefix(
                    a, g_means2d[i] * B, radii[i])
            return jax.lax.fori_loop(0, B, body, aux)

        aux = jax.lax.cond(in_window, accumulate, lambda a: a,
                           state.gauss_aux)

        new_state = TrainState(
            gauss_params=gauss_params, gauss_aux=aux, gauss_adam=gauss_adam,
            conv_params=conv_params, conv_opt=conv_opt, rng=rng)
        metrics['n_alive'] = jnp.sum(aux.alive)
        metrics['loss'] = loss
        return new_state, metrics

    def place(state, cameras):
        state = jax.device_put(state, repl)
        cameras = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding), cameras)
        return state, cameras

    return train_step, place
