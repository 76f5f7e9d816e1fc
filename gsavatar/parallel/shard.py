"""Sharded multi-chip training step.

Builds a pjit-ted batched train step over a ('data', 'model') mesh:

  * the camera batch (stacked pytree) is sharded over `data`;
  * parameters and optimizer state are replicated; gradient reduction over
    `data` is the psum XLA inserts from the sharded-batch mean;
  * inside each data shard, sharding_constraints lay the Gaussian arena over
    `model` for the geometry/deformation stages and the tile grid over
    `model` for compositing — XLA SPMD places the all-gather of projected
    splats between the two layouts (the "regroup to tile owners" exchange);
  * densification stats ride along summed over the batch.

This is the `dryrun_multichip` path and the scale-out template; on one chip
it degenerates to the single-device step."""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsavatar import losses as L
from gsavatar.core import gaussians as G
from gsavatar.core import optim as arena_optim
from gsavatar.ops.ssim import ssim
from gsavatar.renderer import render
from gsavatar.scene import Scene, TrainState


def stack_cameras(cameras):
    """Stack a list of Camera pytrees into one batched pytree. Static
    (non-pytree) label fields — frame_id, image_name, cam_id — differ per
    frame and would break tree_map's treedef equality, so they are unified
    to the first camera's values; the traced per-frame identities the model
    actually consumes (latent_idx, pose_idx, in_frame_dict) are leaves and
    stack normally."""
    ref = cameras[0]
    cameras = [c.replace(frame_id=ref.frame_id, cam_id=ref.cam_id,
                         image_name=ref.image_name, K=ref.K)
               for c in cameras]
    return jax.tree.map(lambda *xs: np.stack(xs), *cameras)


def make_sharded_train_step(scene: Scene, mesh: Mesh):
    converter = scene.converter
    raster_cfg = scene.raster_config
    background = scene.background
    mask_kind = scene.cfg.opt.get('mask_loss_type', 'l1')
    gauss_delay = int(scene.cfg.model.gaussian.get('delay', 0))
    pool_pts = scene.skinning_pool_pts
    pool_w = scene.skinning_pool_w
    n_reg = scene.n_reg_pts
    use_sh = scene.use_sh
    max_deg = scene.max_sh_degree

    repl = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P('data'))

    def with_model_sharding(tree, spec):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)) if hasattr(x, 'ndim')
            and x.ndim >= 1 else x, tree)

    def per_camera_loss(conv_params, gauss_params, aux, camera, iteration,
                        weights, rng, active_sh_degree):
        gview = G.make_view(gauss_params, aux,
                            active_sh_degree=active_sh_degree,
                            max_sh_degree=max_deg, use_sh=use_sh)
        # geometry stages: arena rows laid out over `model`
        gview = gview.replace(params=with_model_sharding(
            gview.params, P('model')))
        means2d_offset = jnp.zeros((gauss_params.xyz.shape[0], 2))
        pkg = render(converter, conv_params, gview, camera, iteration,
                     raster_cfg, background, train=True, rng=rng,
                     means2d_offset=means2d_offset)
        gt = camera.image
        loss = weights['lambda_l1'] * L.l1_loss(pkg.render, gt)
        loss += weights['lambda_dssim'] * (1.0 - ssim(pkg.render, gt))
        loss += weights['lambda_mask'] * L.mask_loss(
            pkg.opacity_render, camera.mask, mask_kind)
        k_skin = jax.random.fold_in(rng, 1)
        sel = jax.random.randint(k_skin, (n_reg,), 0, pool_pts.shape[0])
        loss += weights['lambda_skinning'] * converter.apply(
            conv_params, pool_pts[sel], pool_w[sel],
            method=converter.skinning_loss)
        lax_, lac = L.full_aiap_loss(gview, pkg.deformed_gaussians)
        loss += weights['lambda_aiap_xyz'] * lax_
        loss += weights['lambda_aiap_cov'] * lac
        for name, value in pkg.loss_reg.items():
            loss = loss + weights.get(f'lambda_{name}', 0.0) * value
        return loss, pkg.radii

    @functools.partial(jax.jit, static_argnames=('active_sh_degree',),
                       donate_argnums=(0,))
    def train_step(state: TrainState, cameras, iteration, weights, xyz_lr,
                   active_sh_degree: int = 0):
        rng, step_key = jax.random.split(state.rng)
        B = cameras.image.shape[0]
        keys = jax.random.split(step_key, B)

        def loss_fn(conv_params, gauss_params):
            def one(camera, key):
                return per_camera_loss(conv_params, gauss_params,
                                       state.gauss_aux, camera, iteration,
                                       weights, key, active_sh_degree)
            losses, radii = jax.vmap(one)(cameras, keys)
            return jnp.mean(losses), radii

        (loss, radii), (g_conv, g_gauss) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.conv_params, state.gauss_params)

        updates, conv_opt = scene.conv_tx.update(
            g_conv, state.conv_opt, state.conv_params)
        conv_params = jax.tree.map(lambda p, u: p + u, state.conv_params,
                                   updates)

        lrs = dict(scene.gauss_lrs(0))
        lrs['xyz'] = xyz_lr
        gauss_params, gauss_adam = arena_optim.adam_step(
            state.gauss_params, g_gauss, state.gauss_adam, lrs,
            state.gauss_aux.alive, apply=iteration >= gauss_delay)

        new_state = TrainState(
            gauss_params=gauss_params, gauss_aux=state.gauss_aux,
            gauss_adam=gauss_adam, conv_params=conv_params,
            conv_opt=conv_opt, rng=rng)
        return new_state, {'loss': loss}

    def place(state, cameras):
        state = jax.device_put(state, repl)
        cameras = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), batch_sharding), cameras)
        return state, cameras

    return train_step, place
