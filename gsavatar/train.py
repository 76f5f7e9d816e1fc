"""Training driver.

Parity: train.py of the reference — per-iteration: xyz LR schedule, SH-degree
ramp every 1000 iters, random-without-replacement frame sampling, render,
loss assembly (L1 + D-SSIM + perceptual + mask + skinning + AIAP + model
regularizers with C() schedules), backward, densification window, optimizer
steps with the gaussian delay, periodic validation/checkpoints.

TPU shape: the entire iteration (forward + backward + both optimizers +
densification stats) is ONE jitted function over the fixed-capacity arena;
densify/prune and opacity reset are separate jitted calls on their 100/3000-
iteration cadence. Loss weights arrive as traced scalars, so one compiled
graph serves the whole schedule (4 retraces for the SH-degree ramp)."""
from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar import losses as L
from gsavatar.core import densify as densify_mod
from gsavatar.core import gaussians as G
from gsavatar.core import optim as arena_optim
from gsavatar.ops.ssim import ssim
from gsavatar.renderer import render
from gsavatar.scene import Scene, TrainState
from gsavatar.utils.logging import MetricLogger

LOSS_WEIGHT_KEYS = ("lambda_l1", "lambda_dssim", "lambda_perceptual",
                    "lambda_mask", "lambda_skinning", "lambda_aiap_xyz",
                    "lambda_aiap_cov", "lambda_pose", "lambda_nr_xyz",
                    "lambda_nr_scale", "lambda_nr_rot", "lambda_opacity")


def loss_weights(cfg, iteration: int) -> dict:
    out = {}
    for k in LOSS_WEIGHT_KEYS:
        out[k] = L.C(iteration, cfg.opt.get(k, 0.0))
    return out


def make_train_step(scene: Scene):
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

    # perceptual loss: static gate — requires exported VGG-LPIPS weights
    # (ops/lpips.py docstring) AND a non-zero lambda somewhere in the
    # schedule; when off, the VGG graph is never built.
    from gsavatar.ops import lpips as lpips_mod
    lam_p = scene.cfg.opt.get('lambda_perceptual', 0.0)
    if isinstance(lam_p, (list, tuple)):
        # C() schedule [v0, it1, v1, ...]: values sit at even indices
        schedule_on = any(float(v) > 0 for v in list(lam_p)[::2])
    else:
        schedule_on = float(lam_p) > 0
    use_perceptual = schedule_on and lpips_mod.available()
    crop_hw = tuple(scene.cfg.opt.get('perceptual_crop_hw', (256, 256)))

    @functools.partial(jax.jit, static_argnames=('active_sh_degree',),
                       donate_argnums=(0,))
    def train_step(state: TrainState, camera, iteration, weights, xyz_lr,
                   active_sh_degree: int = 0):
        rng, k_noise, k_skin, k_split = jax.random.split(state.rng, 4)

        def loss_fn(conv_params, gauss_params, means2d_offset):
            gview = G.make_view(gauss_params, state.gauss_aux,
                                active_sh_degree=active_sh_degree,
                                max_sh_degree=max_deg, use_sh=use_sh)
            pkg = render(converter, conv_params, gview, camera, iteration,
                         raster_cfg, background, train=True, rng=k_noise,
                         means2d_offset=means2d_offset)
            gt = camera.image
            gt_mask = camera.mask

            loss_l1 = L.l1_loss(pkg.render, gt)
            loss_dssim = 1.0 - ssim(pkg.render, gt)
            loss_mask = L.mask_loss(pkg.opacity_render, gt_mask, mask_kind)

            # skinning distillation on a random pool minibatch
            sel = jax.random.randint(k_skin, (n_reg,), 0, pool_pts.shape[0])
            loss_skinning = converter.apply(
                conv_params, pool_pts[sel], pool_w[sel],
                method=converter.skinning_loss)

            loss_ax, loss_ac = L.full_aiap_loss(gview, pkg.deformed_gaussians)
            loss_opacity = L.opacity_entropy_loss(
                pkg.deformed_gaussians.get_opacity,
                pkg.deformed_gaussians.alive)

            w = weights
            loss = (w['lambda_l1'] * loss_l1
                    + w['lambda_dssim'] * loss_dssim
                    + w['lambda_mask'] * loss_mask
                    + w['lambda_skinning'] * loss_skinning
                    + w['lambda_aiap_xyz'] * loss_ax
                    + w['lambda_aiap_cov'] * loss_ac
                    + w['lambda_opacity'] * loss_opacity)
            if use_perceptual:
                fg_r, fg_gt = L.foreground_crop(pkg.render, gt, gt_mask,
                                                crop_hw)
                loss_perceptual = lpips_mod.lpips(fg_r, fg_gt)
                loss = loss + w['lambda_perceptual'] * loss_perceptual
            else:
                loss_perceptual = jnp.float32(0.0)
            for name, value in pkg.loss_reg.items():
                loss = loss + w.get(f'lambda_{name}', 0.0) * value

            metrics = {
                'loss/l1_loss': loss_l1, 'loss/ssim_loss': loss_dssim,
                'loss/mask_loss': loss_mask,
                'loss/loss_skinning': loss_skinning,
                'loss/xyz_aiap_loss': loss_ax, 'loss/cov_aiap_loss': loss_ac,
                'loss/opacity_loss': loss_opacity,
                'loss/perceptual_loss': loss_perceptual,
                'loss/total_loss': loss,
                'psnr': L.psnr(pkg.render, gt),
                'overflow/pairs': pkg.pair_overflow,
                'overflow/tile': pkg.tile_overflow,
            }
            for name, value in pkg.loss_reg.items():
                metrics[f'loss/loss_{name}'] = value
            return loss, (metrics, pkg.radii)

        means2d_zero = jnp.zeros((scene.capacity, 2))
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (metrics, radii)), (g_conv, g_gauss, g_means2d) = grad_fn(
            state.conv_params, state.gauss_params, means2d_zero)

        # converter optimizer (clip + per-group adam + exp decay)
        updates, conv_opt = scene.conv_tx.update(
            g_conv, state.conv_opt, state.conv_params)
        conv_params = jax.tree.map(lambda p, u: p + u, state.conv_params,
                                   updates)

        # gaussian arena adam with delay gate
        lrs = {'xyz': xyz_lr}
        for k, v in scene.gauss_lrs(0).items():
            if k != 'xyz':
                lrs[k] = v
        apply_gauss = iteration >= gauss_delay
        gauss_params, gauss_adam = arena_optim.adam_step(
            state.gauss_params, g_gauss, state.gauss_adam, lrs,
            state.gauss_aux.alive, apply=apply_gauss)

        # densification stats (train.py:217-220), gated by the caller via
        # in_densify_window (weights dict carries it as a traced scalar)
        in_window = weights['_in_densify_window'] > 0
        aux = jax.lax.cond(
            in_window,
            lambda a: densify_mod.add_stats(a, g_means2d, radii),
            lambda a: a, state.gauss_aux)

        new_state = TrainState(
            gauss_params=gauss_params, gauss_aux=aux, gauss_adam=gauss_adam,
            conv_params=conv_params, conv_opt=conv_opt, rng=rng)
        metrics['n_alive'] = jnp.sum(aux.alive)
        return new_state, metrics

    return train_step


def make_densify_step(scene: Scene):
    opt = scene.cfg.opt

    @jax.jit
    def densify_step(state: TrainState, key, use_screen_size_prune):
        params, aux, adam, info = densify_mod.densify_and_prune(
            state.gauss_params, state.gauss_aux, state.gauss_adam, key,
            grad_threshold=float(opt.densify_grad_threshold),
            min_opacity=float(opt.opacity_threshold),
            extent=scene.cameras_extent,
            percent_dense=float(opt.percent_dense),
            use_screen_size_prune=use_screen_size_prune)
        return state.replace(gauss_params=params, gauss_aux=aux,
                             gauss_adam=adam), info

    @jax.jit
    def opacity_reset_step(state: TrainState):
        params, adam = densify_mod.reset_opacity(
            state.gauss_params, state.gauss_adam, state.gauss_aux.alive)
        return state.replace(gauss_params=params, gauss_adam=adam)

    return densify_step, opacity_reset_step


def training(cfg, scene: Optional[Scene] = None, max_iterations=None,
             log_every: int = 10, progress: bool = True):
    """Full optimization loop. Returns (scene, final state, logger)."""
    scene = scene or Scene(cfg, seed=max(int(cfg.get('seed', -1)), 0))
    state = scene.init_state()
    opt = cfg.opt
    iterations = int(max_iterations or opt.iterations)

    exp_dir = cfg.get('exp_dir') or os.path.join(
        'exp', str(cfg.get('name', 'run')))
    os.makedirs(exp_dir, exist_ok=True)
    logger = MetricLogger(os.path.join(exp_dir, 'metrics.jsonl'))

    train_step = make_train_step(scene)
    densify_step, opacity_reset_step = make_densify_step(scene)

    checkpoint_iterations = list(cfg.get('checkpoint_iterations', []) or [])
    checkpoint_iterations.append(iterations)  # train.py:306
    save_iterations = list(cfg.get('save_iterations', []) or [])

    densify_until = int(opt.densify_until_iter)
    densify_from = int(opt.densify_from_iter)
    densify_interval = int(opt.densification_interval)
    opacity_reset_interval = int(opt.opacity_reset_interval)
    gauss_delay = int(cfg.model.gaussian.get('delay', 0))
    white_bg = bool(cfg.dataset.white_background)

    rng = np.random.default_rng(max(int(cfg.get('seed', -1)), 0))
    data_stack: list = []
    t0 = time.time()

    for iteration in range(1, iterations + 1):
        if not data_stack:
            data_stack = list(range(len(scene.train_dataset)))
        data_idx = data_stack.pop(int(rng.integers(len(data_stack))))
        camera = scene.train_dataset[data_idx]

        weights = loss_weights(cfg, iteration)
        in_window = (iteration < densify_until) and (iteration > gauss_delay)
        weights['_in_densify_window'] = 1.0 if in_window else 0.0
        xyz_lr = float(scene.xyz_lr_fn(iteration))
        deg = scene.active_sh_degree(iteration)

        state, metrics = train_step(state, camera,
                                    jnp.int32(iteration), weights, xyz_lr,
                                    active_sh_degree=deg)

        if in_window and iteration > densify_from \
                and iteration % densify_interval == 0:
            key = jax.random.PRNGKey(iteration)
            use_ss = iteration > opacity_reset_interval
            state, dinfo = densify_step(state, key, use_ss)
            logger.log(iteration, {f'densify/{k}': int(v)
                                   for k, v in dinfo.items()})

        if iteration < densify_until and (
                iteration % opacity_reset_interval == 0
                or (white_bg and iteration == densify_from)):
            state = opacity_reset_step(state)

        if iteration % log_every == 0 or iteration == 1:
            m = {k: float(v) for k, v in metrics.items()}
            m['iter_time'] = (time.time() - t0) / log_every * 1000.0
            logger.log(iteration, m)
            if progress and (iteration % (log_every * 10) == 0
                             or iteration == 1):
                print(f"[{iteration}/{iterations}] "
                      f"loss={m['loss/total_loss']:.5f} "
                      f"psnr={m['psnr']:.2f} n={int(m['n_alive'])} "
                      f"({m['iter_time']:.0f} ms/it)", flush=True)
            t0 = time.time()

        if iteration in save_iterations:
            from gsavatar.utils import ply
            ply.save_arena_ply(
                os.path.join(exp_dir, 'point_cloud',
                             f'iteration_{iteration}', 'point_cloud.ply'),
                state.gauss_params, state.gauss_aux)
        if iteration in checkpoint_iterations:
            scene.save_checkpoint(state, iteration, exp_dir)

    return scene, state, logger


def main(argv=None):
    """CLI parity with the reference: `python -m gsavatar.train
    dataset=zjumocap_377_mono option=iter15k opt.iterations=100 ...`"""
    import sys
    from gsavatar.config import load_config
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config(overrides=overrides)
    cfg['exp_dir'] = cfg.get('exp_dir') or os.path.join('exp', str(cfg.name))
    print(f"Optimizing {cfg.exp_dir}")
    training(cfg)
    print("\nTraining complete.")


if __name__ == '__main__':
    main()
