"""Adaptive density control as fixed-shape masked ops on the arena.

Parity: scene/gaussian_model.py:382-466 and train.py:217-227 of the
reference, with the dynamic concat/slice surgery replaced by scatters into
free arena slots:

  * clone  — grad-norm >= threshold AND max scale <= percent_dense*extent:
             the selected gaussian is duplicated into a free slot (fresh Adam
             moments, gaussian_model.py:427-440).
  * split  — grad-norm >= threshold AND max scale > percent_dense*extent:
             two children sampled from the gaussian (std=scale, rotated),
             scales /(0.8*N); child #1 overwrites the parent slot (the
             reference prunes the parent and appends 2 children — same set),
             child #2 takes a free slot (gaussian_model.py:402-425).
  * prune  — opacity < threshold, plus world-size > 0.1*extent when a screen
             threshold is active. NOTE the reference's screen-radius prune is
             a no-op upstream quirk: densification_postfix zeroes max_radii2D
             before the prune mask reads it (gaussian_model.py:398-400 vs
             454-458); we reproduce that exactly for parity.
  * stats reset — every densify round zeroes the grad accumulators and
             max_radii2D for all slots (densification_postfix behavior).

Capacity pressure: if free slots run out, surplus clones/splits are dropped
(counted in the returned info dict — the reference grows unboundedly, so size
the arena to keep `n_dropped` at zero).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gsavatar.utils import transforms as T
from .gaussians import GaussianAux, GaussianParams
from .optim import ArenaAdamState, zero_moments


def add_stats(aux: GaussianAux, means2d_grad, radii) -> GaussianAux:
    """Accumulate screen-space gradient norms for visible gaussians
    (train.py:219-220, gaussian_model.py:464-466). `means2d_grad` is the
    gradient w.r.t. the rasterizer's means2d_offset hook, (N, 2)."""
    vis = (radii > 0) & aux.alive
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    return aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(aux.max_radii2d,
                                               radii.astype(jnp.float32)),
                              aux.max_radii2d))


def add_stats_prefix(aux: GaussianAux, means2d_grad, radii) -> GaussianAux:
    """add_stats for a bucketed step: `means2d_grad`/`radii` cover only the
    first `b` arena rows (the alive prefix — see densify compaction)."""
    b = radii.shape[0]
    vis = (radii > 0) & aux.alive[:b]
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    max_r = jnp.where(vis, jnp.maximum(aux.max_radii2d[:b],
                                       radii.astype(jnp.float32)),
                      aux.max_radii2d[:b])
    return aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum.at[:b].add(
            jnp.where(vis, gnorm, 0.0)),
        denom=aux.denom.at[:b].add(vis.astype(jnp.float32)),
        max_radii2d=aux.max_radii2d.at[:b].set(max_r))


def _scatter_rows(tree: GaussianParams, src_idx, dst_idx) -> GaussianParams:
    """tree[dst_idx[i]] = tree[src_idx[i]] for every i (drop OOB dst)."""
    def f(x):
        return x.at[dst_idx].set(x[src_idx], mode='drop')
    return jax.tree.map(f, tree)


def densify_and_prune(params: GaussianParams, aux: GaussianAux,
                      adam: ArenaAdamState, key, *, grad_threshold: float,
                      min_opacity: float, extent: float, percent_dense: float,
                      use_screen_size_prune) -> Tuple[GaussianParams,
                                                      GaussianAux,
                                                      ArenaAdamState, dict]:
    N = params.xyz.shape[0]
    alive = aux.alive
    grads = aux.xyz_gradient_accum / jnp.maximum(aux.denom, 1e-20)
    grads = jnp.where(aux.denom > 0, grads, 0.0)

    scale = jnp.exp(params.scaling)
    max_scale = scale.max(axis=1)
    hot = alive & (grads >= grad_threshold)
    clone_sel = hot & (max_scale <= percent_dense * extent)
    split_sel = hot & (max_scale > percent_dense * extent)

    free_slots = jnp.nonzero(~alive, size=N, fill_value=N)[0]
    n_free = jnp.sum(~alive)

    # ---- clones: copy raw params into free slots --------------------------
    clone_rank = jnp.cumsum(clone_sel) - 1
    clone_src = jnp.nonzero(clone_sel, size=N, fill_value=0)[0]
    n_clone_want = jnp.sum(clone_sel)
    n_clone = jnp.minimum(n_clone_want, n_free)
    slot_ids = jnp.arange(N)
    clone_dst = jnp.where(slot_ids < n_clone, free_slots[slot_ids], N)
    params = _scatter_rows(params, clone_src, clone_dst)
    new_alive = alive.at[clone_dst].set(True, mode='drop')

    # ---- splits -----------------------------------------------------------
    # child #1 overwrites the parent in place; child #2 -> next free slots
    split_rank = jnp.cumsum(split_sel) - 1
    n_split_want = jnp.sum(split_sel)
    n_split = jnp.minimum(n_split_want, n_free - n_clone)
    split_src = jnp.nonzero(split_sel, size=N, fill_value=0)[0]
    split_ok = slot_ids < n_split
    child2_dst = jnp.where(split_ok, free_slots[jnp.minimum(n_clone + slot_ids,
                                                            N - 1)], N)

    k1, k2 = jax.random.split(key)
    eps1 = jax.random.normal(k1, (N, 3))
    eps2 = jax.random.normal(k2, (N, 3))
    rot = T.quat_to_rotmat(params.rotation)          # normalized internally
    std = scale

    def child_xyz(eps):
        return params.xyz + (rot @ (std * eps)[..., None])[..., 0]

    new_scaling = jnp.log(scale / (0.8 * 2))

    # child #2 rows built from parents, then scattered to free slots
    child2 = GaussianParams(
        xyz=child_xyz(eps2), features_dc=params.features_dc,
        features_rest=params.features_rest, scaling=new_scaling,
        rotation=params.rotation, opacity=params.opacity)
    params = jax.tree.map(
        lambda full, ch: full.at[child2_dst].set(ch[split_src], mode='drop'),
        params, child2)
    new_alive = new_alive.at[child2_dst].set(True, mode='drop')

    # child #1 overwrites parents in place (only for splits that got a slot
    # for child #2 — if capacity ran out the parent is left untouched, which
    # degrades to "no split" rather than losing the parent)
    placed_parent = jnp.zeros(N, bool).at[
        jnp.where(split_ok, split_src, N)].set(True, mode='drop')
    c1_xyz = child_xyz(eps1)
    params = params.replace(
        xyz=jnp.where(placed_parent[:, None], c1_xyz, params.xyz),
        scaling=jnp.where(placed_parent[:, None], new_scaling, params.scaling))

    # fresh Adam moments for every touched slot (surgery parity)
    touched = jnp.zeros(N, bool)
    touched = touched.at[clone_dst].set(True, mode='drop')
    touched = touched.at[child2_dst].set(True, mode='drop')
    touched = touched | placed_parent
    adam = zero_moments(adam, touched)

    # ---- prune ------------------------------------------------------------
    opacity = jax.nn.sigmoid(params.opacity)[:, 0]
    prune = new_alive & (opacity < min_opacity)
    max_scale_new = jnp.exp(params.scaling).max(axis=1)
    # screen-size branch: max_radii2d is zeroed before the mask is computed in
    # the reference (see module docstring) — keep the world-size term only,
    # gated exactly like upstream.
    big_ws = new_alive & (max_scale_new > 0.1 * extent)
    prune = jnp.where(jnp.asarray(use_screen_size_prune), prune | big_ws, prune)
    new_alive = new_alive & ~prune

    # ---- compaction: permute alive slots to a contiguous prefix -----------
    # (stable sort keeps the original relative order). The training step only
    # touches arena[:bucket] rows (train.py), so every downstream stage —
    # deformers, MLPs, rasterizer, losses — runs over ~n_alive rows instead
    # of capacity. Stats were just reset, so only params/adam/alive permute;
    # nn_ix becomes stale and is refreshed by the caller (refresh_knn).
    order = jnp.argsort(~new_alive, stable=True)
    params = jax.tree.map(lambda x: x[order], params)
    adam = adam.replace(m=jax.tree.map(lambda x: x[order], adam.m),
                        v=jax.tree.map(lambda x: x[order], adam.v))
    new_alive = new_alive[order]

    aux = GaussianAux(alive=new_alive,
                      max_radii2d=jnp.zeros(N),
                      xyz_gradient_accum=jnp.zeros(N),
                      denom=jnp.zeros(N),
                      nn_ix=jnp.zeros((N, aux.nn_ix.shape[1]), jnp.int32))

    info = {
        'n_cloned': n_clone, 'n_split': n_split,
        'n_dropped': (n_clone_want - n_clone) + (n_split_want - n_split),
        'n_pruned': jnp.sum(prune), 'n_alive': jnp.sum(new_alive),
    }
    return params, aux, adam, info


def reset_opacity(params: GaussianParams, adam: ArenaAdamState, alive):
    """Clamp opacities to <= 0.01 and reset the opacity Adam moments
    (gaussian_model.py:263-266)."""
    op = jax.nn.sigmoid(params.opacity)
    new = T.inverse_sigmoid(jnp.minimum(op, 0.01))
    params = params.replace(opacity=jnp.where(alive[:, None], new,
                                              params.opacity))
    adam = zero_moments(adam, jnp.ones_like(alive), fields=["opacity"])
    return params, adam
