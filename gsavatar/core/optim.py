"""Arena Adam — per-group Adam over the Gaussian arena with surgical state ops.

Matches torch.optim.Adam semantics (bias correction, eps=1e-15 added AFTER
the sqrt, as torch does) used by the reference for the 6 Gaussian parameter
groups (gaussian_model.py:201-228). The reference's optimizer-state surgery
under densify/prune (gaussian_model.py:311-380) maps to masked zeroing of the
per-slot moments; the per-group `step` counter is shared (all groups step
together each iteration past the delay, exactly as upstream).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .gaussians import GaussianParams

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


@struct.dataclass
class ArenaAdamState:
    m: GaussianParams
    v: GaussianParams
    step: Any  # () int32


def init_adam(params: GaussianParams) -> ArenaAdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return ArenaAdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                          step=jnp.zeros((), jnp.int32))


def adam_step(params: GaussianParams, grads: GaussianParams,
              state: ArenaAdamState, lrs: dict, alive,
              apply: Any = True):
    """One Adam step. `lrs` maps field name -> scalar lr (traced ok). Updates
    only alive slots; `apply` (traced bool) gates the whole step (the
    reference skips the Gaussian optimizer before model.gaussian.delay,
    scene/__init__.py:71-76, but still zeroes grads — a no-op here)."""
    step = state.step + jnp.asarray(apply, jnp.int32)
    t = jnp.maximum(step, 1).astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** t
    bc2 = 1.0 - ADAM_B2 ** t

    def upd(field):
        p = getattr(params, field)
        g = getattr(grads, field)
        m = getattr(state.m, field)
        v = getattr(state.v, field)
        mask = alive.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        do = jnp.asarray(apply, p.dtype) * mask
        m_new = m + do * ((1 - ADAM_B1) * (g - m))
        v_new = v + do * ((1 - ADAM_B2) * (g * g - v))
        update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + ADAM_EPS)
        p_new = p - do * lrs[field] * update
        return p_new, m_new, v_new

    fields = ["xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity"]
    out = {f: upd(f) for f in fields}
    new_params = GaussianParams(**{f: out[f][0] for f in fields})
    new_m = GaussianParams(**{f: out[f][1] for f in fields})
    new_v = GaussianParams(**{f: out[f][2] for f in fields})
    return new_params, ArenaAdamState(m=new_m, v=new_v, step=step)


def zero_moments(state: ArenaAdamState, slot_mask, fields=None) -> ArenaAdamState:
    """Zero the Adam moments of the given slots (surgery for clone/split/
    reset_opacity). `fields=None` means every group."""
    fields = fields or ["xyz", "features_dc", "features_rest", "scaling",
                        "rotation", "opacity"]

    def z(tree):
        reps = {}
        for f in fields:
            x = getattr(tree, f)
            mask = slot_mask.reshape((-1,) + (1,) * (x.ndim - 1))
            reps[f] = jnp.where(mask, 0.0, x)
        return tree.replace(**reps)

    return state.replace(m=z(state.m), v=z(state.v))
