"""Positional-encoding embedders.

Parity: models/network_utils.py:8-117 of the reference. Output layout matches
exactly — [x?, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] with
log-sampled frequencies 2^0..2^(multires-1) — so downstream MLP input layouts
line up. The Hann-window variant takes the iteration as a traced scalar, so
one jitted train step covers the whole annealing schedule."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_embedder(multires: int, input_dims: int = 3):
    """Returns (embed_fn, out_dim). multires == 0 -> identity."""
    if multires == 0:
        return (lambda x: x), input_dims
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x):
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim


def hannw_weights(iteration, multires: int, kick_in_iter: int,
                  full_band_iter: int):
    """Per-frequency Hann window weights (network_utils.py:79-96).
    `iteration` may be traced. Returns (multires,) weights in [0, 1]."""
    if full_band_iter <= 0 or kick_in_iter >= full_band_iter:
        alpha = jnp.float32(multires)
    else:
        t = jnp.maximum(jnp.asarray(iteration, jnp.float32) - kick_in_iter, 0.0)
        alpha = multires * t / (full_band_iter - kick_in_iter)
    idx = jnp.arange(multires, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - idx, 0.0, 1.0))) / 2.0


def get_hannw_embedder(multires: int, kick_in_iter: int, full_band_iter: int,
                       input_dims: int = 3):
    """Annealed embedder WITHOUT the identity part (include_input=False,
    network_utils.py:105-117). Returns (embed_fn(x, iteration), out_dim)."""
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    out_dim = input_dims * 2 * multires

    def embed(x, iteration):
        w = hannw_weights(iteration, multires, kick_in_iter, full_band_iter)
        parts = []
        for i, f in enumerate(freqs):
            parts.append(w[i] * jnp.sin(x * f))
            parts.append(w[i] * jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
