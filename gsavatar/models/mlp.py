"""Conditional MLPs (flax.linen).

Parity: models/network_utils.py:182-324 (VanillaCondMLP / HannwCondMLP):
configurable skip and conditioning layers, LeakyReLU(0.01) activation (ReLU
for the Hann-window variant), optional N(0, 1e-5) last-layer init, skip
concat scaled by 1/sqrt(2). Dense layers use torch's default
kaiming-uniform init so training dynamics match the reference."""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .embedders import get_embedder, get_hannw_embedder


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    flax kernels are (in, out): fan_in = shape[0]."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """Dense with torch-Linear default initialization (bias included)."""
    features: int
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_linear_kernel_init
        bound = 1.0 / math.sqrt(fan_in)
        binit = lambda key, shape, dtype=jnp.float32: \
            jax.random.uniform(key, shape, dtype, -bound, bound)
        return nn.Dense(self.features, kernel_init=kinit, bias_init=binit)(x)


class VanillaCondMLP(nn.Module):
    dim_in: int
    dim_cond: int
    dim_out: int
    n_neurons: int
    n_hidden_layers: int
    skip_in: Sequence[int] = ()
    cond_in: Sequence[int] = ()
    multires: int = 0
    last_layer_init: bool = False

    @nn.compact
    def __call__(self, coords, cond=None):
        dims = [self.dim_in] + [self.n_neurons] * self.n_hidden_layers \
            + [self.dim_out]
        if self.multires > 0:
            embed_fn, input_ch = get_embedder(self.multires, self.dim_in)
            dims[0] = input_ch
            x = embed_fn(coords)
        else:
            x = coords
        coords_embedded = x

        num_layers = len(dims)
        for l in range(num_layers - 1):
            out_dim = dims[l + 1] - dims[0] if (l + 1) in self.skip_in \
                else dims[l + 1]
            if l in self.cond_in:
                c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
                x = jnp.concatenate([x, c], axis=1)
            if l in self.skip_in:
                x = jnp.concatenate([x, coords_embedded], axis=1) / np.sqrt(2)
            kinit = None
            if self.last_layer_init and l == num_layers - 2:
                kinit = lambda key, shape, dtype=jnp.float32: \
                    jax.random.normal(key, shape, dtype) * 1e-5
                x = nn.Dense(out_dim, kernel_init=kinit,
                             bias_init=nn.initializers.zeros,
                             name=f"lin{l}")(x)
            else:
                x = TorchDense(out_dim, name=f"lin{l}")(x)
            if l < num_layers - 2:
                x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class HannwCondMLP(nn.Module):
    """ReLU MLP with annealed positional encoding; conditional-input columns
    zero-initialized, all biases zero (network_utils.py:279-297)."""
    dim_in: int
    dim_cond: int
    dim_out: int
    n_neurons: int
    n_hidden_layers: int
    kick_in_iter: int
    full_band_iter: int
    skip_in: Sequence[int] = ()
    cond_in: Sequence[int] = ()
    multires: int = 0

    @nn.compact
    def __call__(self, coords, iteration, cond=None):
        dims = [self.dim_in] + [self.n_neurons] * self.n_hidden_layers \
            + [self.dim_out]
        if self.multires > 0:
            embed_fn, input_ch = get_hannw_embedder(
                self.multires, self.kick_in_iter, self.full_band_iter,
                self.dim_in)
            dims[0] = input_ch
            x = embed_fn(coords, iteration)
        else:
            x = coords
        coords_embedded = x

        num_layers = len(dims)
        for l in range(num_layers - 1):
            out_dim = dims[l + 1] - dims[0] if (l + 1) in self.skip_in \
                else dims[l + 1]
            is_cond = l in self.cond_in
            if is_cond:
                c = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
                x = jnp.concatenate([x, c], axis=1)
            if l in self.skip_in:
                x = jnp.concatenate([x, coords_embedded], axis=1) / np.sqrt(2)

            dim_cond = self.dim_cond

            def kinit(key, shape, dtype=jnp.float32, _cond=is_cond,
                      _dc=dim_cond):
                w = torch_linear_kernel_init(key, shape, dtype)
                if _cond and _dc > 0:
                    w = w.at[-_dc:, :].set(0.0)
                return w

            x = nn.Dense(out_dim, kernel_init=kinit,
                         bias_init=nn.initializers.zeros, name=f"lin{l}")(x)
            if l < num_layers - 2:
                x = nn.relu(x)
        return x


def cond_mlp_from_cfg(dim_in: int, dim_cond: int, dim_out: int, cfg) -> VanillaCondMLP:
    """Build from a reference-style mlp config node (n_neurons,
    n_hidden_layers, skip_in, cond_in, multires, last_layer_init)."""
    return VanillaCondMLP(
        dim_in=dim_in, dim_cond=dim_cond, dim_out=dim_out,
        n_neurons=cfg.n_neurons, n_hidden_layers=cfg.n_hidden_layers,
        skip_in=tuple(cfg.get('skip_in', ())),
        cond_in=tuple(cfg.get('cond_in', ())),
        multires=cfg.get('multires', 0),
        last_layer_init=cfg.get('last_layer_init', False))
