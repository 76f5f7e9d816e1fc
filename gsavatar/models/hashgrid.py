"""Multiresolution hash-grid encoding (tinycudann replacement, pure JAX).

Parity target: tcnn.Encoding as configured by the reference
(models/network_utils.py:329-344, configs/non_rigid/hashgrid.yaml:22-28):
16 levels x 2 features, 2^16 hash table per level, geometric resolution
growth base->max (per_level_scale = exp(ln(max/base)/(L-1))), input mapped
[-1,1] -> [0,1], trilinear interpolation, spatial hash
(x) xor (y*2654435761) xor (z*805459861) mod T with dense indexing when the
level's grid fits in the table. Differentiable w.r.t. both the table entries
and the input positions. The gather of 8 corners per level per point is an
XLA gather — fine on TPU for the ~50k-point workloads here."""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

_PRIMES = (1, 2654435761, 805459861)


class HashGrid(nn.Module):
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    max_resolution: int = 2048
    per_level_scale: float = 0.0  # derived from max_resolution when <= 0

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def _resolutions(self):
        if self.max_resolution > 0:
            b = float(np.exp(np.log(self.max_resolution / self.base_resolution)
                             / (self.n_levels - 1)))
        else:
            b = self.per_level_scale
        return [int(np.floor(self.base_resolution * b ** l))
                for l in range(self.n_levels)]

    @nn.compact
    def __call__(self, x_sym):
        """x_sym (N, 3) in [-1, 1] -> (N, L*F).

        All (level, corner) table lookups are batched into ONE gather whose
        VJP is the sort-based segment sum (ops/segsum.py): XLA's scatter-add
        transpose of the 16x8xN lookups costs ~168 ms/step on TPU; the
        scatter-free transpose is ~8x faster. The forward gathers from a
        bfloat16 view of the table (tinycudann's tables are fp16 — the
        reference runs this encoding in half precision; network_utils.py:329)
        which trims the dominant gather's bytes; parameters and gradients
        stay f32. The backward sorts per level (batched) — cheaper than one
        global sort (ops/segsum.segment_sum_leveled). Gradients w.r.t.
        positions flow through the trilinear weights (outside the custom
        gather)."""
        T = 1 << self.log2_hashmap_size
        F = self.n_features_per_level
        L = self.n_levels
        table = self.param(
            'table',
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1e-4, 1e-4),
            (L, T, F))

        x = (x_sym + 1.0) * 0.5  # [-1,1] -> [0,1] (network_utils.py:342)
        N = x.shape[0]
        idx_all = []   # L*8 entries of (N,)
        w_all = []
        for l, res in enumerate(self._resolutions()):
            pos = x * res
            p0 = jnp.floor(pos)
            frac = pos - p0
            p0 = p0.astype(jnp.int32)
            dense = (res + 1) ** 3 <= T
            for corner in range(8):
                off = jnp.asarray([(corner >> 0) & 1, (corner >> 1) & 1,
                                   (corner >> 2) & 1], jnp.int32)
                c = p0 + off
                if dense:
                    idx = (c[:, 0] * (res + 1) + c[:, 1]) * (res + 1) + c[:, 2]
                    idx = jnp.remainder(idx, T)
                else:
                    cu = c.astype(jnp.uint32)
                    idx = (cu[:, 0] * jnp.uint32(_PRIMES[0])) \
                        ^ (cu[:, 1] * jnp.uint32(_PRIMES[1])) \
                        ^ (cu[:, 2] * jnp.uint32(_PRIMES[2]))
                    idx = (idx % jnp.uint32(T)).astype(jnp.int32)
                idx_all.append(idx)                         # per-level ids
                w_all.append(jnp.prod(
                    jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1))

        idx_lvl = jnp.stack(idx_all).reshape(L, 8 * N)      # local ids
        w_cat = jnp.stack(w_all).reshape(L, 8, N, 1)
        g = _hash_gather(table.reshape(L * T, F), idx_lvl, T)  # (L, 8N, F)
        g = g.reshape(L, 8, N, F)
        feats = jnp.sum(g * w_cat, axis=1)                  # (L, N, F)
        return feats.transpose(1, 0, 2).reshape(N, L * F)


def _hash_gather(table_flat, idx_lvl, level_size: int):
    """Batched hash-table lookup: table_flat (L*T, F) f32, idx_lvl (L, Mp)
    int32 per-level ids in [0, T). Returns (L, Mp, F) f32 — stacked (not
    concatenated) so the caller's reshape is layout-free.

    Forward: L per-level row gathers from bf16 views of each level's
    256 KB sub-table (measured ~20% faster than one gather from the
    2^20-row concatenation — the small source stages in VMEM;
    tools/profile_gather3.py; bf16 halves the bytes and tinycudann's
    tables are fp16 so half-precision features are parity-faithful).
    Backward: per-level batched sort + blocked segment sum (f32-exact;
    see ops/segsum.segment_sum_leveled)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def f(src, idx, lsz):
        # NOTE: packing the bf16 feature pair into one u32 and gathering
        # scalar elements was measured 34 ms/step SLOWER than this (T, 2)
        # bf16 row gather at the bench shape — TPU row gathers vectorize
        # the feature lanes; don't "optimize" this into an element gather.
        L = idx.shape[0]
        src16 = src.astype(jnp.bfloat16)
        outs = [src16[l * lsz:(l + 1) * lsz][idx[l]] for l in range(L)]
        return jnp.stack(outs, axis=0).astype(jnp.float32)

    def fwd(src, idx, lsz):
        return f(src, idx, lsz), idx

    def bwd(lsz, idx, ct):
        from gsavatar.ops.segsum import segment_sum_leveled
        d = segment_sum_leveled(ct, idx, lsz)
        return d, None

    f.defvjp(fwd, bwd)
    return f(table_flat, idx_lvl, level_size)
