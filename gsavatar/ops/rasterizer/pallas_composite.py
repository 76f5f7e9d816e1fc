"""Fused per-tile compositor — Pallas TPU kernels (forward + backward).

This is the speed-of-light path replacing composite.py's XLA scan: one
kernel program per 16x16 tile streams its contiguous [start, end) slice of
the sorted pair array from HBM (double-buffered DMA), evaluates splat alphas
for all 256 pixels at once on the VPU (chunk rows x pixel lanes), turns the
sequential front-to-back transmittance recursion into an in-register
log-space cumsum, and accumulates color on the MXU ((3, C) @ (C, 256) per
chunk). Early termination per tile when every pixel's transmittance passes
the 1e-4 cutoff — the same semantics as composite.py (and the CUDA kernel).

The backward kernel re-walks each tile's pairs BACK to front (chunk-reversed)
reconstructing transmittance by division, forms per-pair gradients w.r.t.
screen mean / conic / color / opacity in closed form, and writes them to a
contiguous per-pair gradient array; the caller reduces pairs onto gaussians
through the gather transpose (ops/segsum.py gather_rows VJP — sort +
blocked segment sum). Gradient parity with the autodiff XLA path is
enforced by tests/test_pallas_raster.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .project import TILE
from .pairs import LIVE_COLS, PAIR_COLS

_LOG_TERM = math.log(1e-4)
_MIN_ALPHA = 1.0 / 255.0
_MAX_ALPHA = 0.99

P_PIX = TILE * TILE  # 256
OUT_ROWS = 8         # [r, g, b, alpha, final_T, pad, pad, pad]

# HBM pair rows are padded to a full 128-lane tile: a (P, 12) f32 array is
# physically (P, 128) under the TPU's (1, 128) tiling anyway, and Mosaic
# requires DMA slice shapes lane-aligned — so the padding is free in bytes
# and buys legal chunk DMAs.
PAIR_LANES = 128


def _cumsum_rows(x, n_rows: int, interpret: bool = False):
    """Inclusive prefix sum along axis 0 (rows) of a 2D (C, P) block via
    log-step doubling — Pallas TPU has no cumsum lowering. The interpreter
    has no working pltpu.roll (it hangs), so interpret mode keeps
    jnp.cumsum."""
    if interpret:
        return jnp.cumsum(x, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < n_rows:
        shifted = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(rows >= shift, shifted, 0.0)
        shift *= 2
    return x


def _pixel_coords(t, grid_x):
    """Pixel-center coordinates of tile t: (1, 256) x and y."""
    tx = (t % grid_x).astype(jnp.float32)
    ty = (t // grid_x).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P_PIX), 1)
    px = tx * TILE + (pix % TILE).astype(jnp.float32)
    py = ty * TILE + (pix // TILE).astype(jnp.float32)
    return px, py


def _chunk_terms(buf, px, py, row_valid):
    """Common per-chunk math. buf (C, PAIR_COLS); returns alpha, skip, log1m,
    color rows. All (C, 256) except color (C, 3)."""
    m2dx = buf[:, 0:1]
    m2dy = buf[:, 1:2]
    con_a = buf[:, 2:3]
    con_b = buf[:, 3:4]
    con_c = buf[:, 4:5]
    opac = buf[:, 8:9]
    dx = m2dx - px                       # (C, 256)
    dy = m2dy - py
    power = -0.5 * (con_a * dx * dx + con_c * dy * dy) - con_b * dx * dy
    alpha = jnp.minimum(_MAX_ALPHA, opac * jnp.exp(power))
    skip = (power > 0.0) | (alpha < _MIN_ALPHA) | (~row_valid)
    log1m = jnp.where(skip, 0.0, jnp.log1p(-alpha))
    return alpha, skip, log1m


def _fwd_kernel(tile_start_ref, tile_base_ref, pair_hbm, out_ref, buf, sem,
                *, chunk, grid_x, interpret=False):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    n = end - start
    # tile_base: first global tile id of this kernel's range (nonzero when
    # the compositor is partitioned over the mesh `model` axis — each shard
    # owns a contiguous tile-range slice)
    px, py = _pixel_coords(tile_base_ref[0] + t, grid_x)

    def load(i, slot):
        return pltpu.make_async_copy(
            pair_hbm.at[pl.ds(start + i * chunk, chunk), :],
            buf.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _():
        load(0, 0).start()

    def cond(state):
        i, carry, frozen, acc = state
        return (i * chunk < n) & (jnp.max(carry) >= _LOG_TERM)

    def body(state):
        i, carry, frozen, acc = state
        slot = i % 2

        @pl.when((i + 1) * chunk < n)
        def _():
            load(i + 1, (i + 1) % 2).start()

        load(i, slot).wait()
        data = buf[slot]                                  # (C, PAIR_COLS)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = (i * chunk + rows) < n
        alpha, skip, log1m = _chunk_terms(data, px, py, row_valid)

        cum = carry + _cumsum_rows(log1m, chunk, interpret)  # (C, 256)
        include = (cum >= _LOG_TERM) & (~skip)
        T_before = jnp.exp(cum - log1m)
        w = jnp.where(include, alpha * T_before, 0.0)     # (C, 256)

        rgb = data[:, 5:8]                                # (C, 3)
        # HIGHEST: keep the compositing accumulation f32-exact (the MXU's
        # default bf16 pass costs ~0.5% on gradients; these matmuls are a
        # negligible fraction of the kernel)
        acc = acc + jax.lax.dot_general(
            rgb, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (3, 256)
        chunk_min = jnp.min(jnp.where(include, cum, 0.0), axis=0,
                            keepdims=True)
        frozen = jnp.minimum(frozen, chunk_min)
        return i + 1, cum[-1:], frozen, acc

    init = (jnp.int32(0), jnp.zeros((1, P_PIX), jnp.float32),
            jnp.zeros((1, P_PIX), jnp.float32),
            jnp.zeros((3, P_PIX), jnp.float32))
    i_end, carry, frozen, acc = jax.lax.while_loop(cond, body, init)

    # early termination can leave the next chunk's prefetch DMA in flight;
    # an un-drained semaphore at kernel end is a hard error on TPU
    @pl.when(i_end * chunk < n)
    def _():
        load(i_end, i_end % 2).wait()

    final_T = jnp.exp(frozen)                             # (1, 256)
    # background blending happens OUTSIDE the kernel (XLA) so no constant
    # array is captured; rows 0-2 are the raw accumulated color
    out_ref[0, 0:3, :] = acc
    out_ref[0, 3:4, :] = 1.0 - final_T
    out_ref[0, 4:5, :] = final_T
    out_ref[0, 5:, :] = jnp.zeros((OUT_ROWS - 5, P_PIX), jnp.float32)


def composite_pairs_fwd(pair_data, tile_start, *, num_tiles: int,
                        grid_x: int, chunk: int = 64,
                        interpret: bool = False, tile_base=None):
    """pair_data (P + chunk, PAIR_LANES) (padded!), tile_start (T+1,) —
    T = num_tiles of THIS call (the local slice when sharded; tile_base is
    the first global tile id, default 0). Returns (T, OUT_ROWS, 256) raw
    tile outputs: rows 0-2 accumulated color WITHOUT background, row 3
    alpha, row 4 final transmittance."""
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_fwd_kernel, chunk=chunk, grid_x=grid_x,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, P_PIX),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PAIR_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, P_PIX),
                                       jnp.float32),
        interpret=interpret,
    )(tile_start, tile_base, pair_data)


def _bwd_kernel(tile_start_ref, tile_base_ref, pair_hbm, ct_hbm, fwd_hbm,
                grad_hbm, buf, ct_buf, fwd_buf, grad_buf, sem, ct_sem,
                ft_sem, gr_sem, *, chunk, grid_x, interpret=False):
    """Backward per tile, walking FORWARD with the same DMA pattern as the
    forward kernel. Key identity: the suffix term of the alpha gradient is
    expressed through the forward output (a residual) instead of a
    back-to-front walk:
        S'_k = sum_{j>k} w_j c_j = acc_out - prefix_{j<=k} w_j c_j,
    which stays exact under early termination (excluded rows have w=0); the
    background path lives outside the kernel and arrives through the
    final-T cotangent (row 4). ct rows 0-2 = dL/d raw color, row 3 = dL/d
    alpha image, row 4 = dL/d final_T. Writes per-pair grads to grad_hbm."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    n = end - start
    px, py = _pixel_coords(tile_base_ref[0] + t, grid_x)

    pltpu.make_async_copy(ct_hbm.at[t], ct_buf, ct_sem).start()
    pltpu.make_async_copy(fwd_hbm.at[t], fwd_buf, ft_sem).start()
    pltpu.make_async_copy(ct_hbm.at[t], ct_buf, ct_sem).wait()
    pltpu.make_async_copy(fwd_hbm.at[t], fwd_buf, ft_sem).wait()

    def load(i, slot):
        return pltpu.make_async_copy(
            pair_hbm.at[pl.ds(start + i * chunk, chunk), :],
            buf.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _():
        load(0, 0).start()

    ct_rgb = ct_buf[0:3, :]                                # (3, 256)
    ct_alpha = ct_buf[3:4, :]                              # (1, 256)
    ct_finalT_img = ct_buf[4:5, :]
    acc_out = fwd_buf[0:3, :]                              # (3, 256)
    final_T = fwd_buf[4:5, :]                              # (1, 256)

    # dL/dT_end through the alpha image (alpha = 1 - T_end) and the final_T
    # output (which carries the XLA-side background-blend cotangent)
    dL_dT_end = ct_finalT_img - ct_alpha

    # NOTE: no early-termination break here — every pair row in the tile's
    # range must receive a (possibly zero) gradient row, otherwise the
    # uninitialized tail would be scattered onto real gaussians.
    def cond(state):
        i, carry, prefix = state
        return i * chunk < n

    def body(state):
        i, carry, prefix = state
        slot = i % 2

        @pl.when((i + 1) * chunk < n)
        def _():
            load(i + 1, (i + 1) % 2).start()

        load(i, slot).wait()
        data = buf[slot]
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        row_valid = (i * chunk + rows) < n
        alpha, skip, log1m = _chunk_terms(data, px, py, row_valid)

        cum = carry + _cumsum_rows(log1m, chunk, interpret)
        include = (cum >= _LOG_TERM) & (~skip)
        T_before = jnp.exp(cum - log1m)
        w = jnp.where(include, alpha * T_before, 0.0)      # (C, 256)

        rgb = data[:, 5:8]                                 # (C, 3)
        opac = data[:, 8:9]

        # dL/dc_k = w_k * ct_rgb
        d_color = jax.lax.dot_general(
            w, ct_rgb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (C, 3)

        # inclusive prefix of w_j c_j within + before this chunk, one color
        # channel at a time (keeps every cumsum on a clean 2D (C, 256)
        # layout — a 3D (C, 3, 256) block would force lane reshapes)
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha_px = jnp.zeros_like(w)
        prefix_rows = []
        for c in range(3):
            wc_c = w * rgb[:, c:c + 1]                     # (C, 256)
            pref_c = prefix[c:c + 1] + _cumsum_rows(wc_c, chunk, interpret)
            S_c = acc_out[c:c + 1] - pref_c                # suffix sum
            term_c = T_before * rgb[:, c:c + 1] - S_c / one_m
            d_alpha_px = d_alpha_px + ct_rgb[c:c + 1] * term_c
            prefix_rows.append(prefix[c:c + 1]
                               + jnp.sum(wc_c, axis=0, keepdims=True))
        d_alpha_px = d_alpha_px + dL_dT_end * (-final_T / one_m)
        d_alpha_px = jnp.where(include, d_alpha_px, 0.0)

        # alpha = min(0.99, opac * exp(power)); the clamp kills the gradient
        unclamped = (alpha < _MAX_ALPHA)
        d_opac_px = jnp.where(unclamped, d_alpha_px * alpha / opac, 0.0)
        d_power_px = jnp.where(unclamped, d_alpha_px * alpha, 0.0)

        dx = data[:, 0:1] - px
        dy = data[:, 1:2] - py
        con_a = data[:, 2:3]
        con_b = data[:, 3:4]
        con_c = data[:, 4:5]
        # power = -0.5 (a dx^2 + c dy^2) - b dx dy
        d_dx = d_power_px * (-(con_a * dx) - con_b * dy)
        d_dy = d_power_px * (-(con_c * dy) - con_b * dx)
        sum_px = lambda x: jnp.sum(x, axis=1, keepdims=True)   # (C, 1)
        grad_rows = jnp.concatenate(
            [sum_px(d_dx), sum_px(d_dy),
             sum_px(d_power_px * (-0.5 * dx * dx)),
             sum_px(d_power_px * (-dx * dy)),
             sum_px(d_power_px * (-0.5 * dy * dy)),
             d_color, sum_px(d_opac_px),
             jnp.zeros((chunk, PAIR_LANES - LIVE_COLS), jnp.float32)],
            axis=1)
        grad_buf[:, :] = grad_rows
        copy_out = pltpu.make_async_copy(
            grad_buf, grad_hbm.at[pl.ds(start + i * chunk, chunk), :],
            gr_sem)
        copy_out.start()
        copy_out.wait()
        return i + 1, cum[-1:], jnp.concatenate(prefix_rows, axis=0)

    init = (jnp.int32(0), jnp.zeros((1, P_PIX), jnp.float32),
            jnp.zeros((3, P_PIX), jnp.float32))
    jax.lax.while_loop(cond, body, init)


def composite_pairs_bwd(pair_data, tile_start, ct_tiles, fwd_tiles,
                        *, num_tiles: int, grid_x: int,
                        chunk: int = 64, interpret: bool = False,
                        tile_base=None):
    """ct_tiles (T, OUT_ROWS, 256) cotangents of the forward raw output;
    fwd_tiles (T, OUT_ROWS, 256) forward residual. Returns per-pair grads
    (P + chunk, PAIR_LANES) — only rows inside this call's tile ranges are
    written (callers mask the rest)."""
    if tile_base is None:
        tile_base = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_bwd_kernel, chunk=chunk, grid_x=grid_x,
                               interpret=interpret)
    P = pair_data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PAIR_LANES), jnp.float32),
            pltpu.VMEM((OUT_ROWS, P_PIX), jnp.float32),
            pltpu.VMEM((OUT_ROWS, P_PIX), jnp.float32),
            pltpu.VMEM((chunk, PAIR_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, PAIR_LANES), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_base, pair_data, ct_tiles, fwd_tiles)


@functools.lru_cache(maxsize=None)
def make_composite_pairs(num_tiles: int, grid_x: int, chunk: int = 64,
                         interpret: bool = False):
    """Differentiable fused compositor for a fixed tile-grid config.
    Signature: f(pair_data (P+chunk, COLS), tile_start (T+1,), background
    (3,)) -> (T, OUT_ROWS, 256) raw tiles. Gradients flow to pair_data and
    background."""

    @jax.custom_vjp
    def f(pair_data, tile_start):
        return composite_pairs_fwd(pair_data, tile_start,
                                   num_tiles=num_tiles, grid_x=grid_x,
                                   chunk=chunk, interpret=interpret)

    def f_fwd(pair_data, tile_start):
        out = f(pair_data, tile_start)
        return out, (pair_data, tile_start, out)

    def f_bwd(res, ct):
        pair_data, tile_start, out = res
        grads = composite_pairs_bwd(
            pair_data, tile_start, ct, out,
            num_tiles=num_tiles, grid_x=grid_x, chunk=chunk,
            interpret=interpret)
        # rows past the last real tile range (sentinel/padding pairs) are
        # never written by the kernel — they carry uninitialized memory,
        # but their pair_gauss ids are the drop sentinel, and the segment
        # sum (ops/segsum.py) both drops those ids AND zero-masks values
        # past the valid tail before its matmul, so no full-array mask
        # pass is needed here (it cost ~6 ms/step on the 1 GB padded
        # gradient buffer).
        return grads, None

    f.defvjp(f_fwd, f_bwd)
    return f


def make_composite_pairs_sharded(num_tiles: int, grid_x: int, mesh,
                                 chunk: int = 64, interpret: bool = False):
    """The fused compositor partitioned over the mesh `model` axis via
    shard_map: each shard owns the contiguous tile range
    [m*T/M, (m+1)*T/M) — the (tile,depth)-sorted pair array makes every
    shard's pairs one contiguous span, so a shard composites (and
    back-propagates) only its own slice of the work. pair_data and
    tile_start stay replicated (the pair build is a global sort); the
    forward output is tile-sharded over `model`; the backward psums the
    per-shard pair-gradient slices (each shard writes only rows inside its
    tile ranges, zeroing the rest). Same signature/semantics as
    make_composite_pairs.

    Why the pair BUILD stays replicated (measured, round 4): with the
    driver's pair-arena ladder (train.py pair_ladder) the whole build is a
    small slice of the step at the bench shape — candidate (key,gid) sort
    3.9 ms, pair gather ~0.5 ms, pair-gradient sort 0.7 ms, pair segment
    sum ~0.3 ms out of ~85 ms (tools/trace_step.py) — so partitioning it
    over M<=8 shards saves at most ~4 ms/chip while requiring either
    per-shard span capacities (tile ranges are heavily imbalanced — the
    body concentrates in central tiles) or an all-to-all regroup of
    locally-sorted runs plus a per-owner merge. The per-GAUSSIAN stages
    that dominate the step (hash grid, deformers, optimizers) already
    partition over `model` via the sharding hints. Revisit if the pair
    count per chip grows ~10x (e.g. multi-avatar scenes)."""
    M = int(mesh.shape['model'])
    assert num_tiles % M == 0, (num_tiles, M)
    tiles_per = num_tiles // M

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def _local_range(tile_start):
        m = jax.lax.axis_index('model')
        base = m * tiles_per
        ts_local = jax.lax.dynamic_slice(tile_start, (base,),
                                         (tiles_per + 1,))
        return base[None].astype(jnp.int32), ts_local

    def fwd_local(pair_data, tile_start):
        base, ts_local = _local_range(tile_start)
        return composite_pairs_fwd(
            pair_data, ts_local, num_tiles=tiles_per, grid_x=grid_x,
            chunk=chunk, interpret=interpret, tile_base=base)

    def bwd_local(pair_data, tile_start, ct_local, out_local):
        base, ts_local = _local_range(tile_start)
        grads = composite_pairs_bwd(
            pair_data, ts_local, ct_local, out_local,
            num_tiles=tiles_per, grid_x=grid_x, chunk=chunk,
            interpret=interpret, tile_base=base)
        # only rows inside THIS shard's tile ranges are valid
        row = jnp.arange(grads.shape[0], dtype=jnp.int32)[:, None]
        grads = jnp.where((row >= ts_local[0]) & (row < ts_local[-1]),
                          grads, 0.0)
        return jax.lax.psum(grads, 'model')

    smap = functools.partial(shard_map, mesh=mesh, check_vma=False)
    fwd_sharded = smap(fwd_local, in_specs=(P(None, None), P(None)),
                       out_specs=P('model', None, None))
    bwd_sharded = smap(bwd_local,
                       in_specs=(P(None, None), P(None),
                                 P('model', None, None),
                                 P('model', None, None)),
                       out_specs=P(None, None))

    @jax.custom_vjp
    def f(pair_data, tile_start):
        return fwd_sharded(pair_data, tile_start)

    def f_fwd(pair_data, tile_start):
        out = f(pair_data, tile_start)
        return out, (pair_data, tile_start, out)

    def f_bwd(res, ct):
        pair_data, tile_start, out = res
        return bwd_sharded(pair_data, tile_start, ct, out), None

    f.defvjp(f_fwd, f_bwd)
    return f
