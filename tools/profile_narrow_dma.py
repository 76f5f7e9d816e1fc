#!/usr/bin/env python
"""Can Mosaic DMA (chunk, 12)-shaped slices of a (P, 12) HBM array (full
lane width, narrow logical lanes)? If yes, the compositor's explicit
128-lane pair padding (and its 1 GB gradient buffer) is unnecessary."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

P = 1 << 21
COLS = 12
CHUNK = 64


def _kernel(x_hbm, out_ref, buf, sem):
    b = pl.program_id(0)

    def load(i, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * 1024 + i * CHUNK, CHUNK), :],
            buf.at[slot], sem.at[slot])

    load(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < 1024 // CHUNK)
        def _():
            load(i + 1, (i + 1) % 2).start()
        load(i, slot).wait()
        return acc + jnp.sum(buf[slot], axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, 1024 // CHUNK, body,
                            jnp.zeros((1, COLS), jnp.float32))
    out_ref[0, :, :] = jnp.pad(jnp.broadcast_to(acc, (8, COLS)),
                               ((0, 0), (0, 128 - COLS)))


@jax.jit
def run(x):
    return pl.pallas_call(
        _kernel,
        grid=(P // 1024,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P // 1024, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, CHUNK, COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(x)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (P, COLS), jnp.float32)
    out = run(x)
    import numpy as np
    expect = np.asarray(x).reshape(P // 1024, 1024, COLS).sum(axis=1)
    got = np.asarray(out)[:, 0, :COLS]
    err = np.abs(got - expect).max()
    print("narrow DMA works, max err", err)
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(run(x)))
    print("avg ms", (time.perf_counter() - t0) / 20 * 1e3)


if __name__ == '__main__':
    main()
