#!/usr/bin/env python
"""Capture a jax.profiler trace of N train steps and print the top device
ops by total duration (parsed from the xplane proto directly)."""
import glob
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()


def parse_xplane(trace_dir, top=40):
    """Per-line accounting: the device plane's 'XLA Ops' line holds the
    serial op timeline (non-overlapping — the real critical path); async
    DMA queues get their own lines whose durations OVERLAP compute and must
    not be summed into the op costs."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    assert files, f"no xplane in {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], 'rb') as f:
        xspace.ParseFromString(f.read())
    per_line = {}
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name \
                and 'Device' not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            totals = per_line.setdefault(line.name, {})
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
    for lname, totals in sorted(per_line.items()):
        ssum = sum(totals.values())
        print(f"\n== line '{lname}': {ssum/1e9:.1f} ms total")
        if 'op' not in lname.lower():
            items = sorted(totals.items(), key=lambda kv: -kv[1])[:5]
        else:
            items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for name, ps in items:
            print(f"{ps/1e9:9.2f} ms  {name[:110]}")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32768)
    ap.add_argument('--cap', type=int, default=131072)
    ap.add_argument('--pairs', type=int, default=2097152)
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--out', default='/tmp/jax_trace')
    args = ap.parse_args()

    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    from gsavatar.train import make_train_step, loss_weights

    cfg = load_config(overrides=[
        "dataset=synthetic", "dataset.img_hw=[540,540]",
        "dataset.n_verts=4096", f"dataset.n_points={args.n}",
        f"dataset.n_target_gaussians={args.n}",
        "dataset.train_frames=[0,4,1]",
        f"model.gaussian.capacity={args.cap}",
        f"rasterizer.max_pairs={args.pairs}",
        "opt.skinning_pool_size=16384",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    train_step = make_train_step(scene)
    camera = scene.device_camera(0, 'train')
    weights = loss_weights(cfg, 1000)
    weights['_in_densify_window'] = 1.0
    xyz_lr = float(scene.xyz_lr_fn(1000))
    n_alive = int(np.sum(np.asarray(state.gauss_aux.alive)))
    bucket = scene.bucket_for(n_alive)
    print(f"bucket={bucket}", flush=True)

    # warmup/compile + pair/rect ladder probe (same sizing as the driver)
    from gsavatar.train import pair_ladder, rect_ladder
    state, metrics = train_step(state, camera, jnp.int32(1000), weights,
                                xyz_lr, active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    pb = pair_ladder(int(metrics['raster/n_pairs'])
                     + int(metrics['overflow/pairs']), args.pairs)
    rw = rect_ladder(int(metrics['raster/max_rect_side']), 8)
    print(f"pair_bucket={pb} rect_window={rw}", flush=True)
    state, metrics = train_step(state, camera, jnp.int32(1000), weights,
                                xyz_lr, active_sh_degree=0, bucket=bucket,
                                pair_bucket=pb, rect_window=rw)
    jax.block_until_ready(metrics['loss/total_loss'])

    t0 = time.time()
    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, metrics = train_step(state, camera, jnp.int32(1001 + i),
                                    weights, xyz_lr, active_sh_degree=0,
                                    bucket=bucket, pair_bucket=pb,
                                    rect_window=rw)
    jax.block_until_ready(metrics['loss/total_loss'])
    jax.profiler.stop_trace()
    print(f"{args.steps} steps in {(time.time()-t0)*1000:.0f} ms traced",
          flush=True)
    parse_xplane(args.out)


if __name__ == '__main__':
    main()
