#!/usr/bin/env python
"""Short 2-subject batched training run on the real chip (VERDICT r5 #4).

Two synthetic subjects (different dataset seeds: different canonical
geometry, AABBs, pose tracks, GT targets) trained in ONE vmapped program
through the multi-subject driver (parallel/multi_subject.py) — the same
path the CPU equivalence test pins to the single-subject driver, here
executed on TPU at a realistic size. Writes RUNS/r05_multisubject_chip/
metrics.jsonl with per-subject loss/psnr rows and per-subject checkpoints."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsavatar.utils.jax_cache import setup_cache
setup_cache()


def main():
    from gsavatar.config import load_config
    from gsavatar.train import training

    cfg = load_config(overrides=[
        "dataset=synthetic",
        "dataset.img_hw=[256,256]",
        "dataset.n_verts=2048",
        "dataset.n_points=16384",
        "dataset.n_target_gaussians=16384",
        "dataset.train_frames=[0,4,1]",
        "model.gaussian.capacity=65536",
        "rasterizer.max_pairs=1048576",
        "opt.skinning_pool_size=16384",
        "opt.iterations=600",
        "opt.densify_from_iter=100",
        "opt.densification_interval=200",
        "model.gaussian.delay=100",
        "test_interval=300",
        "max_val_frames=2",
        "seed=0",
    ])
    cfg['parallel']['subjects'] = [{'seed': 0}, {'seed': 1}]
    cfg['exp_dir'] = 'RUNS/r05_multisubject_chip'
    ms, state, logger = training(cfg, log_every=10)
    import numpy as np
    last = [r for r in logger.history if 'subject0/psnr' in r][-1]
    print(f"final: subject0 psnr={last['subject0/psnr']:.2f} "
          f"subject1 psnr={last['subject1/psnr']:.2f}", flush=True)


if __name__ == '__main__':
    main()
