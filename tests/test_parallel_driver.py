"""Driver-level multi-device training: `cfg.parallel = {data, model}` routes
`training()` through the sharded step (parallel/shard.py) over a real
('data','model') mesh — the user-reachable path, not a hand-rolled step.

Equivalence contract (all on the 8-virtual-device CPU mesh, conftest.py):
  * plain single-chip driver  ==  parallel={data:1, model:8} driver
    (the model axis is a pure layout change; B=1 batch-mean == the
    single-camera loss; key derivation is unified in make_train_step), and
  * parallel={data:2, model:4}  ==  parallel={data:2, model:1}
    (same 2-frame batch semantics; again the model axis must be a numeric
    no-op) — including a mid-run densify + opacity reset.
"""
import json

import numpy as np
import pytest

from gsavatar.config import load_config
from gsavatar.train import schedule_flags, training


def driver_cfg(tmp_path, tag, data=0, model=0, iters=6):
    cfg = load_config(overrides=[
        "dataset=synthetic",
        "dataset.img_hw=[64,64]",
        "dataset.n_verts=512",
        "dataset.n_points=768",
        "dataset.n_target_gaussians=512",
        "dataset.train_frames=[0,2,1]",
        "dataset.train_views=['0']",
        "model.gaussian.capacity=1024",
        "model.gaussian.delay=1",
        "rasterizer.max_pairs=65536",
        "rasterizer.per_tile_capacity=1024",
        "rasterizer.chunk=32",
        "opt.skinning_pool_size=2048",
        "opt.n_reg_pts=128",
        # a densify (iter 4) and an opacity reset (iter 5) inside the run
        "opt.densify_from_iter=2",
        "opt.densification_interval=4",
        "opt.densify_until_iter=100",
        "opt.opacity_reset_interval=5",
        f"opt.iterations={iters}",
        f"parallel.data={data}",
        f"parallel.model={model}",
        "test_interval=0",
        "seed=0",
    ])
    cfg['exp_dir'] = str(tmp_path / tag)
    return cfg


def run(tmp_path, tag, **kw):
    cfg = driver_cfg(tmp_path, tag, **kw)
    scene, state, logger = training(cfg, log_every=1, progress=False)
    losses = {r['step']: r['loss/total_loss'] for r in logger.history
              if 'loss/total_loss' in r}
    n_alive = int(np.asarray(state.gauss_aux.alive).sum())
    return losses, np.asarray(state.gauss_params.xyz), n_alive, logger


@pytest.mark.slow
def test_model_axis_matches_single_chip(tmp_path):
    """plain driver == driver over a {data:1, model:8} mesh, per-step."""
    l0, x0, n0, _ = run(tmp_path, 'plain')
    l1, x1, n1, _ = run(tmp_path, 'mesh18', data=1, model=8)
    assert set(l0) == set(l1) and len(l0) >= 6
    for it in sorted(l0):
        np.testing.assert_allclose(l1[it], l0[it], rtol=2e-3, atol=1e-5,
                                   err_msg=f"iter {it}")
    assert n1 == n0
    np.testing.assert_allclose(x1, x0, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_data_batch_model_axis_no_op(tmp_path):
    """{data:2, model:4} == {data:2, model:1}: the model partitioning must
    not change the 2-frame-batch trajectory, across densify + reset."""
    l0, x0, n0, lg0 = run(tmp_path, 'mesh21', data=2, model=1)
    l1, x1, n1, lg1 = run(tmp_path, 'mesh24', data=2, model=4)
    assert set(l0) == set(l1) and len(l0) >= 6
    for it in sorted(l0):
        np.testing.assert_allclose(l1[it], l0[it], rtol=2e-3, atol=1e-5,
                                   err_msg=f"iter {it}")
    assert n0 == n1
    np.testing.assert_allclose(x1, x0, rtol=1e-3, atol=1e-5)
    # the run really exercised densify under the mesh
    densify_rows = [r for r in lg1.history if 'densify/n_alive' in r]
    assert densify_rows, "densify never fired inside the mesh driver run"
    # and the run's metrics file exists (driver-owned logging)
    with open(lg1.path) as f:
        rows = [json.loads(x) for x in f]
    assert any('loss/total_loss' in r for r in rows)


@pytest.mark.slow
def test_frames_per_step_oversubscribes_one_device(tmp_path):
    """{data:1, model:1, frames_per_step:2} == {data:2, model:1}: the
    B=2 batch semantics are independent of the device count — the path a
    single chip uses to run data>1 training for real."""
    l0, x0, n0, _ = run(tmp_path, 'mesh21fps', data=2, model=1)
    cfg = driver_cfg(tmp_path, 'fps2', data=1, model=1)
    cfg['parallel']['frames_per_step'] = 2
    scene, state, logger = training(cfg, log_every=1, progress=False)
    l1 = {r['step']: r['loss/total_loss'] for r in logger.history
          if 'loss/total_loss' in r}
    assert set(l0) == set(l1) and len(l0) >= 6
    for it in sorted(l0):
        np.testing.assert_allclose(l1[it], l0[it], rtol=2e-3, atol=1e-5,
                                   err_msg=f"iter {it}")
    np.testing.assert_allclose(np.asarray(state.gauss_params.xyz), x0,
                               rtol=1e-3, atol=1e-5)


def test_schedule_truth_table():
    """schedule_flags == a straight transcription of the reference's nested
    gates (train.py:217-227), across delay/from/interval/white_bg."""
    def reference(it, until, frm, interval, reset, delay, white):
        in_window = it < until and it > delay
        do_densify = do_reset = False
        if in_window:
            if it > frm and it % interval == 0:
                do_densify = True
            if it % reset == 0 or (white and it == frm):
                do_reset = True
        return in_window, do_densify, do_reset, it > reset

    for white in (False, True):
        for delay in (0, 1000):
            for it in list(range(0, 1202, 100)) + [499, 500, 501, 3000,
                                                   5999, 6000, 44999, 45000]:
                got = schedule_flags(
                    it, densify_until=45000, densify_from=500,
                    densify_interval=100, opacity_reset_interval=3000,
                    gauss_delay=delay, white_bg=white)
                want = reference(it, 45000, 500, 100, 3000, delay, white)
                assert got == want, (it, delay, white, got, want)
    # the documented consequence: with the default delay=1000 the white-bg
    # early reset at densify_from=500 can never fire
    assert not schedule_flags(500, densify_until=45000, densify_from=500,
                              densify_interval=100,
                              opacity_reset_interval=3000, gauss_delay=1000,
                              white_bg=True)[2]
