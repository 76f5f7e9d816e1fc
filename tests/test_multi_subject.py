"""Multi-subject batched training (parallel/multi_subject.py).

Equivalence contract: a 2-subject batched run's per-subject losses match
two single-subject runs step for step — the multi-subject step IS the
single-subject step body (train.make_step_core) vmapped over a stacked
subject axis, with per-subject constants riding the 'subject' variable
collection (models/subject.py) and per-subject skinning pools riding as
stacked inputs. Runs on the 8-virtual-device CPU mesh (conftest.py);
subjects differ by dataset seed (different canonical geometry, AABB,
poses, GT target) — a real per-subject variation, not a label change."""
import numpy as np
import pytest

from gsavatar.config import load_config
from gsavatar.train import training


def base_overrides(iters=6):
    return [
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
        "test_interval=0",
        "seed=0",
    ]


def run_single(tmp_path, tag, dataset_seed, scene_seed):
    """One single-subject driver run, seeded like multi-subject lane i:
    Scene(seed=scene_seed) + frame sampler default_rng(scene_seed)."""
    cfg = load_config(overrides=base_overrides()
                      + [f"dataset.seed={dataset_seed}",
                         f"seed={scene_seed}"])
    cfg['exp_dir'] = str(tmp_path / tag)
    scene, state, logger = training(cfg, log_every=1, progress=False)
    losses = {r['step']: r['loss/total_loss'] for r in logger.history
              if 'loss/total_loss' in r}
    return losses, np.asarray(state.gauss_params.xyz), \
        int(np.asarray(state.gauss_aux.alive).sum())


def run_multi(tmp_path, tag, data=0):
    cfg = load_config(overrides=base_overrides() + [
        f"parallel.data={data}",
    ])
    cfg['parallel']['subjects'] = [{'seed': 0}, {'seed': 1}]
    cfg['exp_dir'] = str(tmp_path / tag)
    ms, state, logger = training(cfg, log_every=1, progress=False)
    per_subject = {0: {}, 1: {}}
    for r in logger.history:
        for i in (0, 1):
            k = f'subject{i}/loss/total_loss'
            if k in r:
                per_subject[i][r['step']] = r[k]
    return ms, state, per_subject


@pytest.mark.slow
def test_two_subjects_match_single_runs(tmp_path):
    """Batched per-subject losses == each subject's single run, across a
    densify + opacity reset, subject axis sharded over a data=2 mesh."""
    l0, x0, n0 = run_single(tmp_path, 'solo0', dataset_seed=0, scene_seed=0)
    l1, x1, n1 = run_single(tmp_path, 'solo1', dataset_seed=1, scene_seed=1)
    assert l0 != l1, "subjects must actually differ"
    ms, state, per = run_multi(tmp_path, 'multi', data=2)
    assert set(per[0]) == set(l0) and len(l0) >= 6
    for it in sorted(l0):
        np.testing.assert_allclose(per[0][it], l0[it], rtol=2e-3, atol=1e-5,
                                   err_msg=f"subject0 iter {it}")
        np.testing.assert_allclose(per[1][it], l1[it], rtol=2e-3, atol=1e-5,
                                   err_msg=f"subject1 iter {it}")
    # final per-subject geometry matches the solo runs too
    xs = np.asarray(state.gauss_params.xyz)
    ns = np.asarray(state.gauss_aux.alive).sum(axis=1)
    assert int(ns[0]) == n0 and int(ns[1]) == n1
    np.testing.assert_allclose(xs[0], x0, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(xs[1], x1, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_multi_subject_unmeshed_smoke(tmp_path):
    """parallel.data unset -> plain vmap on one device; checkpoints land
    per subject."""
    import os
    ms, state, per = run_multi(tmp_path, 'multi_nomesh', data=0)
    assert len(per[0]) >= 6 and len(per[1]) >= 6
    for i in (0, 1):
        d = str(tmp_path / 'multi_nomesh' / f'subject{i}' / 'ckpt6')
        assert os.path.isdir(d), d
