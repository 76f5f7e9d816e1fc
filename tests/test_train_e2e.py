"""End-to-end: synthetic scene -> full avatar stack -> train steps ->
loss decreases; densify/prune and opacity reset run without breaking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsavatar.config import load_config
from gsavatar.scene import Scene
from gsavatar.train import loss_weights, make_densify_step, make_train_step


def tiny_cfg(**kv):
    ov = [
        "dataset=synthetic",
        "dataset.img_hw=[64,64]",
        "dataset.n_verts=512",
        "dataset.n_points=768",
        "dataset.n_target_gaussians=512",
        "dataset.train_frames=[0,2,1]",
        "dataset.train_views=['0']",
        "model.gaussian.capacity=1024",
        "model.gaussian.delay=0",
        "rasterizer.max_pairs=65536",
        # 64x64 -> 16 tiles and the synthetic avatar clusters most points
        # into the few central tiles; capacity == arena size makes the dense
        # path structurally lossless so the overflow==0 asserts hold
        "rasterizer.per_tile_capacity=1024",
        "rasterizer.chunk=32",
        "opt.skinning_pool_size=2048",
        "opt.n_reg_pts=128",
    ] + [f"{k}={v}" for k, v in kv.items()]
    return load_config(overrides=ov)


@pytest.fixture(scope="module")
def scene_module():
    cfg = tiny_cfg()
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    return cfg, scene, state


@pytest.fixture()
def scene_state(scene_module):
    cfg, scene, state = scene_module
    # the train step donates its input state — hand each test a fresh copy
    return cfg, scene, jax.tree.map(jnp.copy, state)


class TestTrainStep:
    def test_loss_decreases(self, scene_state):
        cfg, scene, state = scene_state
        step = make_train_step(scene)
        camera = scene.train_dataset[0]
        first = None
        for it in range(1, 31):
            w = loss_weights(cfg, it)
            w['_in_densify_window'] = 0.0
            state, metrics = step(state, camera, jnp.int32(it), w,
                                  1e-3, active_sh_degree=0)
            loss = float(metrics['loss/total_loss'])
            assert np.isfinite(loss)
            if first is None:
                first = loss
        assert loss < first, (first, loss)
        assert int(metrics['overflow/pairs']) == 0
        assert int(metrics['overflow/tile']) == 0

    @pytest.mark.slow  # extra train-step compile variant (~1 min on 2 CPUs)
    def test_bucketed_step_matches_full(self, scene_state):
        """A step over the alive-prefix bucket must match the full-capacity
        step (dead slots contribute nothing)."""
        cfg, scene, state = scene_state
        step = make_train_step(scene)
        camera = scene.train_dataset[0]
        n_alive = int(jnp.sum(state.gauss_aux.alive))
        state_b = jax.tree.map(jnp.copy, state)
        w = loss_weights(cfg, 1)
        w['_in_densify_window'] = 1.0
        sf, mf = step(state, camera, jnp.int32(1), w, 1e-3,
                      active_sh_degree=0)
        sb, mb = step(state_b, camera, jnp.int32(1), w, 1e-3,
                      active_sh_degree=0, bucket=n_alive)
        np.testing.assert_allclose(float(mf['loss/total_loss']),
                                   float(mb['loss/total_loss']),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sf.gauss_params.xyz),
                                   np.asarray(sb.gauss_params.xyz),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sf.gauss_aux.xyz_gradient_accum),
            np.asarray(sb.gauss_aux.xyz_gradient_accum),
            rtol=1e-4, atol=1e-7)

    @pytest.mark.slow  # extra train-step compile variant (~1 min on 2 CPUs)
    def test_densify_and_reset(self, scene_state):
        cfg, scene, state = scene_state
        step = make_train_step(scene)
        densify_step, opacity_reset, refresh_knn = make_densify_step(scene)
        camera = scene.train_dataset[0]
        n0 = int(jnp.sum(state.gauss_aux.alive))
        for it in range(1, 6):
            w = loss_weights(cfg, it)
            w['_in_densify_window'] = 1.0
            state, metrics = step(state, camera, jnp.int32(it), w, 1e-3,
                                  active_sh_degree=0)
        # stats accumulated
        assert float(jnp.sum(state.gauss_aux.denom)) > 0
        state, info = densify_step(state, jax.random.PRNGKey(0), False)
        n1 = int(info['n_alive'])
        assert n1 > 0
        # clones/splits are dropped ONLY under capacity pressure (this tiny
        # 1024-slot arena fills); drops => the arena was full pre-prune
        capacity = int(state.gauss_aux.alive.shape[0])
        if int(info['n_dropped']) > 0:
            assert n1 + int(info['n_pruned']) == capacity
        assert n1 <= capacity
        # stats were reset
        assert float(jnp.sum(state.gauss_aux.denom)) == 0.0
        # compaction: alive slots form a contiguous prefix
        alive = np.asarray(state.gauss_aux.alive)
        assert alive[:n1].all() and not alive[n1:].any()
        state = refresh_knn(state, bucket=scene.bucket_for(n1))
        state = opacity_reset(state)
        op = jax.nn.sigmoid(state.gauss_params.opacity)[
            np.asarray(state.gauss_aux.alive)]
        assert float(op.max()) <= 0.0101
        # training continues after surgery
        w = loss_weights(cfg, 10)
        w['_in_densify_window'] = 1.0
        state, metrics = step(state, camera, jnp.int32(10), w, 1e-3,
                              active_sh_degree=0)
        assert np.isfinite(float(metrics['loss/total_loss']))


class TestTrainingLoop:
    @pytest.mark.slow
    def test_validation_resume_and_bucketing(self, tmp_path):
        """training() end-to-end: in-loop validation writes val metrics,
        checkpoints save, and a resumed run continues from the checkpoint."""
        import json
        from gsavatar.train import training

        cfg = tiny_cfg(**{
            "opt.iterations": 6,
            "test_interval": 3,
            "max_val_frames": 1,
            "model.gaussian.delay": 0,
            "checkpoint_iterations": "[4]",
            "exp_dir": str(tmp_path / "exp"),
        })
        scene, state, logger = training(cfg, log_every=2, progress=False)
        lines = [json.loads(l) for l in
                 open(tmp_path / "exp" / "metrics.jsonl")]
        val_rows = [l for l in lines if any(k.startswith('val/')
                                            for k in l)]
        assert val_rows, "no validation rows logged"
        row = val_rows[-1]
        assert 'val/test_psnr' in row and np.isfinite(row['val/test_psnr'])
        assert 'val/total_points' in row
        # random-VGG fallback keeps LPIPS live, keyed as lpips_rand so the
        # values are never mistaken for pretrained-LPIPS numbers
        assert 'val/test_lpips_rand' in row
        head = [l for l in lines if 'lpips_weights' in l]
        assert head and head[0]['lpips_weights'] == 'random'
        assert (tmp_path / "exp" / "ckpt4").exists()
        assert (tmp_path / "exp" / "ckpt6").exists()

        # resume: continue from ckpt4 to 8
        cfg2 = tiny_cfg(**{
            "opt.iterations": 8,
            "test_interval": 0,
            "model.gaussian.delay": 0,
            "start_checkpoint": str(tmp_path / "exp" / "ckpt4"),
            "exp_dir": str(tmp_path / "exp2"),
        })
        scene2, state2, _ = training(cfg2, log_every=2, progress=False)
        assert (tmp_path / "exp2" / "ckpt8").exists()


class TestNrCache:
    @pytest.mark.slow  # compiles a second render variant
    def test_cached_encoding_matches_uncached_render(self, scene_state):
        """The eval-time hash-grid encoding cache (canonical positions are
        frozen at eval) must reproduce the uncached render exactly."""
        from gsavatar.core import gaussians as G
        from gsavatar.models.converter import compute_nr_cache
        from gsavatar.renderer import render
        cfg, scene, state = scene_state
        gview = G.make_view(state.gauss_params, state.gauss_aux,
                            active_sh_degree=0,
                            max_sh_degree=scene.max_sh_degree,
                            use_sh=scene.use_sh)
        cache = compute_nr_cache(scene.converter, state.conv_params, gview)
        assert cache is not None  # default config uses the hashgrid variant
        cam = scene.train_dataset[0]
        it = jnp.int32(10 ** 9)
        a = render(scene.converter, state.conv_params, gview, cam, it,
                   scene.raster_config, scene.background)
        b = render(scene.converter, state.conv_params, gview, cam, it,
                   scene.raster_config, scene.background, nr_cache=cache)
        np.testing.assert_allclose(np.asarray(a.render),
                                   np.asarray(b.render), atol=1e-6)


class TestLenientRestore:
    def test_checkpoint_missing_aux_field_loads(self, scene_state, tmp_path):
        """Checkpoints written before GaussianAux gained nn_ix must still
        resume (ADVICE r2): the strict template restore fails, the lenient
        path zero-fills the missing leaf, and training() refreshes the
        neighbors after resume."""
        import dataclasses
        import orbax.checkpoint as ocp
        cfg, scene, state = scene_state
        aux_old = {f.name: getattr(state.gauss_aux, f.name)
                   for f in dataclasses.fields(state.gauss_aux)
                   if f.name != 'nn_ix'}
        path = str(tmp_path / "old_ckpt")
        ocp.PyTreeCheckpointer().save(path, {
            'gauss_params': state.gauss_params, 'gauss_aux': aux_old,
            'gauss_adam': state.gauss_adam,
            'conv_params': state.conv_params,
            'conv_opt': state.conv_opt, 'rng': state.rng, 'iteration': 7,
        }, force=True)
        restored, it = scene.load_checkpoint(path)
        assert it == 7
        assert restored.gauss_aux.nn_ix.shape == state.gauss_aux.nn_ix.shape
        assert int(jnp.sum(jnp.abs(restored.gauss_aux.nn_ix))) == 0
        np.testing.assert_allclose(
            np.asarray(restored.gauss_params.xyz),
            np.asarray(state.gauss_params.xyz))
        # optimizer state survives the lenient path too
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.conv_opt)[0]),
            np.asarray(jax.tree.leaves(state.conv_opt)[0]))


@pytest.mark.slow
class TestVariants:
    @pytest.mark.parametrize("ov", [
        {"texture": "sh", "non_rigid": "identity", "rigid": "identity",
         "pose_correction": "none"},
        {"non_rigid": "mlp"},
        {"rigid": "smpl_nn"},
    ])
    def test_variant_one_step(self, ov):
        cfg = tiny_cfg(**ov)
        scene = Scene(cfg, seed=0)
        state = scene.init_state()
        step = make_train_step(scene)
        camera = scene.train_dataset[0]
        w = loss_weights(cfg, 1)
        w['_in_densify_window'] = 0.0
        state, metrics = step(state, camera, jnp.int32(1), w, 1e-3,
                              active_sh_degree=0)
        assert np.isfinite(float(metrics['loss/total_loss']))
