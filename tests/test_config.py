"""Config system: group composition, interpolation, overrides."""
from gsavatar.config import load_config


def test_default_composition():
    cfg = load_config()
    assert cfg.model.texture.name == 'mlp'
    assert cfg.model.deformer.rigid.name == 'skinning_field'
    assert cfg.model.deformer.non_rigid.name == 'hashgrid'
    assert cfg.model.pose_correction.name == 'direct'
    # option iter15k applied
    assert cfg.opt.iterations == 15000
    assert cfg.opt.densify_until_iter == 10000
    # interpolation across groups
    assert cfg.model.texture.feature_dim == cfg.model.gaussian.feature_dim == 32
    assert cfg.model.deformer.non_rigid.feature_dim == 16
    assert 'zju_377_mono' in cfg.name


def test_group_override():
    cfg = load_config(overrides=['texture=sh', 'rigid=identity',
                                 'non_rigid=identity', 'pose_correction=none'])
    assert cfg.model.texture.name == 'sh2rgb'
    assert cfg.model.gaussian.use_sh is True
    assert cfg.model.deformer.rigid.name == 'identity'
    assert cfg.model.pose_correction.name == 'none'


def test_leaf_override_yaml_typed():
    cfg = load_config(overrides=['opt.iterations=123',
                                 'opt.lambda_mask=[0.1,5000,0]',
                                 'dataset.white_background=true'])
    assert cfg.opt.iterations == 123
    assert list(cfg.opt.lambda_mask) == [0.1, 5000, 0]
    assert cfg.dataset.white_background is True


def test_get_with_default():
    cfg = load_config()
    assert cfg.opt.get('nonexistent', 7) == 7
    assert cfg.model.gaussian.get('delay', 0) == 1000


def test_schedule_C():
    from gsavatar.losses import C
    assert C(0, 5.0) == 5.0
    sched = [10, 1000, 0.1]
    assert C(0, sched) == 10
    assert C(999, sched) == 10
    assert C(1000, sched) == 0.1
    assert C(50000, sched) == 0.1
