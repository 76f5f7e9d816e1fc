"""gsavatar — TPU-native 3D Gaussian Splatting avatar framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hammershock/3dgs-avatar-release (3DGS-Avatar, CVPR 2024): animatable human
avatars as deformable 3D Gaussians, trained and rendered end-to-end on TPU.

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/        — compute kernels: differentiable tile rasterizer, KNN, SH,
                SSIM/LPIPS, hash-grid, mesh sampling (ref L0/L1)
  core/       — fixed-capacity Gaussian arena + densification + optimizers
                (ref L2: scene/gaussian_model.py)
  models/     — avatar model stack: deformers, pose correction, texture,
                converter (ref L3: models/)
  smpl/       — SMPL body model, LBS, Vitruvian canonicalization
  camera/     — camera records and projection math (ref scene/cameras.py)
  data/       — dataset loaders + synthetic fixtures (ref L5: dataset/)
  scene.py    — orchestration (ref L4: scene/__init__.py)
  renderer.py — render() entry (ref gaussian_renderer/__init__.py)
  train.py    — training loop (ref L6: train.py)
  evaluate.py — test/predict drivers (ref render.py)
  parallel/   — device-mesh sharding (new capability; ref is single-GPU)
  config/     — YAML group config system (ref configs/ Hydra semantics)
"""

__version__ = "0.1.0"
