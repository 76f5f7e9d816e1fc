"""SMPL asset tooling.

Parity:
  * extract_smpl_parameters.py of the reference — convert raw SMPL .pkl
    model files into the `body_models/misc/*.npz` bundles every loader
    consumes (same file/key layout).
  * visualize_smpl.py — matplotlib mesh/skeleton viewers and the 02v sanity
    check (here as `plot_smpl` / `vitruvian_check`).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from .body_model import SMPLAssets
from .vitruvian import get_02v_bone_transforms

GENDERS = ("male", "female", "neutral")


def extract_smpl_parameters(pkl_paths: Dict[str, str],
                            out_dir: str = "body_models/misc"):
    """pkl_paths: gender -> path of the raw SMPL model pickle. Writes the
    reference's npz bundles (faces.npz, J_regressors.npz, ...)."""
    os.makedirs(out_dir, exist_ok=True)
    bundles: Dict[str, dict] = {k: {} for k in
                                ('J_regressors', 'skinning_weights_all',
                                 'posedirs_all', 'shapedirs_all',
                                 'v_templates')}
    faces = None
    kintree = None
    for gender, path in pkl_paths.items():
        with open(path, 'rb') as f:
            data = pickle.load(f, encoding='latin1')

        def arr(x):
            return np.asarray(x.todense() if hasattr(x, 'todense') else x)

        bundles['J_regressors'][gender] = arr(data['J_regressor']).astype(np.float64)
        bundles['skinning_weights_all'][gender] = arr(data['weights'])
        bundles['posedirs_all'][gender] = arr(data['posedirs'])
        bundles['shapedirs_all'][gender] = arr(data['shapedirs'])[..., :10]
        bundles['v_templates'][gender] = arr(data['v_template'])
        faces = arr(data['f']).astype(np.int64)
        kintree = arr(data['kintree_table']).astype(np.int64)

    for name, d in bundles.items():
        np.savez(os.path.join(out_dir, f"{name}.npz"), **d)
    np.savez(os.path.join(out_dir, "faces.npz"), faces=faces)
    np.save(os.path.join(out_dir, "kintree_table.npy"), kintree)
    return out_dir


def vitruvian_verts(assets: SMPLAssets,
                    minimal_shape: Optional[np.ndarray] = None) -> np.ndarray:
    """Star-pose vertices from a rest shape (visualize_smpl.py 02v check)."""
    shape = minimal_shape if minimal_shape is not None else assets.v_template
    Jtr = assets.J_regressor @ shape
    tf = get_02v_bone_transforms(Jtr)
    T = (assets.skinning_weights @ tf.reshape(-1, 16)).reshape(-1, 4, 4)
    return ((T[:, :3, :3] @ shape[..., None])[..., 0] + T[:, :3, 3]) \
        .astype(np.float32)


def plot_smpl(verts: np.ndarray, faces: Optional[np.ndarray] = None,
              joints: Optional[np.ndarray] = None, out_path: Optional[str] = None):
    """Matplotlib scatter/wireframe viewer (headless-safe)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection='3d')
    ax.scatter(verts[:, 0], verts[:, 1], verts[:, 2], s=0.3, alpha=0.4)
    if joints is not None:
        ax.scatter(joints[:, 0], joints[:, 1], joints[:, 2], s=25, c='r')
    ax.set_box_aspect((np.ptp(verts[:, 0]), np.ptp(verts[:, 1]),
                       np.ptp(verts[:, 2])))
    if out_path:
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        return out_path
    return fig
