"""Mesh surface sampling with barycentric attribute interpolation.

Replaces the reference's per-iteration CPU trimesh.sample + igl barycentric
round-trip for the skinning loss (models/deformer/rigid.py:173-187): we
presample a large pool of surface points and their ground-truth skinning
weights once at setup (host numpy), and the training step draws random
minibatches from the pool on device — statistically the same estimator with
zero host work in the hot loop."""
from __future__ import annotations

import numpy as np


def sample_surface(vertices: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 0):
    """Area-weighted uniform surface sampling.

    Returns (points (n,3), face_idx (n,), bary (n,3))."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    cross = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        probs = np.full(len(faces), 1.0 / len(faces))
    else:
        probs = area / total
    face_idx = rng.choice(len(faces), size=n, p=probs)
    # uniform barycentric via sqrt trick
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    b0 = 1.0 - r1
    b1 = r1 * (1.0 - r2)
    b2 = r1 * r2
    bary = np.stack([b0, b1, b2], axis=1)
    pts = (v0[face_idx] * b0[:, None] + v1[face_idx] * b1[:, None]
           + v2[face_idx] * b2[:, None])
    return pts.astype(np.float32), face_idx, bary.astype(np.float32)


def sample_skinning_pool(vertices: np.ndarray, faces: np.ndarray,
                         skinning_weights: np.ndarray, pool_size: int = 65536,
                         seed: int = 0):
    """Pool of (points (P,3), gt_weights (P,24)) for the skinning loss."""
    pts, face_idx, bary = sample_surface(vertices, faces, pool_size, seed)
    w = (skinning_weights[faces[face_idx]] * bary[..., None]).sum(axis=1)
    return pts, w.astype(np.float32)
