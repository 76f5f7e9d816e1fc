"""Binary PLY I/O for the standard 3DGS attribute layout.

Parity: scene/gaussian_model.py:230-309 (save_ply/load_ply) — same attribute
names and ordering (x y z, nx ny nz, f_dc_*, f_rest_* transposed
channel-major, opacity, scale_*, rot_*) so checkpoints interop with the wider
3DGS tooling ecosystem. Self-contained little-endian binary PLY (the plyfile
package is not in this image)."""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _write_ply(path: str, names, data: np.ndarray):
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    n = data.shape[0]
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header", ""]
    with open(path, 'wb') as f:
        f.write("\n".join(header).encode('ascii'))
        f.write(np.ascontiguousarray(data, '<f4').tobytes())


def _read_ply(path: str):
    with open(path, 'rb') as f:
        raw = f.read()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    lines = raw[:end].decode('ascii').splitlines()
    n = 0
    names = []
    fmt = None
    for ln in lines:
        parts = ln.split()
        if not parts:
            continue
        if parts[0] == 'format':
            fmt = parts[1]
        elif parts[0] == 'element' and parts[1] == 'vertex':
            n = int(parts[2])
        elif parts[0] == 'property' and len(parts) == 3:
            names.append((parts[2], parts[1]))
    dtype_map = {'float': '<f4', 'float32': '<f4', 'double': '<f8',
                 'uchar': 'u1', 'uint8': 'u1', 'int': '<i4', 'uint': '<u4',
                 'short': '<i2', 'ushort': '<u2', 'char': 'i1'}
    dt = np.dtype([(nm, dtype_map[t]) for nm, t in names])
    if fmt == 'binary_little_endian':
        arr = np.frombuffer(raw[end:end + n * dt.itemsize], dtype=dt)
    elif fmt == 'ascii':
        body = raw[end:].decode('ascii').split()
        flat = np.array(body, dtype=np.float64).reshape(n, len(names))
        arr = np.zeros(n, dtype=dt)
        for i, (nm, _) in enumerate(names):
            arr[nm] = flat[:, i]
    else:
        raise ValueError(f"unsupported ply format {fmt}")
    return arr, [nm for nm, _ in names]


def save_arena_ply(path: str, params, aux):
    """Write alive arena slots in the 3DGS layout."""
    alive = np.asarray(aux.alive)
    xyz = np.asarray(params.xyz)[alive]
    n = xyz.shape[0]
    normals = np.zeros_like(xyz)
    # (N, R, C) -> channel-major flatten (C*R) like torch transpose(1,2)
    f_dc = np.asarray(params.features_dc)[alive].transpose(0, 2, 1) \
        .reshape(n, -1)
    f_rest = np.asarray(params.features_rest)[alive].transpose(0, 2, 1) \
        .reshape(n, -1)
    opacity = np.asarray(params.opacity)[alive]
    scale = np.asarray(params.scaling)[alive]
    rot = np.asarray(params.rotation)[alive]

    names = (['x', 'y', 'z', 'nx', 'ny', 'nz']
             + [f'f_dc_{i}' for i in range(f_dc.shape[1])]
             + [f'f_rest_{i}' for i in range(f_rest.shape[1])]
             + ['opacity']
             + [f'scale_{i}' for i in range(scale.shape[1])]
             + [f'rot_{i}' for i in range(rot.shape[1])])
    data = np.concatenate([xyz, normals, f_dc, f_rest, opacity, scale, rot],
                          axis=1)
    _write_ply(path, names, data)


def load_gaussian_ply(path: str, max_sh_degree: int = 3):
    """Read a 3DGS ply back into dense arrays (gaussian_model.py:268-309).
    Returns dict of numpy arrays (xyz, features_dc, features_rest, opacity,
    scaling, rotation)."""
    arr, names = _read_ply(path)
    n = len(arr)
    xyz = np.stack([arr['x'], arr['y'], arr['z']], axis=1).astype(np.float32)
    opacity = np.asarray(arr['opacity'], np.float32)[:, None]

    dc_names = sorted([nm for nm in names if nm.startswith('f_dc_')],
                      key=lambda s: int(s.split('_')[-1]))
    f_dc = np.stack([arr[nm] for nm in dc_names], axis=1).astype(np.float32)
    rest_names = sorted([nm for nm in names if nm.startswith('f_rest_')],
                        key=lambda s: int(s.split('_')[-1]))
    f_rest = np.stack([arr[nm] for nm in rest_names], axis=1) \
        .astype(np.float32) if rest_names else np.zeros((n, 0), np.float32)
    ch = f_dc.shape[1]
    rows = f_rest.shape[1] // max(ch, 1)
    # stored channel-major: (N, C, R) -> (N, R, C)
    features_dc = f_dc.reshape(n, ch, 1).transpose(0, 2, 1)
    features_rest = f_rest.reshape(n, ch, rows).transpose(0, 2, 1)

    scale_names = sorted([nm for nm in names if nm.startswith('scale_')],
                         key=lambda s: int(s.split('_')[-1]))
    scaling = np.stack([arr[nm] for nm in scale_names], axis=1) \
        .astype(np.float32)
    rot_names = sorted([nm for nm in names if nm.startswith('rot_')],
                       key=lambda s: int(s.split('_')[-1]))
    rotation = np.stack([arr[nm] for nm in rot_names], axis=1) \
        .astype(np.float32)
    return {'xyz': xyz, 'features_dc': features_dc,
            'features_rest': features_rest, 'opacity': opacity,
            'scaling': scaling, 'rotation': rotation}


def save_point_cloud_ply(path: str, xyz: np.ndarray, rgb: np.ndarray):
    """Simple colored point cloud (utils/dataset_utils.py:49-64 layout)."""
    names = ['x', 'y', 'z', 'nx', 'ny', 'nz', 'red', 'green', 'blue']
    normals = np.zeros_like(xyz)
    data = np.concatenate([xyz, normals, rgb], axis=1)
    _write_ply(path, names, data)
