"""Axis-aligned bounding box pytree (parity: utils/dataset_utils.py:66-91)."""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class AABB:
    coord_max: Any  # (3,)
    coord_min: Any  # (3,)

    @classmethod
    def from_points(cls, pts: np.ndarray, padding: float = 0.0) -> "AABB":
        coord_max = np.max(pts, axis=0)
        coord_min = np.min(pts, axis=0)
        pad = (coord_max - coord_min) * padding
        return cls(coord_max=(coord_max + pad).astype(np.float32),
                   coord_min=(coord_min - pad).astype(np.float32))

    def normalize(self, x, sym: bool = False):
        x = (x - self.coord_min) / (self.coord_max - self.coord_min)
        return 2 * x - 1.0 if sym else x

    def unnormalize(self, x, sym: bool = False):
        if sym:
            x = 0.5 * (x + 1)
        return x * (self.coord_max - self.coord_min) + self.coord_min

    def clip(self, x):
        return jnp.clip(x, self.coord_min, self.coord_max)

    def volume_scale(self):
        return self.coord_max - self.coord_min

    def scale(self) -> float:
        vs = np.asarray(self.volume_scale())
        return math.sqrt(float((vs ** 2).sum()) / 3.0)
