"""Custom-video dataset loader.

Parity: dataset/mydataset.py of the reference — a ZJU-format loader for
datasets produced by the build_dataset/ pipeline; identical to the ZJU-MoCap
loader except for the raw capture size (1080x1920, mydataset.py:73)."""
from __future__ import annotations

from .zjumocap import ZJUMoCapDataset


class MyDataset(ZJUMoCapDataset):
    RAW_HW = (1080, 1920)
