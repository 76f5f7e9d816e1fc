"""Dataset factory (parity: dataset/__init__.py:5-12 of the reference, plus
a synthetic fixture registered for data-free tests and benchmarks)."""
from __future__ import annotations


def load_dataset(cfg, split='train'):
    name = cfg.name
    if name == 'zjumocap':
        from .zjumocap import ZJUMoCapDataset
        return ZJUMoCapDataset(cfg, split=split)
    if name == 'people_snapshot':
        from .people_snapshot import PeopleSnapshotDataset
        return PeopleSnapshotDataset(cfg, split=split)
    if name == 'mydataset':
        from .mydataset import MyDataset
        return MyDataset(cfg, split=split)
    if name == 'synthetic':
        from .synthetic import SyntheticDataset
        return SyntheticDataset(cfg, split=split)
    if name == 'dummy_dataset':
        from .dummy import DummyDataset
        return DummyDataset(cfg, split=split)
    raise ValueError(f"unknown dataset: {name}")
