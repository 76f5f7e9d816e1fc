"""Minimal Hydra-flavored YAML config system.

The reference composes Hydra groups (configs/config.yaml defaults list +
group files tagged `# @package _global_`, SURVEY.md §2.14). hydra/omegaconf
are not in this image, so this module reimplements the semantics we use:

  * a root yaml with a `defaults` list naming one file per group
    (dataset / pose_correction / texture / rigid / non_rigid / option);
  * group files deep-merged into the root (package _global_ behavior);
  * `${dotted.path}` interpolation;
  * CLI overrides: `group=name` swaps a group file, `a.b.c=value` sets a leaf
    (values parsed as yaml, so `opt.lambda_mask=[0.1,5000,0]` works);
  * attribute access plus `.get(key, default)` like OmegaConf in the
    reference model code.
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any, Optional

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")
_INTERP_SUB = re.compile(r"\$\{([^}]+)\}")
# YAML 1.1 reads "1e-4" as a string (needs "1.0e-4"); coerce those back
_NUMERIC = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")

GROUPS = ("dataset", "pose_correction", "texture", "rigid", "non_rigid",
          "option")
DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class Config:
    """Attribute/dict hybrid view over a nested dict."""

    def __init__(self, data: dict):
        object.__setattr__(self, "_data", data)

    # -- mapping protocol --
    def __getitem__(self, key):
        return _wrap(self._data[key])

    def __setitem__(self, key, value):
        self._data[key] = _unwrap(value)

    def __contains__(self, key):
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, _wrap(v)) for k, v in self._data.items()]

    def get(self, key, default=None):
        if key in self._data:
            return _wrap(self._data[key])
        return default

    # -- attribute protocol --
    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return _wrap(self._data[key])
        except KeyError as e:
            raise AttributeError(f"config key missing: {key}") from e

    def __setattr__(self, key, value):
        self._data[key] = _unwrap(value)

    def to_dict(self) -> dict:
        return copy.deepcopy(self._data)

    def __repr__(self):
        return f"Config({self._data!r})"

    def __len__(self):
        return len(self._data)

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(self._data, memo))


def _wrap(v):
    return Config(v) if isinstance(v, dict) else v


def _unwrap(v):
    return v._data if isinstance(v, Config) else v


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_path(root: dict, dotted: str):
    cur: Any = root
    for part in dotted.split('.'):
        cur = cur[part]
    return cur


def _interpolate(node: Any, root: dict, depth: int = 0):
    if depth > 16:
        raise ValueError("interpolation cycle")
    if isinstance(node, dict):
        return {k: _interpolate(v, root, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root, depth) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:  # whole-string ref keeps the referee's type
            return _interpolate(_resolve_path(root, m.group(1)), root,
                                depth + 1)
        if _NUMERIC.match(node):
            return float(node)
        return _INTERP_SUB.sub(
            lambda mm: str(_interpolate(_resolve_path(root, mm.group(1)),
                                        root, depth + 1)), node)
    return node


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(overrides: Optional[list] = None,
                config_dir: str = DEFAULT_CONFIG_DIR,
                config_name: str = "config") -> Config:
    """Compose the root config with group defaults and CLI-style overrides."""
    overrides = list(overrides or [])
    root = _load_yaml(os.path.join(config_dir, config_name + ".yaml"))
    defaults = root.pop("defaults", {})
    if isinstance(defaults, list):  # hydra-style list of single-key dicts
        d = {}
        for item in defaults:
            if isinstance(item, dict):
                d.update(item)
        defaults = d

    # group overrides picked off the CLI first
    kv_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        k, v = ov.split("=", 1)
        if k in GROUPS:
            defaults[k] = v
        else:
            kv_overrides.append((k, v))

    merged = root
    for group in GROUPS:
        name = defaults.get(group)
        if not name:
            continue
        names = name if isinstance(name, list) else [name]
        for n in names:
            gpath = os.path.join(config_dir, group, str(n) + ".yaml")
            gdata = _load_yaml(gpath)
            gdata.pop("defaults", None)
            merged = _deep_merge(merged, gdata)

    for k, v in kv_overrides:
        parsed = yaml.safe_load(v)
        node = merged
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = parsed

    merged = _interpolate(merged, merged)
    return Config(merged)


def load_config_from_dict(data: dict) -> Config:
    return Config(_interpolate(copy.deepcopy(data), data))
