"""Checkpoint conversion: torch state dicts -> JAX param pytrees.

The reference ships one pretrained model, the motion-completion net
(``checkpoints/model_noise_all.tar``, loaded at ``demo.py:173-175``). Its
state-dict key structure maps 1:1 onto our params pytree (dots become
nesting). torch is only required at conversion time; converted weights are
cached as a flat .npz so the TPU runtime never imports torch.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def nest_flat_dict(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """{'a.b.weight': arr} -> {'a': {'b': {'weight': arr}}}.

    LSTM parameter names (weight_ih_l0 etc.) stay as leaf keys under their
    module, matching models/motion_complete.py's expectations.
    """
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def flatten_nested(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_nested(v, name))
        else:
            flat[name] = np.asarray(v)
    return flat


def convert_torch_checkpoint(tar_path: str, npz_path: str | None = None):
    """Load a torch checkpoint tar and return the nested numpy pytree.

    Optionally caches to ``npz_path``.
    """
    import torch  # local import: conversion-time only

    ck = torch.load(tar_path, map_location="cpu", weights_only=False)
    sd = ck["model_state_dict"] if "model_state_dict" in ck else ck
    flat = {k: v.detach().cpu().numpy().astype(np.float32) for k, v in sd.items()}
    if npz_path:
        np.savez(npz_path, **flat)
    return nest_flat_dict(flat)


def load_params(npz_path: str):
    """Load a cached converted checkpoint (.npz) as a nested pytree."""
    data = np.load(npz_path)
    return nest_flat_dict({k: data[k] for k in data.files})


def load_motion_complete_params(
    npz_path: str | None = None, tar_path: str | None = None
):
    """Resolve pretrained motion-completion weights.

    Preference order: explicit npz -> repo-bundled npz -> torch tar.
    """
    if npz_path is None:
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        candidate = os.path.join(here, "checkpoints", "motion_complete.npz")
        if os.path.exists(candidate):
            npz_path = candidate
    if npz_path and os.path.exists(npz_path):
        return load_params(npz_path)
    if tar_path and os.path.exists(tar_path):
        return convert_torch_checkpoint(tar_path)
    raise FileNotFoundError(
        "no motion-completion weights found; run scripts/convert_checkpoint.py"
    )
