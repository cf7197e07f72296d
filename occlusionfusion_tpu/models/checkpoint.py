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


def normalize_indexed(tree):
    """Undo the flat-npz list->digit-key-dict round-trip damage.

    save_pytree flattens Python lists into dicts keyed '0', '1', ... and
    int-keyed dicts into string keys. Recursively: an all-digit-key dict
    with contiguous keys 0..n-1 becomes a list; otherwise its keys become
    ints (e.g. PWC decoders keyed by pyramid level 2..6). Fresh (unsaved)
    params pass through unchanged.
    """
    if isinstance(tree, dict):
        out = {k: normalize_indexed(v) for k, v in tree.items()}
        if out and all(
            isinstance(k, str) and k.lstrip("-").isdigit() for k in out
        ):
            ik = {int(k): v for k, v in out.items()}
            ks = sorted(ik)
            if ks == list(range(len(ks))):
                return [ik[i] for i in ks]
            return ik
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(normalize_indexed(v) for v in tree)
    return tree


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


# ---------------------------------------------------------------------------
# Lepard-style matcher checkpoints: params npz + config json side-car


def _namedtuple_to_dict(nt):
    d = {}
    for k, v in nt._asdict().items():
        if hasattr(v, "_asdict"):
            d[k] = _namedtuple_to_dict(v)
        elif isinstance(v, (tuple, list)):
            d[k] = list(v)
        else:
            d[k] = v
    return d


def save_lepard_checkpoint(npz_path: str, params, config) -> None:
    """Save matcher weights (npz) + the LepardConfig needed to rebuild
    the static pyramid/transformer shapes (json side-car)."""
    import json

    from occlusionfusion_tpu.utils.snapshot import save_pytree

    save_pytree(npz_path, params)
    with open(npz_path + ".json", "w") as fh:
        json.dump(_namedtuple_to_dict(config), fh, indent=1)


def load_lepard_checkpoint(npz_path: str):
    """Returns (params, LepardConfig) from save_lepard_checkpoint files."""
    import json

    from occlusionfusion_tpu.models import kpconv as K
    from occlusionfusion_tpu.models.lepard import LepardConfig
    from occlusionfusion_tpu.models.transformer3d import RepositionConfig
    from occlusionfusion_tpu.utils.snapshot import load_params as _load

    params = _load(npz_path)
    with open(npz_path + ".json") as fh:
        d = json.load(fh)
    kp = d["kpfcn"]
    pyr = kp["pyramid"]
    config = LepardConfig(
        kpfcn=K.KPFCNConfig(
            in_dim=kp["in_dim"],
            first_dim=kp["first_dim"],
            out_dim=kp["out_dim"],
            num_kernel_points=kp["num_kernel_points"],
            blocks_per_stage=kp["blocks_per_stage"],
            num_stages=kp.get("num_stages", 2),
            coarse_upsamples=kp.get("coarse_upsamples", 0),
            kp_layout=kp.get("kp_layout", "fibonacci"),
            pyramid=K.PyramidConfig(
                level_sizes=tuple(pyr["level_sizes"]),
                first_voxel=pyr["first_voxel"],
                radius_scale=pyr["radius_scale"],
                max_neighbors=tuple(pyr["max_neighbors"]),
            ),
        ),
        reposition=RepositionConfig(
            dim=d["reposition"]["dim"],
            heads=d["reposition"]["heads"],
            layer_types=tuple(d["reposition"]["layer_types"]),
            rope_voxel=d["reposition"]["rope_voxel"],
            temperature=d["reposition"]["temperature"],
        ),
        match_threshold=d["match_threshold"],
        blend_knn=d["blend_knn"],
        blend_radius=d["blend_radius"],
        # optional (older side-cars predate them): a checkpoint can ship
        # its recommended motion-coherence filter setting
        coherence_tau=d.get("coherence_tau", 0.0),
        coherence_knn=d.get("coherence_knn", 4),
        # fallback 0.0 = the validated absolute-tau variant; a side-car
        # that predates the coherence fields must NOT silently enable
        # the in-loop-failing MAD-scaled allowance (advisor r4)
        coherence_mad=d.get("coherence_mad", 0.0),
    )
    return params, config
