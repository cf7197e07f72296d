"""Checkpoint / resume utilities.

Replaces the reference's ad-hoc persistence layer
(``utils/snapshot_manager.py:10-45`` time-gated model snapshots, TSDF
volume pickles ``tsdf.py:682-702``, per-frame node npy artifacts
``warpfield.py:73,418``): a single flat-npz pytree snapshot format used
for model params, optimizer state, and the resident fusion state, plus a
time-gated saver. Orbax is available in the image for sharded multi-host
checkpoints; the npz path keeps single-host snapshots dependency-light.
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np

from occlusionfusion_tpu.models.checkpoint import flatten_nested, nest_flat_dict


def save_pytree(path: str, tree: Any):
    """Save a nested dict / NamedTuple pytree of arrays as flat npz."""
    import jax

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {}
    for key_path, leaf in leaves_with_paths:
        name = "/".join(_path_elem(p) for p in key_path)
        flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def _path_elem(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def load_flat(path: str) -> dict:
    """Load a flat npz snapshot as {slash/path: array}."""
    data = np.load(path)
    return {k: data[k] for k in data.files}


def load_params(path: str) -> dict:
    """Load a nested-dict params snapshot saved by save_pytree."""
    flat = {k.replace("/", "."): v for k, v in load_flat(path).items()}
    return nest_flat_dict(flat)


class SnapshotManager:
    """Time-gated snapshot saver (``utils/snapshot_manager.py:18-45``)."""

    def __init__(self, directory: str, min_interval_s: float = 300.0):
        self.directory = directory
        self.min_interval_s = min_interval_s
        self._last = 0.0
        os.makedirs(directory, exist_ok=True)

    def maybe_save(self, name: str, tree: Any, force: bool = False) -> bool:
        now = time.time()
        if not force and now - self._last < self.min_interval_s:
            return False
        save_pytree(os.path.join(self.directory, f"{name}.npz"), tree)
        self._last = now
        return True
