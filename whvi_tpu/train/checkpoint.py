"""Checkpoint / resume for training state.

The reference only *saves* (``torch.save(state_dict)`` every 5000 epochs
of phase 2, src/networks.py:95-96) and has no resume path (SURVEY.md
section 5). Here the full training state — parameter pytree, optimizer
state, PRNG key, step/epoch counters — round-trips through a single
``.npz`` file plus a JSON sidecar of tree structure and metadata, with an
actual ``restore`` that resumes mid-run.

No pickle: arrays go through ``numpy.savez_compressed`` keyed by flattened
pytree paths; structure is recovered via ``jax.tree.unflatten`` against
the treedef of a template state, so restore is safe against untrusted
files to the same degree as numpy itself.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


def save_checkpoint(path: str, state: Any, metadata: dict | None = None) -> str:
    """Serialize a pytree ``state`` (+ JSON-able ``metadata``) to ``path``.

    ``path`` should end in ``.npz``; a ``path + '.meta.json'`` sidecar
    holds metadata. Writes are atomic (tmp file + rename) so an
    interrupted save can't corrupt the latest checkpoint.
    """
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)
    meta = dict(metadata or {})
    meta["n_leaves"] = len(leaves)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def restore_checkpoint(path: str, template: Any) -> tuple[Any, dict]:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` is a pytree with the same structure (e.g. a freshly
    initialized state); its treedef and leaf dtypes drive reconstruction.
    Returns ``(state, metadata)``.
    """
    leaves_t, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        n_saved = len(data.files)
        if n_saved != len(leaves_t):
            raise ValueError(
                f"checkpoint {path} holds {n_saved} leaves but the "
                f"current model/optimizer state has {len(leaves_t)} — "
                "the architecture or config changed since it was saved; "
                "use a fresh checkpoint dir (or resume=False)"
            )
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_t))]
    for i, (got, want) in enumerate(zip(leaves, leaves_t)):
        want_shape = tuple(np.shape(want))
        if tuple(got.shape) != want_shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {got.shape} != template "
                f"{want_shape} — architecture changed since save; use a "
                "fresh checkpoint dir (or resume=False)"
            )
    leaves = [
        jax.numpy.asarray(got, dtype=np.asarray(want).dtype)
        for got, want in zip(leaves, leaves_t)
    ]
    state = jax.tree.unflatten(treedef, leaves)
    meta_path = path + ".meta.json"
    metadata = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt") -> str | None:
    """Path of the newest ``{prefix}-{step}.npz`` in ``ckpt_dir``, if any."""
    if not os.path.isdir(ckpt_dir):
        return None
    best_step, best = -1, None
    for name in os.listdir(ckpt_dir):
        if not (name.startswith(prefix + "-") and name.endswith(".npz")):
            continue
        try:
            step = int(name[len(prefix) + 1 : -4])
        except ValueError:
            continue
        if step > best_step:
            best_step, best = step, os.path.join(ckpt_dir, name)
    return best
