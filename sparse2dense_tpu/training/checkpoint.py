"""Checkpoint save/restore (reference det3d/torchie/trainer/checkpoint.py:42-240).

Orbax-backed: each checkpoint directory holds the full train state
{params, batch_stats, opt_state, step} plus a JSON meta sidecar
{epoch, iter, config text, classes}; ``latest`` is a symlink like the
reference's latest.pth (trainer.py:424-430). Restore tolerates missing /
extra keys with logging, the analogue of load_state_dict(strict=False)
(checkpoint.py:146-199).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(out_dir: str, name: str, state_tree: Any,
                    meta: Optional[dict] = None, latest: bool = True):
    """Write ``<out_dir>/<name>`` (orbax dir) + meta.json; with ``latest``,
    also repoint the latest symlink (rolling intra-epoch 'preempt' saves keep
    the symlink on the last completed epoch)."""
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(out_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _tree_to_numpy(state_tree), force=True)
    if meta:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    if latest:
        link = os.path.join(out_dir, "latest")
        if os.path.islink(link) or os.path.exists(link):
            os.unlink(link)
        os.symlink(name, link)
    return path


def load_checkpoint(path: str, target: Any = None):
    """Restore a checkpoint dir. With ``target``, restores into its structure;
    returns (state_tree, meta dict or {})."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckptr.restore(path, item=_tree_to_numpy(target))
    else:
        restored = ckptr.restore(path)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def merge_params(target, restored, logger=None):
    """Copy matching-shaped leaves of ``restored`` onto ``target`` by path;
    log mismatches instead of failing (reference checkpoint.py:75-117)."""
    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(restored)[0]}
    out = {}
    missing, mismatched = [], []
    for k, v in flat_t:
        ks = jax.tree_util.keystr(k)
        if ks not in flat_r:
            missing.append(ks)
            out[ks] = v
        elif np.shape(flat_r[ks]) != np.shape(v):
            mismatched.append(ks)
            out[ks] = v
        else:
            out[ks] = flat_r[ks]
    if (missing or mismatched) and logger:
        logger.warning(f"checkpoint merge: {len(missing)} missing, "
                       f"{len(mismatched)} shape-mismatched keys")
    leaves = [out[jax.tree_util.keystr(k)] for k, _ in flat_t]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), leaves
    )
