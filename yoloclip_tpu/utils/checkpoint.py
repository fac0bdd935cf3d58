"""Checkpoint save/load built on Orbax.

Covers the reference's torch.save/torch.load checkpoint surface
(`/root/reference/yolo_clip_detector/train/trainer.py:450-480`: dict of
model/optimizer/scheduler state + epoch + best metric, plus crash
checkpoints) with Orbax StandardCheckpointer -- the TPU-native store
(async-capable, sharding-aware, resumable).

Checkpoint layout (a directory):
    <path>/state          # pytree: variables, opt_state, step, metadata
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_shared_ckptr = None


def _checkpointer():
    """One process-wide StandardCheckpointer so async saves have a single
    owner to serialize/wait on (orbax allows one in-flight save per
    checkpointer)."""
    global _shared_ckptr
    if _shared_ckptr is None:
        import orbax.checkpoint as ocp
        _shared_ckptr = ocp.StandardCheckpointer()
    return _shared_ckptr


def finish_async_saves() -> None:
    """Block until every in-flight async checkpoint save is durable."""
    if _shared_ckptr is not None:
        _shared_ckptr.wait_until_finished()


def save_checkpoint(path: str, variables, opt_state=None, step: int = 0,
                    metadata: Optional[Dict[str, Any]] = None,
                    wait: bool = True) -> None:
    """wait=False returns as soon as the device->host fetch is done and
    finalizes the checkpoint on orbax's background thread -- training
    overlaps the (tens of seconds) serialization instead of stalling
    (call `finish_async_saves()` before exiting). The write is still
    crash-atomic: orbax renames the tmp dir only on successful finalize."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    state = {'variables': _to_host(variables), 'step': step}
    if opt_state is not None:
        # optax states are pytrees of namedtuples; store the leaves flat
        # and rebuild against the live treedef on restore (the structure
        # is determined by the optimizer config, not the checkpoint).
        leaves = jax.tree_util.tree_leaves(opt_state)
        state['opt_leaves'] = {f'{i:04d}': np.asarray(x)
                               for i, x in enumerate(leaves)}
    ckptr = _checkpointer()
    ckptr.wait_until_finished()   # serialize with any prior async save
    ckptr.save(os.path.join(path, 'state'), state, force=True)
    if wait:
        ckptr.wait_until_finished()
    if metadata:
        with open(os.path.join(path, 'metadata.json'), 'w') as f:
            json.dump(metadata, f)


def restore_opt_state(ckpt: Dict[str, Any], template):
    """Rebuild an optimizer state pytree from a loaded checkpoint.

    template: a live opt_state with the target structure (from the
    current optimizer). Returns template unchanged if the checkpoint
    carries no optimizer state (e.g. inference-only exports).
    """
    leaves_dict = ckpt.get('opt_leaves')
    if not leaves_dict:
        return template
    leaves = [leaves_dict[k] for k in sorted(leaves_dict)]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f'optimizer state mismatch: checkpoint has {len(leaves)} '
            f'leaves, current optimizer expects {treedef.num_leaves}')
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()   # a just-issued async save must land first
    state = ckptr.restore(os.path.join(path, 'state'))
    meta_path = os.path.join(path, 'metadata.json')
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            state['metadata'] = json.load(f)
    return state
